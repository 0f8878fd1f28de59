"""PII scrubbing and benchmark-decontamination tests."""

import pytest

from pyspark.sql import functions as F

from sedona_db_spark.textops.scrub import (
    redact_pii, pii_counts, scrub_documents,
)
from sedona_db_spark.textops.decontam import (
    contamination_report, decontaminate,
)


REDACT_CASES = [
    ("mail me at jane.doe+spam@example.co.uk today",
     "mail me at <PII:EMAIL> today"),
    ("server at 192.168.0.1 and 8.8.8.8.", "server at <PII:IPV4> and <PII:IPV4>."),
    ("not an ip: 999.1.1.1 stays", "not an ip: 999.1.1.1 stays"),
    ("ssn 123-45-6789 leaked", "ssn <PII:SSN> leaked"),
    ("card 4111 1111 1111 1111 or 4111111111111111",
     "card <PII:CARD> or <PII:CARD>"),
    ("call (555) 867-5309 or 555-867-5309 now",
     "call <PII:PHONE> or <PII:PHONE> now"),
    ("version 1.2.3.4.5 is not an ip-only match: 1.2.3.4.5",
     "version 1.2.3.4.5 is not an ip-only match: 1.2.3.4.5"),
    ("year 2024-10-15 is not an ssn", "year 2024-10-15 is not an ssn"),
    ("", ""),
]


def test_redaction_cases(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(REDACT_CASES)],
        "id long, text string")
    got = [r["red"] for r in df.orderBy("id")
           .select(redact_pii(F.col("text")).alias("red")).collect()]
    for (t, want), g in zip(REDACT_CASES, got):
        assert g == want, (t, g)


def test_pii_counts_and_scrub(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co and c@d.org, ip 10.0.0.1, call 555-867-5309")],
        "doc_id long, text string")
    out = scrub_documents(df).collect()[0]
    assert out["pii_counts"]["EMAIL"] == 2
    assert out["pii_counts"]["IPV4"] == 1
    assert out["pii_counts"]["PHONE"] == 1
    assert out["pii_counts"]["SSN"] == 0
    assert out["pii_total"] == 4
    assert "<PII:EMAIL>" in out["text"] and "a@b.co" not in out["text"]


def test_scrub_plan_is_pure_jvm(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (scrub_documents(df)._jdf.queryExecution().executedPlan()
            .toString())
    assert "Python" not in plan and "Arrow" not in plan


BENCH_SENT = "the quick brown fox jumps over the lazy sleeping dog tonight"


@pytest.fixture(scope="module")
def contam(spark):
    import random
    rng = random.Random(31)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    docs = []
    for i in range(40):
        body = " ".join(rng.choice(vocab) for _ in range(60))
        docs.append((i, body))
    # plant the benchmark sentence verbatim into docs 3 and 7
    docs[3] = (3, docs[3][1] + " " + BENCH_SENT)
    docs[7] = (7, BENCH_SENT + " " + docs[7][1])
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, BENCH_SENT), (101, "completely unrelated eval question")],
        "doc_id long, text string")
    return corpus, bench


def test_contamination_report(contam):
    corpus, bench = contam
    rep = contamination_report(corpus, bench, n=8).collect()
    by_doc = {}
    for r in rep:
        by_doc.setdefault(r["doc_id"], set()).add(r["bench_id"])
    assert set(by_doc) == {3, 7}
    assert by_doc[3] == {100} and by_doc[7] == {100}
    # 11-word planted sentence -> 4 distinct 8-grams shared
    n_shared = {r["doc_id"]: r["n_shared"] for r in rep}
    assert n_shared[3] == 4 and n_shared[7] == 4


def test_decontaminate_removes_flagged(contam):
    corpus, bench = contam
    clean = decontaminate(corpus, bench, n=8)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert kept == set(range(40)) - {3, 7}
    # stricter min_hits spares single-hit docs
    assert decontaminate(corpus, bench, n=8, min_hits=5).count() == 40


def test_boilerplate_cap(spark):
    """A gram present in MOST corpus docs is dropped before counting."""
    boiler = "terms of service apply to all visitors of this site"
    rows = [(i, boiler + f" filler{i} " + boiler) for i in range(30)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(0, boiler)], "doc_id long, text string")
    assert contamination_report(corpus, bench, n=8, max_df=10).count() == 0
    assert contamination_report(corpus, bench, n=8,
                                max_df=None).count() == 30


def test_n_guard(contam):
    corpus, bench = contam
    with pytest.raises(ValueError):
        contamination_report(corpus, bench, n=1)
