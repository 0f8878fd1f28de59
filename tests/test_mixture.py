"""Corpus-mixture sampling + sequence packing (textops/mixture.py)."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from sedona_db_spark.textops.mixture import (pack_sequences,
                                             sample_mixture)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "fr", "ru"][i % 4], 100 + (i * 37) % 4500)
            for i in range(400)]
    return spark.createDataFrame(rows, "doc_id: long, lang: string, "
                                       "n_tokens: long")


def test_rates_le_one_are_bernoulli_keep(docs):
    out = sample_mixture(docs, {"en": 0.5, "de": 1.0}, id_col="doc_id",
                         seed=3, default_rate=0.0).collect()
    langs = {r.lang for r in out}
    assert langs == {"en", "de"}              # fr/ru at default 0
    by_lang = pd.DataFrame([r.asDict() for r in out]).groupby("lang").size()
    assert by_lang["de"] == 100               # rate 1.0 keeps everything
    assert 30 <= by_lang["en"] <= 70          # ~50 of 100
    assert all(r.copy_n == 0 for r in out)


def test_upsampling_emits_copies(docs):
    out = sample_mixture(docs, {"fr": 2.5}, id_col="doc_id", seed=3
                         ).where(F.col("lang") == "fr").collect()
    per_doc = pd.DataFrame([r.asDict() for r in out]).groupby("doc_id")
    sizes = per_doc.size()
    assert set(sizes.unique()) <= {2, 3}      # floor 2 + Bernoulli(0.5)
    assert 2.2 <= sizes.mean() <= 2.8
    # copy_n indexes the copies 0..n-1
    for _, g in per_doc:
        assert sorted(g.copy_n) == list(range(len(g)))


def test_sampling_is_deterministic_and_seed_sensitive(docs):
    a = sample_mixture(docs, {"en": 0.5}, seed=3).collect()
    b = sample_mixture(docs, {"en": 0.5}, seed=3).collect()
    c = sample_mixture(docs, {"en": 0.5}, seed=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_sample_mixture_is_pure_jvm(docs):
    plan = sample_mixture(docs, {"en": 0.5}, seed=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_pack_sequences_invariants(docs):
    cap = 4096
    out = pd.DataFrame([r.asDict() for r in pack_sequences(
        docs, cap, len_col="n_tokens", n_buckets=8).collect()])
    assert len(out) == 400                    # packing loses no rows
    # per-bin totals respect the budget unless the bin is a single
    # over-long document
    fills = out.groupby("bin_id").agg(total=("n_tokens", "sum"),
                                      n=("n_tokens", "size"))
    over = fills[fills.total > cap]
    assert (over.n == 1).all()
    # bin_fill is the running fill and ends at the bin total
    last = out.sort_values(["bin_id", "doc_id"]).groupby("bin_id").last()
    assert (last.bin_fill == fills.total).all()
    # deterministic across runs
    again = pd.DataFrame([r.asDict() for r in pack_sequences(
        docs, cap, len_col="n_tokens", n_buckets=8).collect()])
    assert out.sort_values("doc_id").reset_index(drop=True).equals(
        again.sort_values("doc_id").reset_index(drop=True))


def test_pack_groups_are_independent_of_partitioning(docs):
    a = pd.DataFrame([r.asDict() for r in pack_sequences(
        docs.repartition(13), 4096, len_col="n_tokens",
        n_buckets=8).collect()]).sort_values("doc_id").reset_index(drop=True)
    b = pd.DataFrame([r.asDict() for r in pack_sequences(
        docs.coalesce(1), 4096, len_col="n_tokens",
        n_buckets=8).collect()]).sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_mixture_u_no_overflow_at_huge_ids(spark):
    """Review regression: id·A overflowed int64 above id ≈ 3.5e9 (ANSI
    mode would raise; non-ANSI silently wrapped).  The mod-P pre-reduction
    must be overflow-free AND congruent with the small-id arithmetic."""
    from sedona_db_spark.textops.mixture import (_MIX_A, _MIX_B, _MIX_P,
                                                 mixture_u)
    ids = [0, 1, 999_999, 3_470_000_000, 10**12, 2**62]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id: long")
    got = {r.doc_id: r.u for r in df.select(
        "doc_id", mixture_u(F.col("doc_id"), 7).alias("u")).collect()}
    for i in ids:
        want = ((i * _MIX_A + 7 * _MIX_B) % _MIX_P) / _MIX_P  # python bigint
        assert got[i] == pytest.approx(want, abs=0), i


def test_sample_mixture_under_ansi_mode(spark):
    # huge ids through the full operator with ANSI on (overflow would
    # raise ArithmeticException before the fix)
    old = spark.conf.get("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame(
            [(10**12 + i, "en") for i in range(50)], "doc_id: long, "
                                                     "lang: string")
        out = sample_mixture(df, {"en": 0.5}, seed=3).collect()
        assert 10 <= len(out) <= 40
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
