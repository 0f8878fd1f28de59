"""Gopher-style repetition metrics vs an exact pure-Python oracle.

The oracle mirrors the engine semantics bit-for-bit (module doc of
textops/repetition.py): space-only trim (Spark/DuckDB `trim`), ASCII
``\\s`` word splitting, count-based character coverage, int/int IEEE
division, ties to the lexicographically smallest gram.
"""

import random
import re
from collections import Counter

import pytest

from sedona_db_spark.textops.repetition import (
    TOP_NS, DUP_NS, repetition_scores, with_repetition,
)

_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # ASCII \s, like Java/RE2


def _words(t):
    return _WS.split(t.strip(" "))


def oracle(text, top_ns=TOP_NS, dup_ns=DUP_NS):
    t = "" if text is None else text
    out = {}
    for name, units in (
        ("line", [u for u in t.split("\n") if u.strip(" ")]),
        ("para", [u for u in re.split(r"\n{2,}", t) if u.strip(" ")]),
    ):
        c = Counter(units)
        tot = sum(c.values())
        dup = sum(v - 1 for v in c.values())
        chars = sum(v * len(u) for u, v in c.items())
        dupch = sum((v - 1) * len(u) for u, v in c.items())
        out[f"dup_{name}_frac"] = dup / tot if tot > 0 else 0.0
        out[f"dup_{name}_char_frac"] = dupch / chars if chars > 0 else 0.0
    ws = _words(t)
    n_chars = len(t)
    for n in sorted(set(top_ns)):
        grams = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
        if grams:
            c = Counter(grams)
            cnt, gram = min(((-v, g) for g, v in c.items()))
            covered = (-cnt) * len(gram)
            val = min(covered / n_chars, 1.0) if n_chars > 0 else 0.0
        else:
            val = 0.0
        out[f"top_{n}gram_char_frac"] = val
    for n in sorted(set(dup_ns)):
        grams = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
        c = Counter(grams)
        covered = sum(v * len(g) for g, v in c.items() if v >= 2)
        out[f"dup_{n}gram_char_frac"] = (
            min(covered / n_chars, 1.0) if n_chars > 0 else 0.0)
    return out


HANDMADE = [
    (0, "the cat sat on the mat\nthe cat sat on the mat\nunique line"),
    (1, "para one here\n\npara two here\n\npara one here\n\n\npara one here"),
    (2, ""),                      # empty text
    (3, "   \n  \n   "),          # whitespace-only lines dropped
    (4, "word"),                  # fewer than 2 words -> all gram fams 0
    (5, "a a a a a a a a a a a a"),          # overlapping gram floods, cap 1.0
    (6, "z y z y z y x\nb a b a b a"),       # tie-break: smallest gram wins
    (7, "one two three four five six seven eight nine ten"),  # no dups
    (8, "\tindented\tline\nplain line\n\tindented\tline"),    # tabs kept by trim
    (9, "spam spam spam spam eggs spam spam spam spam eggs " * 3),
    (10, None),                   # null text
    (11, "edge\n\n\n\nedge\n\n\n\nedge"),    # 3+ newline paragraph breaks
    (12, " leading spaces\ntrailing spaces \n leading spaces"),
]


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in HANDMADE], "doc_id long, text string")
    return {r["doc_id"]: r.asDict()
            for r in repetition_scores(df).collect()}


def test_handmade_docs_exact(scored):
    for i, t in HANDMADE:
        want = oracle(t)
        got = scored[i]
        for kcol, v in want.items():
            assert got[kcol] == v, (i, kcol, got[kcol], v)


def test_expected_values_spotcheck(scored):
    # doc 0: 3 lines, one value twice -> dup_line_frac = 1/3
    assert scored[0]["dup_line_frac"] == pytest.approx(1 / 3)
    # doc 1: 4 paras, 'para one here' x3 -> 2 dup instances / 4
    assert scored[1]["dup_para_frac"] == pytest.approx(0.5)
    # doc 2/10 (empty / null text): all metrics zero.  (doc 3 is NOT all
    # zero: space-only trim leaves '\n  \n', whose empty-string words
    # still form grams — engine and oracle agree on that edge.)
    for i in (2, 10):
        assert all(v == 0.0 for kcol, v in scored[i].items()
                   if kcol != "doc_id")
    assert scored[3]["dup_line_frac"] == 0.0
    assert scored[3]["top_2gram_char_frac"] > 0.0
    # doc 5: "a a" 2-gram count 11, len 3 -> 33/23 capped at 1.0
    assert scored[5]["top_2gram_char_frac"] == 1.0
    # doc 7: no repeated 5-grams
    assert scored[7]["dup_5gram_char_frac"] == 0.0


def test_tie_breaks_to_smallest_gram(scored):
    # doc 6 2-grams: 'z y' x3, 'y z' x2, ... 'b a' x3, 'a b' x2 ->
    # max count 3 shared by 'z y' and 'b a'; smallest is 'b a' (len 3)
    assert scored[6]["top_2gram_char_frac"] == min(3 * 3 / len(HANDMADE[6][1]), 1.0)


def test_random_docs_match_oracle(spark):
    rng = random.Random(808)
    vocab = ["alpha", "beta", "gamma", "delta", "x"]
    docs = []
    for i in range(60):
        lines = []
        for _ in range(rng.randrange(0, 8)):
            line = " ".join(rng.choice(vocab)
                            for _ in range(rng.randrange(0, 12)))
            lines.append(line)
            if rng.random() < 0.4 and lines:
                lines.append(rng.choice(lines))   # duplicate a line
        sep = lambda: "\n" * rng.randrange(1, 4)  # noqa: E731
        docs.append((i, sep().join(lines) if lines else ""))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_scores(df).collect()}
    for i, t in docs:
        want = oracle(t)
        for kcol, v in want.items():
            assert got[i][kcol] == v, (i, kcol, got[i][kcol], v, t)


def test_random_whitespace_zoo_matches_oracle(spark):
    """ASCII whitespace zoo (tabs, CR, FF, VT, runs of mixed separators)
    — the \\s mirroring and space-only trim edges."""
    rng = random.Random(4242)
    seps = [" ", "  ", "\t", "\r", "\x0b", "\x0c", " \t ", "\r\n", "\n"]
    vocab = ["aa", "bb", "cc", ""]
    docs = []
    for i in range(50):
        parts = []
        for _ in range(rng.randrange(0, 25)):
            parts.append(rng.choice(vocab))
            parts.append(rng.choice(seps))
        docs.append((i, "".join(parts)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_scores(df).collect()}
    for i, t in docs:
        want = oracle(t)
        for kcol, v in want.items():
            assert got[i][kcol] == v, (i, kcol, got[i][kcol], v, repr(t))


def test_with_repetition_joins_back(spark):
    df = spark.createDataFrame(
        [(1, "a a\na a", "keep")], "doc_id long, text string, extra string")
    r = with_repetition(df).collect()[0]
    assert r["extra"] == "keep" and r["dup_line_frac"] == 0.5


def test_plan_is_pure_jvm(spark):
    """No Python UDFs / Arrow eval anywhere in the repetition plan."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = repetition_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
