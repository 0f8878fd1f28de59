"""Training-data text ops: exact brute-force oracles for the hash-based
operators that have no SQL oracle in the driver contract."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from sedona_db_spark.textops import analysis as TA
from sedona_db_spark.textops import dedup as TD


@pytest.fixture(scope="module")
def docs(spark, sf_test):
    return spark.read.parquet(f"{sf_test}/documents.parquet").cache()


def _texts(docs):
    return {r["doc_id"]: r["text"] for r in docs.collect()}


def brute_jaccard(t1: str, t2: str, n=3) -> float:
    def sh(t):
        toks = t.split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    a, b = sh(t1), sh(t2)
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def test_ngram_jaccard_exact(docs):
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in TD.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    texts = _texts(docs)
    exp = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            j = brute_jaccard(texts[a], texts[b])
            if j >= 0.3:
                exp[(a, b)] = j
    assert set(got) == set(exp)
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-12


def test_minhash_lsh_candidates_superset_of_high_jaccard(docs):
    """LSH candidates must include every pair a full-signature match implies;
    sanity: identical texts always collide."""
    pairs = {(r["id_a"], r["id_b"])
             for r in TD.minhash_lsh_candidates(docs, num_perm=8, bands=4).collect()}
    texts = _texts(docs)
    dup_groups = {}
    for i, t in texts.items():
        dup_groups.setdefault(t, []).append(i)
    for ids in dup_groups.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert (ids[i], ids[j]) in pairs


def test_exact_dedup_counts(docs):
    rows = TD.exact_dedup(docs).collect()
    texts = _texts(docs)
    assert sum(r["dup_cnt"] for r in rows) == len(texts)
    assert len(rows) == len(set(texts.values()))


def test_simhash_identical_and_disjoint(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alpha beta gamma delta", "alpha beta gamma delta",
                 "zzz qqq www eee"]})
    df = spark.createDataFrame(pdf)
    sigs = {r["doc_id"]: r["sim"] for r in
            TD.simhash_signatures(df).collect()}
    assert sigs[0] == sigs[1]
    assert 0 <= sigs[0] < (1 << TD.SIMHASH_BITS)
    ham02 = bin((sigs[0] ^ sigs[2]) & ((1 << 64) - 1)).count("1")
    assert ham02 > 10


def test_simhash_neardup_pairs_finds_identical(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alpha beta gamma delta", "alpha beta gamma delta",
                 "zzz qqq www eee"]})
    df = spark.createDataFrame(pdf)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in TD.simhash_neardup_pairs(df, max_hamming=3).collect()}
    assert pairs == {(0, 1): 0}


def test_fingerprint_deterministic_and_sensitive(spark):
    pdf = pd.DataFrame({"doc_id": [0, 1, 2],
                        "text": ["abc def", "abc def", "abc deg"]})
    df = spark.createDataFrame(pdf)
    fps = [r["f"] for r in df.select(TA.doc_fingerprint(F.col("text")).alias("f"))
           .collect()]
    assert fps[0] == fps[1] != fps[2]


def test_token_count_edges(spark):
    pdf = pd.DataFrame({"text": ["", "   ", "one", " a  b\tc\nd "]})
    df = spark.createDataFrame(pdf)
    got = [r["n"] for r in df.select(TA.token_count(F.col("text")).alias("n")).collect()]
    assert got == [0, 0, 1, 4]


def test_lang_id_markers(spark):
    pdf = pd.DataFrame({"text": [
        "the cat and the dog of the house",
        "der Hund und die Katze und der Vogel",
        "le chat et le chien et les oiseaux",
        "xyzzy plugh",
    ]})
    df = spark.createDataFrame(pdf)
    got = [r["l"] for r in df.select(TA.lang_id(F.col("text")).alias("l")).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_connected_components_and_keepers(spark):
    import pandas as pd
    from sedona_db_spark.textops.dedup import connected_components, dedup_keepers
    pairs = spark.createDataFrame(pd.DataFrame({
        "id_a": [0, 1, 2, 10, 5, 6],
        "id_b": [1, 2, 3, 11, 6, 7]}))
    comp = {r["id"]: r["component"]
            for r in connected_components(pairs).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 5: 5, 6: 5, 7: 5}
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": list(range(12)), "text": ["x"] * 12}))
    kept = sorted(r["doc_id"] for r in dedup_keepers(docs, pairs).collect())
    assert kept == [0, 4, 5, 8, 9, 10]


def test_minhash_to_clusters_end_to_end(docs, spark):
    """MinHash LSH pairs → connected components → keepers: identical texts
    collapse to one representative."""
    from sedona_db_spark.textops.dedup import (
        minhash_lsh_candidates, dedup_keepers)
    from sedona_db_spark.textops.dedup import connected_components
    pairs = minhash_lsh_candidates(docs, num_perm=8, bands=4)
    kept = dedup_keepers(docs, pairs)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    comp = {r["id"]: r["component"]
            for r in connected_components(pairs).collect()}
    # exactly one keeper per cluster: its min id; all other members dropped
    clusters = {}
    for i, c in comp.items():
        clusters.setdefault(c, []).append(i)
    for c, members in clusters.items():
        assert set(members) & kept_ids == {min(members)}
    # unpaired docs always survive
    texts = _texts(docs)
    unpaired = set(texts) - set(comp)
    assert unpaired <= kept_ids
    # identical texts are always in one cluster together (never both kept)
    groups = {}
    for i, t in texts.items():
        groups.setdefault(t, []).append(i)
    for ids in groups.values():
        if len(ids) > 1:
            assert len(set(ids) & kept_ids) <= 1


def test_simhash_signature_matches_reference_kernel(spark):
    """The JVM expression pipeline must equal an independent Python
    recomputation of the same definition (md5-prefix 60-bit token hash,
    sign-of-weighted-sums)."""
    import hashlib
    texts = ["the quick brown fox", "jumps over the lazy dog dog dog",
             "", "   ", "one", "alpha beta\talpha  beta"]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = {r["doc_id"]: r["sim"] for r in
           TD.simhash_signatures(spark.createDataFrame(pdf)).collect()}

    def ref(text):
        toks = text.split()
        if not toks:
            return 0
        w = [0] * TD.SIMHASH_BITS
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for b in range(TD.SIMHASH_BITS):
                w[b] += 1 if (h >> b) & 1 else -1
        return sum(1 << b for b in range(TD.SIMHASH_BITS) if w[b] > 0)

    for i, t in enumerate(texts):
        assert got[i] == ref(t), (i, t)


def test_ngram_df_cap_bounds_candidates(spark):
    """A boilerplate shingle shared by every doc must not create pairs when
    the df cap excludes it; capped Jaccard stays exact on the capped set."""
    boiler = "all rights reserved worldwide"
    texts = [f"{boiler} unique{i} token{i} extra{i}" for i in range(20)]
    texts += ["alpha beta gamma delta epsilon", "alpha beta gamma delta zeta"]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    # cap below the boilerplate df (20) but above the near-dup pair's dfs
    rows = TD.ngram_jaccard_pairs(df, n=3, threshold=0.3, max_df=5).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert (20, 21) in got
    assert all(a >= 20 for a, _ in got), f"boilerplate-only pairs leaked: {got}"
    # uncapped: the boilerplate shingles create pairs among the 20 docs
    raw = TD.ngram_jaccard_pairs(df, n=3, threshold=0.2, max_df=None).count()
    assert raw > len(got)
    capped = TD.ngram_jaccard_pairs(df, n=3, threshold=0.2, max_df=5).collect()
    assert all(r["id_a"] >= 20 for r in capped)
