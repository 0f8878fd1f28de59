"""Similarity search tests: exact top-k vs numpy oracle, LSH recall."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from sedona_db_spark.similarity import (
    cosine_topk_bruteforce, lsh_ann_topk, embedding_neardup_pairs,
)
from sedona_db_spark.similarity.ann import _hyperplanes


@pytest.fixture(scope="module")
def emb(spark, sf_test):
    return spark.read.parquet(f"{sf_test}/embeddings.parquet").cache()


def _matrix(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, M


def _numpy_topk(ids, M, qmask, k):
    """Oracle with the same fixed-point rounding as the engine."""
    I = np.round(M * 1e6)
    dots = I @ I.T
    norms = np.sqrt((I * I).sum(axis=1))
    cos = dots / np.outer(norms, norms)
    out = {}
    for qi in np.nonzero(qmask)[0]:
        order = sorted((j for j in range(len(ids)) if j != qi),
                       key=lambda j: (-cos[qi, j], ids[j]))[:k]
        out[ids[qi]] = [ids[j] for j in order]
    return out


def test_bruteforce_topk_exact(emb):
    ids, M = _matrix(emb)
    q = emb.where(F.col("vec_id") % 25 == 0)
    got = {}
    for r in cosine_topk_bruteforce(emb, q, 3).collect():
        got.setdefault(r["q_id"], []).append((r["rn"], r["t_id"]))
    exp = _numpy_topk(ids, M, ids % 25 == 0, 3)
    assert set(got) == set(exp)
    for qid, lst in got.items():
        assert [t for _, t in sorted(lst)] == exp[qid]


def test_lsh_recall(emb):
    """Bucketed ANN: each reported neighbor must share the query's bucket
    and be exactly ranked within it; global recall is approximate."""
    ids, M = _matrix(emb)
    H = _hyperplanes(64, 6, 7)
    buckets = ((M @ H.T) > 0) @ (1 << np.arange(6))
    q = emb.where(F.col("vec_id") % 25 == 0)
    rows = lsh_ann_topk(emb, q, 3, dim=64, n_planes=6).collect()
    bucket_of = dict(zip(ids.tolist(), buckets.tolist()))
    for r in rows:
        assert bucket_of[r["q_id"]] == bucket_of[r["t_id"]]
    # exact top-1 within the same bucket must be found
    I = np.round(M * 1e6)
    norms = np.sqrt((I * I).sum(axis=1))
    got_top1 = {r["q_id"]: r["t_id"] for r in rows if r["rn"] == 1}
    for qi in np.nonzero(ids % 25 == 0)[0]:
        same = [j for j in range(len(ids))
                if j != qi and buckets[j] == buckets[qi]]
        if not same:
            continue
        cos = (I[qi] @ I[same].T) / (norms[qi] * norms[same])
        best = same[int(np.lexsort((ids[same], -cos))[0])]
        assert got_top1[ids[qi]] == ids[best]


def test_neardup_pairs_symmetric_threshold(emb):
    rows = embedding_neardup_pairs(emb, threshold=0.9, dim=64).collect()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert r["cosine"] >= 0.9


def test_ivf_ann(emb):
    """IVF: candidates share a probed list; full-probe == exact brute force."""
    from sedona_db_spark.similarity import ivf_ann_topk
    from pyspark.sql import functions as F
    ids, M = _matrix(emb)
    q = emb.where(F.col("vec_id") % 25 == 0)
    # n_probe == n_centroids → must equal the exact brute force result
    full = ivf_ann_topk(emb, q, 3, dim=64, n_centroids=8, n_probe=8)
    exact = _numpy_topk(ids, M, ids % 25 == 0, 3)
    got = {}
    for r in full.collect():
        got.setdefault(r["q_id"], []).append((r["rn"], r["t_id"]))
    assert set(got) == set(exact)
    for qid, lst in got.items():
        assert [t for _, t in sorted(lst)] == exact[qid]
    # partial probe: recall against exact top-1 should be decent
    part = ivf_ann_topk(emb, q, 1, dim=64, n_centroids=8, n_probe=3)
    top1 = {r["q_id"]: r["t_id"] for r in part.collect()}
    hits = sum(1 for qid, lst in exact.items()
               if top1.get(qid) == lst[0])
    assert hits / len(exact) >= 0.5
