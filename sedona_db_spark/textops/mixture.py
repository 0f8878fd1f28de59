"""Corpus mixture sampling and sequence packing — training-data pipeline
operators for LLM corpus construction (the step after dedup/quality in a
web-scale pipeline: reweight the language/source mixture, then pack
variable-length documents into fixed token budgets).

Design for 10^12 rows:
- ``sample_mixture`` is a pure-JVM whole-stage-codegen filter: the accept
  decision is deterministic integer arithmetic on (id, seed), so it is
  reproducible across retries/speculative tasks, needs no RNG state or
  shuffle, and pushes down past column pruning.  Fractional upsampling
  emits floor(rate) copies plus a Bernoulli extra via an exploded
  sequence — still JVM-only.
- ``pack_sequences`` is the classic greedy first-fit-by-order packer,
  distributed by hash bucket: documents are assigned to independent
  buckets (so packing parallelizes), and within a bucket the greedy scan
  runs in one ``applyInPandas`` pass ordered by id (deterministic bin
  ids).  Bin boundaries depend only on the bucket's own ordered rows —
  no global state, no driver loop.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

# LCG-style mix constants (Knuth multiplicative hashing); modulus is a
# prime so the acceptance variate is near-uniform on [0, 1) and EXACTLY
# replicable in any SQL engine with 64-bit integer arithmetic.
_MIX_A = 2654435761
_MIX_B = 40503
_MIX_P = 1000003


def mixture_u(id_col: F.Column, seed: int) -> F.Column:
    """Deterministic uniform-ish variate in [0, 1): ((id·A + seed·B) mod P)
    / P as a whole-stage-codegen expression (no RNG, no UDF).  The id is
    reduced mod P BEFORE the multiply — (id mod P)·(A mod P) < P² ≈ 10¹²,
    overflow-free int64 for ANY id (id·A directly would overflow past
    id ≈ 3.5·10⁹, i.e. well inside the 10^12-row design range; the
    congruence keeps the values identical for all ids)."""
    h = F.pmod(F.pmod(id_col.cast("long"), F.lit(_MIX_P))
               * F.lit(_MIX_A % _MIX_P)
               + F.lit((int(seed) * _MIX_B) % _MIX_P), F.lit(_MIX_P))
    return h.cast("double") / F.lit(float(_MIX_P))


def sample_mixture(df: DataFrame, rates: dict[str, float],
                   key_col: str = "lang", id_col: str = "doc_id",
                   seed: int = 42, default_rate: float = 0.0) -> DataFrame:
    """Resample ``df`` so group ``k`` of ``key_col`` is kept/upsampled at
    ``rates[k]`` (rate ≤ 1: Bernoulli keep; rate > 1: floor(rate) exact
    copies + Bernoulli fractional copy).  Adds ``copy_n`` (0-based copy
    index) so upsampled duplicates stay distinguishable downstream.

    Deterministic in (id, seed): re-running, retrying, or re-partitioning
    produces the identical sample — the property that makes web-scale
    mixture reweighting resumable (same reason the reference's pipelines
    hash-partition on stable keys rather than using RNG state)."""
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(key_col) == F.lit(k), F.lit(float(v))) \
                .otherwise(rate)
    u = mixture_u(F.col(id_col), seed)
    n_copies = (F.floor(rate) + F.when(u < rate - F.floor(rate), F.lit(1))
                .otherwise(F.lit(0))).cast("int")
    out = df.withColumn("__n", n_copies).where(F.col("__n") > 0)
    return (out.withColumn("copy_n", F.explode(
        F.sequence(F.lit(0), F.col("__n") - 1))).drop("__n"))


def mixture_oracle_sql(rates: dict[str, float], key_col: str = "lang",
                       id_col: str = "doc_id", seed: int = 42,
                       default_rate: float = 0.0) -> tuple[str, str, str]:
    """The exact acceptance arithmetic as portable SQL fragments:
    (rate_expr, u_expr, n_copies_expr) for an oracle engine."""
    cases = " ".join(
        f"WHEN {key_col} = '{k}' THEN CAST({float(v)!r} AS DOUBLE)"
        for k, v in sorted(rates.items()))
    rate = f"(CASE {cases} ELSE CAST({float(default_rate)!r} AS DOUBLE) END)"
    # (id % P + P) % P mirrors Spark's pmod for negative ids too
    u = (f"(CAST((((({id_col} % {_MIX_P}) + {_MIX_P}) % {_MIX_P})"
         f" * {_MIX_A % _MIX_P} "
         f"+ {(int(seed) * _MIX_B) % _MIX_P}) % {_MIX_P} "
         f"AS DOUBLE) / {float(_MIX_P)!r})")
    n = (f"(CAST(floor({rate}) AS INT) + CASE WHEN {u} < {rate} - "
         f"floor({rate}) THEN 1 ELSE 0 END)")
    return rate, u, n


def pack_sequences(df: DataFrame, max_tokens: int,
                   len_col: str = "n_tokens", id_col: str = "doc_id",
                   n_buckets: int = 64) -> DataFrame:
    """Greedy first-fit-by-id-order packing of documents into bins of at
    most ``max_tokens`` (documents longer than the budget get a bin of
    their own).  Returns the input columns + ``bucket``, ``bin_id``
    (unique: bucket * 2^32 + local bin), ``bin_fill`` (running tokens in
    the bin through this row).

    Scale shape: one shuffle (hash on id into ``n_buckets`` independent
    packing groups — at 10^12 docs raise n_buckets so each group fits an
    executor), then a single ordered pandas pass per group.  Bin ids are
    deterministic functions of the bucket's sorted (id, len) rows."""
    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)
    bucketed = df.withColumn(
        "bucket", F.pmod(F.col(id_col).cast("long"), F.lit(n_buckets))
        .cast("int"))
    schema = StructType(bucketed.schema.fields + [
        StructField("bin_id", LongType(), False),
        StructField("bin_fill", LongType(), False)])
    cap = int(max_tokens)

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(
            drop=True)
        bins, fills = [], []
        local_bin, fill = 0, 0
        for ln in pdf[len_col].astype("int64"):
            ln = int(ln)
            if fill > 0 and fill + ln > cap:
                local_bin += 1
                fill = 0
            fill += ln
            bins.append(int(key[0]) * (1 << 32) + local_bin)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    return bucketed.groupBy("bucket").applyInPandas(pack, schema=schema)
