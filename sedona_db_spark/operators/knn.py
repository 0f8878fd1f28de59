"""Grid-pruned k-nearest-neighbor join via ring expansion.

Semantics mirror the reference's ST_KNN join
(/root/reference/rust/sedona-spatial-join/src/probe/knn_results_merger.rs,
python test contract /root/reference/python/sedonadb/tests/test_knnjoin.py:58-70):
for every query row, the k nearest target rows; default excludes ties →
exactly n_query × k rows, deterministic tiebreak on target id; per-query
results ordered by distance.

Distributed algorithm (the Spark-native analogue of the reference's
R-tree KNN probe):

1. both sides keyed by grid cell at a resolution sized so the average cell
   holds ~`target_per_cell` target points;
2. round t explores Chebyshev rings (prev, R_t] around each *unsettled*
   query's cell (R doubles each round): a query×ring-cell explode joined
   to targets on cell — an equi hash join, so targets shuffle once per
   round at most and AQE balances skew;
3. a query settles when it has ≥ k candidates whose k-th distance is
   ≤ R·min(cell_w, cell_h) — the guarantee that no unexplored cell can
   contain anything closer (same pruning invariant as an R-tree best-first
   search);
4. unsettled stragglers (outliers in empty space) eventually widen to the
   whole grid; the loop is driver-side but every data op is distributed.

Final selection is the reference's own oracle formulation:
``ROW_NUMBER() OVER (PARTITION BY query ORDER BY dist, target_id) <= k``.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from sedona_db_spark import grid
from sedona_db_spark.geometry import wkb as W


def _ring_cells_udf(res: int, r_lo: int, r_hi: int):
    """Cells with Chebyshev distance in (r_lo, r_hi] of each point's cell.

    Computed as box(r_hi) \\ box(r_lo) on *wrapped* (ix, iy) sets so that
    longitude wraparound on coarse grids never re-emits an already-explored
    cell (duplicate candidate pairs would corrupt the row_number ranking).
    """
    n = 1 << res

    def box(ix: int, iy: int, r: int) -> set:
        if r < 0:
            return set()
        xs = {(ix + dx) % n for dx in range(-r, r + 1)}
        ys = {iy + dy for dy in range(-r, r + 1) if 0 <= iy + dy < n}
        return {(jx, jy) for jx in xs for jy in ys}

    @pandas_udf(ArrayType(LongType()))
    def rings(b: pd.Series) -> pd.Series:
        x, y = W.wkb_to_points(b)
        base = grid.cell_ids(x, y, res)
        out = []
        cache: dict[int, list] = {}
        for c in base:
            c = int(c)
            cells = cache.get(c)
            if cells is None:
                _, ix, iy = grid.unpack(c)
                fresh = box(ix, iy, r_hi) - box(ix, iy, r_lo)
                cells = [
                    (np.int64(res) << 58) | (np.int64(jx) << 29) | np.int64(jy)
                    for jx, jy in fresh
                ]
                cache[c] = cells
            out.append(cells)
        return pd.Series(out)
    return rings


def knn_join(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    query_geom: str = "geom",
    target_geom: str = "geom",
    query_id: str = "id",
    target_id: str = "id",
    res: int | None = None,
    include_ties: bool = False,
    max_rounds: int = 12,
) -> DataFrame:
    """k nearest targets per query point (planar distance).

    Returns query columns + target columns (right duplicates suffixed
    ``_t``) + ``knn_dist``.  include_ties=False (reference default,
    knn_include_tie_breakers, rust/sedona-common/src/option.rs:78) gives
    exactly k rows per query.
    """
    dup = set(queries.columns) & set(targets.columns)
    tmap = {c: (c + "_t" if c in dup else c) for c in targets.columns}
    targets = targets.select([F.col(c).alias(tmap[c]) for c in targets.columns])
    tgeom, tid = tmap[target_geom], tmap[target_id]
    qcols = list(queries.columns)
    tcols = list(targets.columns)

    if res is None:
        n_t = targets.count()
        # ~2k targets per ring-1 neighborhood on average under uniformity
        cells_wanted = max(1, n_t // max(k, 1) // 2)
        res = min(grid.MAX_RES, max(0, int(math.log(max(cells_wanted, 1), 4))))

    from sedona_db_spark.operators.spatial_join import _cell_udf
    t_cells = targets.withColumn("__tcell", _cell_udf(res)(F.col(tgeom)))
    t_cells = t_cells.persist()

    from sedona_db_spark.functions.scalar import st_distance

    cw = min(grid.cell_width(res), grid.cell_height(res))
    pending = queries
    settled_parts: list[DataFrame] = []
    cand_cols = qcols + tcols + ["knn_dist"]
    accumulated: DataFrame | None = None

    n_grid = 1 << res
    r_prev = -1
    r_cur = 1
    for round_no in range(max_rounds):
        ring = pending.withColumn(
            "__qcell", F.explode(_ring_cells_udf(res, r_prev, r_cur)(F.col(query_geom))))
        cand = ring.join(t_cells, ring["__qcell"] == t_cells["__tcell"], "inner")
        cand = cand.select(
            *qcols, *tcols,
            st_distance(F.col(query_geom), F.col(tgeom)).alias("knn_dist"))
        accumulated = cand if accumulated is None else accumulated.unionByName(cand)
        accumulated = accumulated.persist()

        # settle check: k-th distance within the explored-safe radius
        safe = r_cur * cw
        w = Window.partitionBy(query_id).orderBy(F.col("knn_dist").asc(), F.col(tid).asc())
        ranked = accumulated.withColumn("__rn", F.row_number().over(w))
        kth = (ranked.where(F.col("__rn") == k)
               .select(query_id, F.col("knn_dist").alias("__kth")))
        done_ids = kth.where(F.col("__kth") <= safe).select(query_id)
        exhausted = r_cur >= n_grid  # explored the whole grid
        if exhausted:
            done_ids = pending.select(query_id)
        settled = ranked.join(done_ids, on=query_id, how="left_semi")
        if include_ties:
            # keep every candidate at distance ≤ the k-th (ties included)
            kth_all = (settled.where(F.col("__rn") == k)
                       .select(query_id, F.col("knn_dist").alias("__kth")))
            settled = (settled.join(kth_all, on=query_id, how="left")
                       .where(F.col("__kth").isNull()
                              | (F.col("knn_dist") <= F.col("__kth")))
                       .drop("__kth"))
            settled_parts.append(settled.drop("__rn"))
        else:
            settled_parts.append(settled.where(F.col("__rn") <= k).drop("__rn"))
        pending = pending.join(done_ids, on=query_id, how="left_anti")
        accumulated = accumulated.join(done_ids, on=query_id, how="left_anti")
        if exhausted or pending.isEmpty():
            break
        r_prev, r_cur = r_cur, min(max(r_cur * 2, r_cur + 1), n_grid)

    out = settled_parts[0]
    for part in settled_parts[1:]:
        out = out.unionByName(part)
    # the result no longer references the cached candidate accumulators;
    # let them go so long-lived sessions don't pin executor storage.
    # (materialize first: the union above still reads them lazily)
    out = out.persist()
    out.count()
    t_cells.unpersist()
    if accumulated is not None:
        accumulated.unpersist()

    if include_ties:
        w = Window.partitionBy(query_id).orderBy(F.col("knn_dist").asc(), F.col(tid).asc())
        # recompute with rank over final candidate set: ties at the k-th
        # distance all included (knn_include_tie_breakers=true semantics)
        kth = (out.withColumn("__rn", F.row_number().over(w))
                  .where(F.col("__rn") == k)
                  .select(query_id, F.col("knn_dist").alias("__kth")))
        out = (out.join(kth, on=query_id, how="left")
                  .where(F.col("__kth").isNull() | (F.col("knn_dist") <= F.col("__kth")))
                  .drop("__kth"))
    return out.select(*cand_cols)
