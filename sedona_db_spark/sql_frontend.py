"""SQL entry point for the kNN join: ``JOIN ... ON ST_KNN(l.g, r.g, k)``.

The reference plans this form through a logical-optimizer rewrite
(``KnnJoinEarlyRewrite``, rust/sedona-query-planner/src/optimizer.rs:112-152)
that lifts the join whose filter contains ``st_knn`` into its spatial-join
plan node before filter pushdown can disturb the build side.  PySpark
exposes no Python hook into Catalyst's logical rewrites, so this module
closes the same entry-point asymmetry one level up: :func:`sql` detects the
ST_KNN join pattern in the query TEXT, executes it through
``operators.knn_join`` (the real operator), registers the result as a temp
view, and evaluates the rest of the statement over that view with
``spark.sql``.  Everything that is not an ST_KNN join passes through to
``spark.sql`` untouched.

Supported shape (one kNN join per statement, table names or temp views)::

    SELECT <projection>
    FROM <left_table> [AS] <la>
    [INNER] JOIN <right_table> [AS] <ra>
      ON ST_KNN(<la>.<geom>, <ra>.<geom>, <k> [, <use_spheroid>])
    [WHERE ...] [GROUP BY ...] [ORDER BY ...] [LIMIT ...]

Qualified references ``<la>.<col>`` / ``<ra>.<col>`` in the projection and
trailing clauses resolve against the join result (right-side duplicates
take the ``_t`` suffix, exactly like ``knn_join``'s DataFrame output); the
computed ``knn_dist`` column is also referenceable.  Like the reference's
planner (and unlike a naive filter evaluation), the ``WHERE`` clause
applies AFTER neighbor selection — pushing it below the join would change
which targets are the k nearest (the exact hazard the reference's early
rewrite exists to prevent).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

_KNN_JOIN_RE = re.compile(
    r"""
    ^\s*SELECT\s+(?P<select>.*?)\s+
    FROM\s+(?P<ltab>[\w.]+)\s+(?:AS\s+)?(?P<la>\w+)\s+
    (?:INNER\s+)?JOIN\s+(?P<rtab>[\w.]+)\s+(?:AS\s+)?(?P<ra>\w+)\s+
    ON\s+ST_KNN\s*\(\s*(?P<g1>\w+\.\w+)\s*,\s*(?P<g2>\w+\.\w+)\s*,\s*
    (?P<k>\d+)\s*(?:,\s*(?P<sph>true|false)\s*)?\)\s*
    (?P<tail>.*?)\s*;?\s*$
    """,
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)


def _contains_knn_join(query: str) -> bool:
    return re.search(r"\bON\s+ST_KNN\s*\(", query, re.IGNORECASE) is not None


def sql(spark: SparkSession, query: str, include_ties: bool = False,
        ) -> DataFrame:
    """Run ``query``; an ``ON ST_KNN(...)`` join executes via ``knn_join``.

    ``include_ties`` mirrors the reference's session option
    ``knn_include_tie_breakers`` (rust/sedona-common/src/option.rs:78,
    default false).  Non-kNN statements delegate to ``spark.sql``.
    """
    if not _contains_knn_join(query):
        return spark.sql(query)
    m = _KNN_JOIN_RE.match(query)
    if m is None:
        raise ValueError(
            "unsupported ST_KNN SQL shape — expected SELECT ... FROM "
            "<left> [AS] a JOIN <right> [AS] b ON ST_KNN(a.g, b.g, k"
            "[, use_spheroid]) [WHERE/GROUP BY/ORDER BY/LIMIT ...]; "
            "for anything richer call operators.knn_join directly")
    from sedona_db_spark.operators import knn_join

    la, ra = m["la"], m["ra"]
    ltab, rtab = m["ltab"], m["rtab"]
    use_spheroid = (m["sph"] or "false").lower() == "true"

    def _col_of(qualified: str, alias: str, side: str) -> str:
        al, col = qualified.split(".", 1)
        if al != alias:
            raise ValueError(
                f"ST_KNN argument {qualified!r} must reference the "
                f"{side} alias {alias!r}")
        return col

    gl = _col_of(m["g1"], la, "left (query)")
    gr = _col_of(m["g2"], ra, "right (target)")

    qdf = spark.table(ltab)
    tdf = spark.table(rtab)
    qcols, tcols = list(qdf.columns), list(tdf.columns)
    # knn_join groups by a query/target id; synthesize unique ids so the
    # SQL form needs no id-column convention, and drop them afterwards
    # eager localCheckpoint pins the executor-generated ids: knn_join
    # evaluates its inputs in several jobs (side stats, cogroup rounds,
    # the include_ties self-join), and an unpinned
    # monotonically_increasing_id can reassign between evaluations on
    # nondeterministically-ordered upstreams (same mitigation as
    # spatial_join._broadcast_point_join; round-6 review finding)
    qdf2 = qdf.withColumn("__sd_qid", F.monotonically_increasing_id()) \
              .localCheckpoint(eager=True)
    tdf2 = tdf.withColumn("__sd_tid", F.monotonically_increasing_id()) \
              .localCheckpoint(eager=True)
    joined = knn_join(
        qdf2, tdf2, int(m["k"]), query_geom=gl, target_geom=gr,
        query_id="__sd_qid", target_id="__sd_tid",
        include_ties=include_ties, use_spheroid=use_spheroid,
    ).drop("__sd_qid", "__sd_tid", "__sd_tid_t")

    # qualified-name substitution: left alias refs keep their names, right
    # alias refs map through knn_join's _t duplicate suffixing
    dup = set(qcols) & set(tcols)

    def _sub(text: str) -> str:
        text = re.sub(rf"\b{re.escape(la)}\.(\w+)", r"\1", text)
        return re.sub(
            rf"\b{re.escape(ra)}\.(\w+)",
            lambda g: g.group(1) + ("_t" if g.group(1) in dup else ""),
            text)

    view = "__sd_knn_join"
    joined.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT {_sub(m['select'])} FROM {view} {_sub(m['tail'])}")
