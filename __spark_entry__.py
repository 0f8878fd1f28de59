"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over sedona_db_spark: ``entry`` runs the flagship
point-in-polygon spatial-join aggregation on sf0.001; ``queries`` /
``oracle_sql`` expose every implemented operator with its DuckDB oracle
(see sedona_db_spark/plans/demo_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _prepare(spark: SparkSession) -> None:
    from sedona_db_spark.session import register_all
    register_all(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: geocode documents → spatial join into nation
    rectangles → count per nation (two-phase cell join + refine)."""
    _prepare(spark)
    from sedona_db_spark.plans.demo_queries import q_pip_count_by_nation
    return q_pip_count_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sedona_db_spark.plans.demo_queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return fn(spark, sf_dir)
        return run
    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from sedona_db_spark.plans.demo_queries import ORACLE_SQL
    return dict(ORACLE_SQL)
