"""Resumable checkpointed execution: crash mid-join, resume, exact result."""

import pytest

from pyspark.sql import functions as F

from sedona_db_spark.operators import spatial_join
from sedona_db_spark.operators.checkpoint import checkpointed_spatial_join
from sedona_db_spark.sources import fixtures as FX


@pytest.fixture()
def data(spark):
    pts = FX.random_points(400, seed=42)
    pls = FX.random_polygons(60, seed=43, num_vertices=(3, 8))
    pdf = spark.createDataFrame(pts).withColumnRenamed("geometry", "geom")
    gdf = spark.createDataFrame(pls).withColumnRenamed("geometry", "geom")
    return pdf, gdf


def test_crash_and_resume_exact(data, spark, tmp_path):
    pdf, gdf = data
    out = str(tmp_path / "join_out")
    run = checkpointed_spatial_join(spark, out, pdf, gdf, "intersects",
                                    num_buckets=8, bucket_key="id")
    # crash after 3 buckets
    with pytest.raises(RuntimeError, match="simulated crash"):
        run.run(fail_after=3)
    assert len(run.committed()) == 3
    partial = {r["bucket"] for r in run.committed().values()}

    # resume: only the remaining buckets run
    run2 = checkpointed_spatial_join(spark, out, pdf, gdf, "intersects",
                                     num_buckets=8, bucket_key="id")
    summary = run2.run()
    assert summary["buckets_resumed"] == 3
    assert summary["buckets_ran"] == 5
    assert set(r["bucket"] for r in run2.committed().values()) == set(range(8))
    assert partial <= {r["bucket"] for r in run2.committed().values()}

    # final output == single-shot join, exactly
    got = {(r["id"], r["id_r"]) for r in run2.result().collect()}
    exp = {(r["id"], r["id_r"]) for r in
           spatial_join(pdf, gdf, "intersects").collect()}
    assert got == exp
    # ledger counters match landed rows
    assert sum(r["rows"] for r in run2.committed().values()) == len(got)


def test_rerun_is_noop(data, spark, tmp_path):
    pdf, gdf = data
    out = str(tmp_path / "join_out2")
    run = checkpointed_spatial_join(spark, out, pdf, gdf, "intersects",
                                    num_buckets=4, bucket_key="id")
    s1 = run.run()
    assert s1["buckets_ran"] == 4
    run2 = checkpointed_spatial_join(spark, out, pdf, gdf, "intersects",
                                     num_buckets=4, bucket_key="id")
    s2 = run2.run()
    assert s2["buckets_ran"] == 0 and s2["buckets_resumed"] == 4
    assert s2["rows_total"] == s1["rows_total"]
