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


def test_ledger_materializes_as_icetable(spark, tmp_path):
    """North rule: "checkpoints per-partition lineage and row/tile
    counters to Iceberg" — the ledger lands as an ice-table snapshot per
    run, time-travelable across resumes."""
    from sedona_db_spark.operators.checkpoint import checkpointed_spatial_join
    from sedona_db_spark.sources import fixtures as FX
    from sedona_db_spark.sources import icetable as I

    left = spark.createDataFrame(FX.random_points(120, seed=21)) \
        .withColumnRenamed("geometry", "geom")
    right = spark.createDataFrame(FX.random_polygons(6, seed=22)) \
        .withColumnRenamed("geometry", "geom")
    run = checkpointed_spatial_join(
        spark, str(tmp_path / "ckpt"), left, right, "intersects",
        num_buckets=4)
    run.run()
    t = run.ledger_to_icetable()
    led = I.read(spark, t)
    rows = {r["bucket"]: r["rows"] for r in led.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert sum(rows.values()) == run.result().count()
    # a second run (resume no-op) snapshots again; history preserved
    run.run()
    run.ledger_to_icetable()
    assert len(I.snapshots(t)) == 2
    assert I.read(spark, t, snapshot_id=1).count() == 4
