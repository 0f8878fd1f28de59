"""Structured-streaming pipeline: file-source stream == batch result."""

import pytest

from pyspark.sql import functions as F

from sedona_db_spark.streaming import streaming_cell_counts, streaming_geocode
from sedona_db_spark.webtext import synth_pages


def test_streaming_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages_src")
    ckpt = str(tmp_path / "ckpt")
    pages = synth_pages(spark, 5000)
    pages.write.mode("overwrite").parquet(src)

    stream = (spark.readStream.schema(pages.schema).parquet(src))
    agg = streaming_cell_counts(stream, window="1 hour", watermark="2 hours", res=4)
    q = (agg.writeStream.format("memory").queryName("cell_counts")
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["window_start"], r["cell"]): r["cnt"]
           for r in spark.sql("SELECT * FROM cell_counts").collect()}
    # batch equivalent over the same data
    from sedona_db_spark import grid
    from sedona_db_spark.webtext.pages import geocode_cols
    lon, lat = geocode_cols(F.col("url"))
    batch = (pages.withColumn("lon", lon).withColumn("lat", lat)
             .withColumn("cell", F.expr(grid.cell_expr_sql("lon", "lat", 4)))
             .groupBy(F.window(F.col("warc_ts"), "1 hour").alias("w"), "cell")
             .agg(F.count(F.lit(1)).alias("cnt"))
             .select(F.col("w.start").alias("window_start"), "cell", "cnt"))
    exp = {(r["window_start"], r["cell"]): r["cnt"] for r in batch.collect()}
    # append mode emits only watermark-closed windows; every emitted row
    # must match the batch answer, and most windows must have been emitted
    assert got, "stream produced no rows"
    for k, v in got.items():
        assert exp.get(k) == v
    assert len(got) >= len(exp) * 0.5


def test_streaming_geocode_schema(spark, tmp_path):
    src = str(tmp_path / "pages_src2")
    pages = synth_pages(spark, 100)
    pages.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(pages.schema).parquet(src)
    geo = streaming_geocode(stream)
    assert geo.isStreaming
    assert {"lon", "lat", "cell"} <= set(geo.columns)


def test_streaming_spatial_join_matches_batch(spark, tmp_path):
    """Stream×static PIP join == batch interval join on the same pages."""
    from sedona_db_spark.streaming.pipeline import streaming_spatial_join
    from sedona_db_spark import grid
    from sedona_db_spark.webtext.pages import geocode_cols

    src = str(tmp_path / "pages_sj")
    pages = synth_pages(spark, 3000)
    pages.write.mode("overwrite").parquet(src)
    rects = spark.createDataFrame(
        [(k, f"zone{k}",
          -180.0 + k * 30.0, -60.0 + (k % 3) * 30.0,
          -180.0 + k * 30.0 + 40.0, -60.0 + (k % 3) * 30.0 + 50.0)
         for k in range(10)],
        "rid int, zname string, lon0 double, lat0 double, lon1 double, lat1 double")

    stream = spark.readStream.schema(pages.schema).parquet(src)
    j = streaming_spatial_join(stream, rects, res=5)
    assert j.isStreaming
    q = (j.writeStream.format("memory").queryName("sj_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_sj"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["url"], r["rid"]) for r in
           spark.sql("SELECT url, rid FROM sj_out").collect()}

    lon, lat = geocode_cols(F.col("url"))
    batch = (pages.withColumn("lon", lon).withColumn("lat", lat)
             .crossJoin(rects)
             .where((F.col("lon") >= F.col("lon0")) & (F.col("lon") <= F.col("lon1"))
                    & (F.col("lat") >= F.col("lat0")) & (F.col("lat") <= F.col("lat1"))))
    exp = {(r["url"], r["rid"]) for r in batch.select("url", "rid").collect()}
    assert got == exp and got


def test_streaming_exact_dedup(spark, tmp_path):
    from sedona_db_spark.streaming.pipeline import streaming_exact_dedup
    import pandas as pd
    from datetime import datetime, timedelta
    src = str(tmp_path / "dedup_src")
    t0 = datetime(2025, 1, 1, 12, 0, 0)
    pdf = pd.DataFrame({
        "url": [f"u{i}" for i in range(40)],
        "warc_ts": [t0 + timedelta(minutes=i) for i in range(40)],
        "text": [f"body {i % 10}" for i in range(40)],  # 10 distinct texts
    })
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "url string, warc_ts timestamp, text string").parquet(src)
    dd = streaming_exact_dedup(stream)
    q = (dd.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT text FROM dedup_out").collect()
    texts = [r["text"] for r in rows]
    assert sorted(set(texts)) == sorted(f"body {i}" for i in range(10))
    assert len(texts) == 10  # one survivor per distinct text in-horizon


def test_streaming_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionizer: completed sessions match the
    batch sessionize/session_stats semantics exactly (strict-gap splits);
    the event-time timeout closes idle sessions once the watermark passes
    last + gap."""
    import pandas as pd

    from sedona_db_spark.operators.sessionize import sessionize
    from sedona_db_spark.streaming import streaming_sessionize

    # two users, gaps of 10 min (same session at gap=30) and 2 h (split);
    # a late tail event advances the watermark far enough to time out
    # every real session
    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = []
    for u, offs in (("a", [0, 10, 20, 200, 210]),   # split at 200 (3h gap? 180min > 30) -> 2 sessions
                    ("b", [5, 15, 400])):           # split at 400 -> 2 sessions
        for m in offs:
            rows.append({"user_id": u, "ts": base + pd.Timedelta(minutes=m)})
    # watermark driver: a far-future event on a third user
    rows.append({"user_id": "zz", "ts": base + pd.Timedelta(days=30)})
    events = pd.DataFrame(rows)

    src = str(tmp_path / "sess_src")
    ckpt = str(tmp_path / "sess_ckpt")
    edf = spark.createDataFrame(events)
    edf.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(edf.schema).parquet(src)
    sess = streaming_sessionize(stream, gap_minutes=30.0,
                                watermark="1 minute")
    q = (sess.writeStream.format("memory").queryName("sessions")
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r["user"], r["session_start"], r["session_end"], r["n_events"])
           for r in spark.sql("SELECT * FROM sessions").collect()}

    # batch truth: every session of users a/b (the zz sentinel session may
    # stay open — it has no later watermark to close it)
    s = sessionize(edf, gap_minutes=30.0)
    batch = (s.groupBy("user_id", "session_id")
             .agg(F.min(F.col("ts").cast("timestamp").cast("double"))
                  .alias("t0"),
                  F.max(F.col("ts").cast("timestamp").cast("double"))
                  .alias("t1"),
                  F.count(F.lit(1)).alias("n")).collect())
    exp = {(r["user_id"], r["t0"], r["t1"], r["n"]) for r in batch
           if r["user_id"] != "zz"}
    assert exp <= got
    assert {g[0] for g in got} <= {"a", "b", "zz"}


def test_streaming_costream_join_matches_batch(spark, tmp_path):
    """Stream×stream co-visit join == the equivalent batch computation
    (pairs within max_dist_deg and the event-time window)."""
    from sedona_db_spark.streaming.pipeline import streaming_costream_join
    from sedona_db_spark.webtext.pages import geocode_cols

    srcA = str(tmp_path / "a_src")
    srcB = str(tmp_path / "b_src")
    ckpt = str(tmp_path / "cs_ckpt")
    a = synth_pages(spark, 1500)
    b = synth_pages(spark, 1500).withColumn(
        "url", F.concat(F.lit("b-"), F.col("url")))
    a.write.mode("overwrite").parquet(srcA)
    b.write.mode("overwrite").parquet(srcB)

    sa = spark.readStream.schema(a.schema).parquet(srcA)
    sb = spark.readStream.schema(b.schema).parquet(srcB)
    D = 0.35
    j = streaming_costream_join(sa, sb, max_dist_deg=D,
                                time_window="10 minutes",
                                watermark="30 minutes")
    q = (j.writeStream.format("memory").queryName("costream")
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r["l_url"], r["r_url"])
           for r in spark.sql("SELECT * FROM costream").collect()}

    # batch oracle: crossJoin + the same conditions
    lon_a, lat_a = geocode_cols(F.col("url"))
    ab = a.select(F.col("url").alias("l_url"), F.col("warc_ts").alias("l_ts"),
                  lon_a.alias("l_lon"), lat_a.alias("l_lat"))
    lon_b, lat_b = geocode_cols(F.col("url"))
    bb = b.select(F.col("url").alias("r_url"), F.col("warc_ts").alias("r_ts"),
                  lon_b.alias("r_lon"), lat_b.alias("r_lat"))
    exp = {(r["l_url"], r["r_url"]) for r in ab.crossJoin(bb).where(
        (F.abs(F.col("l_ts").cast("double") - F.col("r_ts").cast("double"))
         <= 600)
        & ((F.col("l_lon") - F.col("r_lon")) ** 2
           + (F.col("l_lat") - F.col("r_lat")) ** 2 <= D * D)
    ).collect()}
    assert got == exp and len(exp) > 0


def test_streaming_neardup_matches_batch_lsh(spark, tmp_path):
    """Streaming MinHash-LSH near-dup pairs == the batch
    minhash_lsh_candidates pair set (same signatures, same banding),
    restricted to the event-time window."""
    from sedona_db_spark.streaming.pipeline import streaming_neardup_pairs
    from sedona_db_spark.textops.dedup import minhash_lsh_candidates

    src = str(tmp_path / "nd_src")
    ckpt = str(tmp_path / "nd_ckpt")
    base = synth_pages(spark, 400).select("url", "warc_ts", "text")
    # inject exact/near duplicates so collisions exist
    dups = base.limit(40).withColumn(
        "url", F.concat(F.lit("dup-"), F.col("url")))
    docs = base.unionByName(dups)
    docs.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    nd = streaming_neardup_pairs(stream, text_col="text", id_col="url",
                                 ts_col="warc_ts", time_window="2 hours",
                                 watermark="4 hours")
    q = (nd.writeStream.format("memory").queryName("neardup")
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(240)
    got = {(r["id_a"], r["id_b"])
           for r in spark.sql("SELECT * FROM neardup").collect()}

    cand = minhash_lsh_candidates(docs, text_col="text", id_col="url")
    ts = {r["url"]: r["warc_ts"] for r in docs.select("url",
                                                      "warc_ts").collect()}
    exp = {(r["id_a"], r["id_b"]) for r in cand.collect()
           if abs((ts[r["id_a"]] - ts[r["id_b"]]).total_seconds()) <= 7200}
    assert got == exp and len(exp) >= 40


def test_streaming_scrub_matches_batch(spark, tmp_path):
    """PII scrubbing is a stateless projection, so it runs unchanged on
    a stream in append mode — rows must equal the batch scrub."""
    from sedona_db_spark.textops.scrub import scrub_documents

    rows = [(1, "mail a@b.co now"), (2, "ip 10.0.0.1 and 8.8.8.8"),
            (3, "clean"), (4, "ssn 123-45-6789 call 555-867-5309")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "scrub_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (scrub_documents(stream).writeStream.format("memory")
         .queryName("scrub_out").outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: (r["text"], r["pii_total"])
               for r in spark.sql("SELECT * FROM scrub_out").collect()}
    finally:
        q.stop()
    want = {r["doc_id"]: (r["text"], r["pii_total"])
            for r in scrub_documents(df).collect()}
    assert got == want and got[4][1] == 2
