"""Common-Crawl-style web-pages table: synthesis, extraction, geocoding.

Implements BASELINE.json's input_hint: a table (url:string,
warc_ts:timestamp, html:binary, text:string, lang:string) whose URLs are
geocoded to point geometries.  Everything here is Spark-SQL-expression
based (JVM-side, whole-stage-codegen, zero Python) — synthesis via
``spark.range`` scales to any row count on any cluster, and text
extraction is a pure deterministic function of html (the north rule's
byte-identical-text-per-url invariant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

LANGS = ["en", "de", "fr", "es", "ja", "pt"]

# deterministic geocode parameters: mixture of uniform world coverage and
# dense "metro" hot spots (FIXTURES.md §1) to exercise cell skew
METROS = [  # (lon, lat) of hot spots
    (-74.0, 40.7), (-118.2, 34.0), (-87.6, 41.8), (2.35, 48.85),
    (-0.12, 51.5), (139.7, 35.6), (77.2, 28.6), (-46.6, -23.5),
]
METRO_FRACTION_PCT = 40  # % of pages snapped near a metro


def synth_pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic pages table of n rows, fully JVM-side."""
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    url = F.concat(F.lit("https://host"), (i % 1000).cast("string"),
                   F.lit(".example/path/"), i.cast("string"))
    title = F.concat(F.lit("Page "), i.cast("string"))
    body = F.concat(
        F.lit("Lorem ipsum dolor sit amet "), i.cast("string"),
        F.lit(" consectetur adipiscing elit id "), (i % 7919).cast("string"),
        F.lit(" the quick brown fox."))
    html = F.concat(
        F.lit("<html><head><title>"), title,
        F.lit("</title></head><body><p>"), body,
        F.lit("</p></body></html>"))
    lang = F.element_at(F.array(*[F.lit(l) for l in LANGS]),
                        (F.pmod(F.xxhash64(url), F.lit(len(LANGS))) + 1).cast("int"))
    return df.select(
        url.alias("url"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp")
         + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), (i * 17).cast("double"))
         ).alias("warc_ts"),
        html.cast("binary").alias("html"),
        body.alias("text"),
        lang.alias("lang"),
    )


def extract_text_col(html: Column) -> Column:
    """Pure deterministic text extraction: bytes of the first <p>…</p>.

    JVM-side regexp — identical bytes for identical html everywhere
    (the reference invariant: byte-identical extracted text per url)."""
    return F.regexp_extract(html.cast("string"), r"(?s)<p>(.*?)</p>", 1)


def geocode_cols(url: Column) -> tuple[Column, Column]:
    """Deterministic url → (lon, lat), JVM-side.

    Uniform world mixture + metro hot spots; all arithmetic on
    xxhash64(url) so the mapping is stable across runs and cluster sizes.
    """
    h = F.xxhash64(url)
    h2 = F.xxhash64(url, F.lit(9))  # independent hash (h * k would overflow ANSI bigint)
    lon_u = (F.pmod(h, F.lit(360_000_000)) / F.lit(1_000_000.0)) - F.lit(180.0)
    lat_u = (F.pmod(h2, F.lit(170_000_000)) / F.lit(1_000_000.0)) - F.lit(85.0)
    pick = F.pmod(F.xxhash64(url, F.lit(1)), F.lit(100))
    midx = F.pmod(F.xxhash64(url, F.lit(2)), F.lit(len(METROS)))
    mlon = F.element_at(F.array(*[F.lit(m[0]) for m in METROS]), (midx + 1).cast("int"))
    mlat = F.element_at(F.array(*[F.lit(m[1]) for m in METROS]), (midx + 1).cast("int"))
    jlon = (F.pmod(F.xxhash64(url, F.lit(3)), F.lit(2_000_000)) / F.lit(1_000_000.0)) - F.lit(1.0)
    jlat = (F.pmod(F.xxhash64(url, F.lit(4)), F.lit(2_000_000)) / F.lit(1_000_000.0)) - F.lit(1.0)
    is_metro = pick < F.lit(METRO_FRACTION_PCT)
    lon = F.when(is_metro, mlon + jlon * 0.5).otherwise(lon_u)
    lat = F.when(is_metro, mlat + jlat * 0.5).otherwise(lat_u)
    return lon, lat


def pages_to_points(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add lon, lat, geom (WKB point) to a pages DataFrame."""
    from sedona_db_spark.functions.scalar import st_point
    lon, lat = geocode_cols(F.col(url_col))
    return (df.withColumn("lon", lon)
              .withColumn("lat", lat)
              .withColumn("geom", st_point(F.col("lon"), F.col("lat"))))
