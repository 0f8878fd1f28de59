"""SparkSession builder with engine defaults + function registration.

Mirrors the reference's context construction
(/root/reference/rust/sedona/src/context.rs:103-247): one entry point that
wires options (AQE on, Arrow-batched UDF transfer, sensible shuffle
parallelism) and registers every spatial function, so SQL and DataFrame
front ends share one engine.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sedona_db_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cpus = _parallelism_of(master)
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalesce + skew-join splitting — our hot-cell safety
        # net at scale (the reference's analogue is Multi-partition probes)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE coalescing targets BYTES (parallelismFirst floors at
        # minPartitionSize=1m), which under-parallelizes CPU-bound string
        # aggregation/join stages whose per-byte cost is high (measured:
        # the shingle pipeline lost half its cores to coalescing at bench
        # scale).  64k keeps such stages at the session's width while
        # still merging genuinely tiny partitions; deployments with
        # thousands of shuffle partitions should raise this back toward
        # Spark's 1m default via SPARK_GRAFT_MIN_PART_SIZE.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_MIN_PART_SIZE", "64k"))
        # guide §3.1: allow shuffled-hash joins where a build partition
        # fits comfortably (no sort); the AQE local-map threshold bounds
        # the per-partition build side so the OOM risk stays capped
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"))
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                os.environ.get("SPARK_GRAFT_SHJ_LOCAL_MAP",
                               str(64 * 1024 * 1024)))
        # Arrow everywhere: pandas UDFs are the kernel substrate
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # generous broadcast: dimension geometry tables are small
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # long sessions compile hundreds of whole-stage-codegen classes; the
        # JVM default 240m code cache fills and later queries silently drop
        # to the interpreter (observed 3-5x slowdowns late in bench suites)
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=1g")
        # Spark's compiled-class cache holds only 100 generated classes
        # (LRU): a mixed workload with more distinct codegen units than
        # that re-Janino-compiles every plan on every repeat (measured
        # ~0.5s per heavy text query per pass at bench scale)
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    register_all(spark)
    return spark


def register_all(spark: SparkSession) -> None:
    from sedona_db_spark.functions.register import register_functions
    register_functions(spark)


def _parallelism_of(master: str) -> int:
    if master.startswith("local["):
        v = master[6:-1]
        if v == "*":
            return os.cpu_count() or 8
        try:
            return int(v)
        except ValueError:
            return 8
    return 8
