#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1.4): NOT the official
bench — bench.py stays frozen.  Modes:

  python bench_extra.py phases     # per-query construct vs execute split
  python bench_extra.py explain QUERY...   # dump .explain('formatted')
  python bench_extra.py noop QUERY...      # noop-sink isolation timing
  python bench_extra.py jobs QUERY         # count Spark jobs in the query

Reads $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time


def get_session():
    from sedona_db_spark.session import get_spark
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = sys.argv[1] if len(sys.argv) > 1 else "phases"
    names = sys.argv[2:]

    from sedona_db_spark.plans.demo_queries import QUERIES
    from bench import HEADLINE
    spark = get_session()
    # warm-up
    QUERIES["geocode_cells"](spark, sf_dir).count()

    if mode == "phases":
        targets = names or HEADLINE
        out = {}
        for name in targets:
            best = None
            for _ in range(2):
                t0 = time.time()
                df = QUERIES[name](spark, sf_dir)
                t1 = time.time()
                df.count()
                t2 = time.time()
                spark.catalog.clearCache()
                rec = {"construct": round(t1 - t0, 3),
                       "execute": round(t2 - t1, 3),
                       "total": round(t2 - t0, 3)}
                if best is None or rec["total"] < best["total"]:
                    best = rec
            out[name] = best
            print(name, best, flush=True)
        print(json.dumps(out))
    elif mode == "explain":
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            print(f"==== {name} ====")
            print(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
    elif mode == "noop":
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            print(name, "noop_sec", round(time.time() - t0, 3))
    elif mode == "jobs":
        sc = spark.sparkContext
        st = sc.statusTracker()
        for name in names:
            before = set(st.getJobIdsForGroup() or [])
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.time()
            df.count()
            t2 = time.time()
            jobs = [j for j in (st.getJobIdsForGroup() or []) if j not in before]
            stages = 0
            for j in jobs:
                ji = st.getJobInfo(j)
                if ji:
                    stages += len(ji.stageIds)
            print(f"{name}: jobs={len(jobs)} stages={stages} "
                  f"construct={t1-t0:.3f}s execute={t2-t1:.3f}s")


if __name__ == "__main__":
    main()
