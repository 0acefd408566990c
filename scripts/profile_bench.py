#!/usr/bin/env python
"""Profiling twin of bench.py: same queries, same noop-sink methodology,
plus per-entry job labels and a Spark event log so job/stage/task/shuffle
structure can be attributed to each registry entry offline.

NOT part of the driver contract — a measurement tool for optimization
rounds (guide §1.1/§1.5).  Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_bench.py /tmp/eventlog_dir

Then parse with scripts/parse_eventlog.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_etl_minio_to_postgres_spark import queries as registry
from airflow_etl_minio_to_postgres_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    log_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_eventlog"
    os.makedirs(log_dir, exist_ok=True)
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark(
        app_name="profile-bench",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    from airflow_etl_minio_to_postgres_spark.functions.dedup import release_caches

    all_queries = registry.queries()
    sc.setJobDescription("warmup")
    materialize(all_queries["q1_pricing_summary"](spark, SF_DIR))
    materialize(all_queries["docs_canonical_per_cluster"](spark, SF_DIR))
    release_caches()
    spark.catalog.clearCache()
    materialize(all_queries["medallion_silver"](spark, SF_DIR))

    timings: dict[str, float] = {}
    for name in sorted(all_queries):
        if only and name not in only:
            continue
        fn = all_queries[name]
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        materialize(fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 4)
    sc.setJobDescription(None)
    print(json.dumps({"queries": timings, "total": round(sum(timings.values()), 4)}))
    spark.stop()


if __name__ == "__main__":
    main()
