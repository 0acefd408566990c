#!/usr/bin/env python
"""Capture ``explain("formatted")`` for registry entries.

Usage:
    python scripts/explain_entries.py OUT_DIR SUFFIX entry [entry ...]

Writes ``OUT_DIR/<entry>_<SUFFIX>.txt`` for each entry.  Run with
PYTHONPATH pointing at the tree whose plans you want (e.g. a git
worktree of the pre-optimization commit for the ``before`` files).
Plan shape, not timing: sf dir defaults to sf0.01 and can be
overridden with $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    from airflow_etl_minio_to_postgres_spark import queries as registry
    from airflow_etl_minio_to_postgres_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name=f"explain-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    jvm = spark._sc._jvm
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            text = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - capture, keep going
            text = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
