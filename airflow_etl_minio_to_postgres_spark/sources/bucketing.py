"""Bucketed tables — co-located, shuffle-free joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle.  Writing
both sides bucketed by the join key into the catalog (``bucketBy`` +
``saveAsTable``) pre-partitions the data on disk: Spark's bucketed-scan
rule then joins bucket-to-bucket with NO exchange on either side, and
``sortBy`` within buckets removes the sort too.  This is the persisted
counterpart of ``repartition`` — pay the shuffle once at write time, reuse
it across every downstream join.

The reference has no equivalent (single-process pandas); this implements
the SURVEY.md §2.4 engine-plan item "bucketing for co-located joins".
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _drop_managed_table(spark: SparkSession, table: str) -> None:
    """Drop ``table`` and clear its managed location.  The built-in
    (non-Hive) catalog is session-scoped, so a fresh session can find a
    stale location on disk from a previous run — remove it explicitly."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if warehouse:
        shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table."""
    if mode == "overwrite":
        _drop_managed_table(df.sparkSession, table)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
    return table


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
