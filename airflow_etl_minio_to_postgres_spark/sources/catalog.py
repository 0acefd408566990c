"""Parquet catalog over the driver test tables.

Reads are schema-declared (no inference pass) and lazy; Catalyst prunes
columns/filters down to the parquet scan, which is the scale path for the
100 TB target — a scan that reads all columns for a 2-column projection is
wrong, and declaring the schema keeps ``ReadSchema`` minimal.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from airflow_etl_minio_to_postgres_spark.schemas import TESTDATA_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one test table (``region nation customer supplier part orders
    lineitem events documents embeddings``) from ``{sf_dir}/{name}.parquet``."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    path = os.path.join(sf_dir, f"{name}.parquet")
    reader = spark.read
    schema = TESTDATA_SCHEMAS.get(name)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TESTDATA_SCHEMAS}
