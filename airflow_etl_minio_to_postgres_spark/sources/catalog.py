"""Parquet catalog over the driver test tables.

Reads are schema-declared (no inference pass) and lazy; Catalyst prunes
columns/filters down to the parquet scan, which is the scale path for the
100 TB target — a scan that reads all columns for a 2-column projection is
wrong, and declaring the schema keeps ``ReadSchema`` minimal.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_etl_minio_to_postgres_spark.schemas import TESTDATA_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
# reader cannot map to TimestampType (micros).  They are read as raw
# nanosecond longs (legacy nanosAsLong) and integer-divided to micros
# (`div` truncates toward zero — exact for post-epoch data; pre-1970
# nanos would round up 1us vs a floor) with no double-precision loss.
#
# Conf note: nanosAsLong is session-global and stays set once a nanos
# table is loaded; within this engine every nanos column is declared here
# and always read long-then-converted, so the setting is idempotent.
NANOS_TS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def raw_read_schema(name: str) -> T.StructType | None:
    """Engine-facing schema with nanos-timestamp columns widened to long
    for the physical scan."""
    schema = TESTDATA_SCHEMAS.get(name)
    nanos = NANOS_TS_COLUMNS.get(name)
    if schema is None or not nanos:
        return schema
    return T.StructType(
        [
            T.StructField(f.name, T.LongType() if f.name in nanos else f.dataType)
            for f in schema.fields
        ]
    )


def restore_nanos_timestamps(df: DataFrame, name: str) -> DataFrame:
    """Convert raw nano longs back to TimestampType (micros, truncated)."""
    for col in NANOS_TS_COLUMNS.get(name, []):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one test table (``region nation customer supplier part orders
    lineitem events documents embeddings``) from ``{sf_dir}/{name}.parquet``."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name in NANOS_TS_COLUMNS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.read
    schema = raw_read_schema(name)
    if schema is not None:
        reader = reader.schema(schema)
    return restore_nanos_timestamps(reader.parquet(path), name)


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TESTDATA_SCHEMAS}
