"""Incremental streaming silver + salted skew join."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_etl_minio_to_postgres_spark.operators.joins import salted_join
from airflow_etl_minio_to_postgres_spark.plans.medallion import build_silver
from airflow_etl_minio_to_postgres_spark.streaming.pipeline import (
    incremental_silver,
)

RAW_SCHEMA = T.StructType(
    [
        T.StructField("Property_Title", T.StringType()),
        T.StructField("Zip", T.StringType()),
        T.StructField("HOA", T.LongType()),
    ]
)


def test_incremental_silver_matches_batch(spark, tmp_path):
    raw_dir = str(tmp_path / "raw")
    rows1 = [("  House A ", "11111", 5), ("HOUSE B", "", None)]
    rows2 = [("house C", "33333", 7)]
    spark.createDataFrame(rows1, RAW_SCHEMA).write.parquet(raw_dir)
    spark.createDataFrame(rows2, RAW_SCHEMA).write.mode("append").parquet(raw_dir)

    stream = spark.readStream.schema(RAW_SCHEMA).parquet(raw_dir)
    q = incremental_silver(
        stream, str(tmp_path / "silver"), str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    full = spark.read.parquet(str(tmp_path / "silver"))
    batch = build_silver(spark.read.schema(RAW_SCHEMA).parquet(raw_dir))
    # the replay-safety partition column rides along on read; data
    # columns are the batch kernel's, byte-identical
    assert full.columns == batch.columns + ["_commit_id"]
    got = full.drop("_commit_id")
    assert got.columns == batch.columns == ["property_title", "zip", "hoa"]
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    # cleaning applied per micro-batch
    by_title = {r["property_title"]: r for r in got.collect()}
    assert by_title["house b"]["zip"] == "unknown"
    assert by_title["house b"]["hoa"] == -1


def test_incremental_silver_restart_is_exactly_once(spark, tmp_path):
    raw_dir = str(tmp_path / "raw")
    spark.createDataFrame([("A", "1", 1)], RAW_SCHEMA).write.parquet(raw_dir)
    out, ckpt = str(tmp_path / "silver"), str(tmp_path / "ckpt")
    incremental_silver(
        spark.readStream.schema(RAW_SCHEMA).parquet(raw_dir), out, ckpt
    ).awaitTermination()
    # Restart with no new input: the checkpoint must prevent reprocessing.
    incremental_silver(
        spark.readStream.schema(RAW_SCHEMA).parquet(raw_dir), out, ckpt
    ).awaitTermination()
    assert spark.read.parquet(out).count() == 1


def test_salted_join_equals_plain_join(spark):
    # Pathologically skewed: one key holds 90% of the fact rows.
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit("hot")).otherwise(
            F.format_string("k%d", F.col("id"))
        ).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("hot", 1), ("k950", 2), ("missing", 3)], ["k", "w"]
    )
    expected = sorted(
        map(tuple, big.join(small, "k").select("k", "v", "w").collect())
    )
    got = sorted(
        map(
            tuple,
            salted_join(big, small, "k", salt_buckets=8)
            .select("k", "v", "w")
            .collect(),
        )
    )
    assert got == expected
    assert len(got) == 901


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    small = spark.createDataFrame([("a", 10)], ["k", "w"])
    rows = {
        r["k"]: r["w"]
        for r in salted_join(big, small, "k", salt_buckets=4, how="left").collect()
    }
    assert rows == {"a": 10, "b": None}
