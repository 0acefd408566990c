"""LIVE JDBC round-trips through embedded Apache Derby (ships in Spark's
jars) — the S6/S7/S9 surfaces with a real database in the loop, not just
option-dict checks.  Reference: dags/dag_etl_minio_to_postgres.py:110-148.

Embedded Derby runs inside the driver JVM, which is exactly the sandbox
constraint (no network Postgres); the engine-side code under test is the
same code a cluster would run against Postgres — only JdbcConfig changes.
"""

from __future__ import annotations

import os

import pytest

from airflow_etl_minio_to_postgres_spark.queries import _run_demo_medallion
from airflow_etl_minio_to_postgres_spark.sources.jdbc import (
    create_table_sql,
    dbapi_over_jvm,
    derby_config,
    execute_ddl,
    read_table,
    write_table,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def derby(spark, tmp_path):
    spark.sparkContext._jvm.java.lang.System.setProperty(
        "derby.stream.error.file", str(tmp_path / "derby.log")
    )
    return derby_config(str(tmp_path / "db"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_write_read_roundtrip_gold_hoa(spark, derby):
    """The VERDICT ask: push a medallion gold table through
    write_table + read_table and assert equality."""
    hoa = _run_demo_medallion(spark, SF_SMOKE).gold["hoa"]
    write_table(
        hoa,
        derby,
        "gold_hoa",
        mode="overwrite",
        max_connections=2,
        create_table_column_types="hoa_key VARCHAR(16), hoa_flag VARCHAR(64)",
    )
    back = read_table(spark, derby, "gold_hoa")
    assert sorted(back.columns) == sorted(hoa.columns)
    assert _rows(back.select(*hoa.columns)) == _rows(hoa)


def test_append_then_overwrite_is_idempotent(spark, derby):
    """mode semantics live: append doubles rows, overwrite resets —
    the rerun-safety story (SURVEY §7 hard-part 4) on a real database."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    opts = dict(create_table_column_types="v VARCHAR(8)")
    write_table(df, derby, "t_idem", mode="overwrite", **opts)
    write_table(df, derby, "t_idem", mode="append", **opts)
    assert read_table(spark, derby, "t_idem").count() == 4
    write_table(df, derby, "t_idem", mode="overwrite", **opts)
    assert read_table(spark, derby, "t_idem").count() == 2


def test_partitioned_read_covers_all_rows(spark, derby):
    """S9 partitioned scan: 4 JDBC range partitions must cover every row
    exactly once, including keys outside [lower, upper) (Spark routes
    them to the edge partitions)."""
    df = spark.range(0, 100).selectExpr("id AS k", "CAST(id % 7 AS INT) AS v")
    write_table(df, derby, "t_part", mode="overwrite")
    back = read_table(
        spark,
        derby,
        "t_part",
        partition_column="k",
        lower_bound=10,
        upper_bound=90,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert _rows(back) == _rows(df)


def test_execute_ddl_live(spark, derby):
    """S6 executor against a real connection (via the driver JVM's
    DriverManager): DDL runs, then a Spark JDBC write appends into the
    pre-created table and reads it back."""
    connect = dbapi_over_jvm(spark, derby.url)
    execute_ddl(
        connect,
        ['CREATE TABLE ddl_made ("k" BIGINT, "v" VARCHAR(8))'],
    )
    df = spark.createDataFrame([(7, "x")], ["k", "v"])
    write_table(df, derby, "ddl_made", mode="append")
    assert _rows(read_table(spark, derby, "ddl_made")) == [(7, "x")]


def test_scd2_dimension_live_roundtrip(spark, derby):
    """The two newest warehouse-shaped outputs close the loop over a real
    database.  SCD2: init + one merge produce open/closed versions; the
    Postgres DDL for the dimension is emitted (serving-sink dialect), the
    rows travel through the batched JDBC writer into Derby, and the
    partitioned read-back is value-identical — including NULL valid_to on
    open versions."""
    from airflow_etl_minio_to_postgres_spark.operators.scd import (
        scd2_init,
        scd2_merge,
    )

    snap1 = spark.createDataFrame(
        [(1, "BUILDING", 10.0), (2, "AUTO", 20.0)],
        ["custkey", "segment", "balance"],
    )
    snap2 = spark.createDataFrame(
        [(1, "MACHINERY", 10.0), (3, "AUTO", 5.0)],
        ["custkey", "segment", "balance"],
    )
    dim = scd2_merge(
        scd2_init(snap1, "2024-01-01", ["custkey"], ["segment", "balance"]),
        snap2,
        "2024-02-01",
        ["custkey"],
        ["segment", "balance"],
    )

    # Postgres serving-sink DDL for exactly this shape (S6 emitter).
    sql = create_table_sql(
        dim.schema, "dim_customer_scd2", schema_name="gold"
    )
    assert '"valid_from" TIMESTAMP' in sql
    assert '"is_current" BOOLEAN' in sql
    assert sql.startswith('CREATE TABLE IF NOT EXISTS "gold"."dim_customer_scd2"')

    write_table(
        dim,
        derby,
        "dim_scd2",
        mode="overwrite",
        max_connections=2,
        create_table_column_types="segment VARCHAR(16)",
    )
    back = read_table(spark, derby, "dim_scd2")
    assert _rows(back.select(*dim.columns)) == _rows(dim)
    live = {
        (r["custkey"], r["segment"])
        for r in back.where("is_current").collect()
    }
    assert live == {(1, "MACHINERY"), (2, "AUTO"), (3, "AUTO")}
    assert back.where("valid_to IS NOT NULL").count() == 1  # closed v1 of key 1


def test_hourly_rollup_live_roundtrip(spark, derby):
    """Hourly rollup (the streaming upsert's batch shape) served to a
    real database: aggregate events at sf0.001, emit the Postgres DDL,
    write through JDBC, read back partitioned on the bigint count."""
    from pyspark.sql import functions as F

    from airflow_etl_minio_to_postgres_spark.sources.catalog import load_table

    rollup = (
        load_table(spark, "events", SF_SMOKE)
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    sql = create_table_sql(rollup.schema, "events_hourly", schema_name="gold")
    assert '"hour" TIMESTAMP' in sql and '"n_events" BIGINT' in sql

    write_table(
        rollup,
        derby,
        "events_hourly",
        mode="overwrite",
        max_connections=2,
        create_table_column_types="event_type VARCHAR(32)",
    )
    back = read_table(
        spark,
        derby,
        "events_hourly",
        partition_column="n_events",
        lower_bound=0,
        upper_bound=100,
        num_partitions=3,
    )
    assert back.rdd.getNumPartitions() == 3
    assert _rows(back.select(*rollup.columns)) == _rows(rollup)


def test_create_table_sql_postgres_dialect_unchanged():
    """The DDL emitter stays Postgres-exact (SERIAL/TEXT are the
    reference's dialect, not Derby's) — Derby coverage above goes through
    Spark's writer + plain DDL strings instead."""
    from pyspark.sql import types as T

    struct = T.StructType(
        [
            T.StructField("hoa_key", T.StringType()),
            T.StructField("hoa", T.LongType()),
        ]
    )
    sql = create_table_sql(struct, "gold_hoa", serial_id="id", unique=["hoa_key"])
    assert '"id" SERIAL PRIMARY KEY' in sql
    assert '"hoa_key" TEXT UNIQUE' in sql
    assert sql.startswith("CREATE TABLE IF NOT EXISTS")
