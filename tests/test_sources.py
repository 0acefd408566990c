"""I/O layer tests: CSV/Excel/parquet dispatch, JDBC options + DDL emission.

JDBC correctness runs without a database: the option builders and DDL
emitters are pure functions, and ``execute_ddl`` takes an injected DB-API
connection factory (here a recorder).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from airflow_etl_minio_to_postgres_spark.sources.files import (
    bronze_path,
    ingest_bronze,
    read_csv,
    read_file,
    write_csv,
    write_parquet,
)
from airflow_etl_minio_to_postgres_spark.sources.jdbc import (
    JdbcConfig,
    create_schema_sql,
    create_table_sql,
    execute_ddl,
    pg_type,
    read_options,
    write_options,
)

CFG = JdbcConfig(url="jdbc:postgresql://db:5432/gold", user="u", password="p")


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b,c"), (3, None)], ["k", "v"])
    path = write_csv(df, str(tmp_path / "t"), mode="overwrite")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    back = read_csv(spark, path, schema=schema)
    assert sorted((r["k"], r["v"]) for r in back.collect()) == [
        (1, "a"),
        (2, "b,c"),
        (3, None),
    ]


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "part"])
    path = write_parquet(df, str(tmp_path / "p"), partition_by=["part"])
    back = spark.read.parquet(path)
    assert back.count() == 2
    assert set(back.columns) == {"k", "part"}


def test_read_file_dispatch_unsupported(spark):
    with pytest.raises(ValueError, match="unsupported file type"):
        read_file(spark, "/tmp/data.json")


def test_read_file_csv_dispatch(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    write_csv(df, str(tmp_path / "d.csv"))
    assert read_file(spark, str(tmp_path / "d.csv")).count() == 1


def test_excel_requires_optional_engine(spark, tmp_path):
    pytest.importorskip("openpyxl", reason="no Excel engine in this env")
    # With an engine present, a real roundtrip would run here.


def test_ingest_bronze(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    write_csv(df, str(tmp_path / "Raw File.csv"))
    out_df, out_path = ingest_bronze(
        spark, str(tmp_path / "Raw File.csv"), str(tmp_path / "bronze")
    )
    assert out_path.endswith("bronze-files/raw_file.csv")
    assert out_df.count() == 2
    assert spark.read.option("header", "true").csv(out_path).count() == 2


def test_bronze_path_normalizes():
    assert bronze_path("b", "Fake Data.csv") == "b/bronze-files/fake_data.csv"


def test_read_options_plain():
    opts = read_options(CFG, "silver.property")
    assert opts["dbtable"] == "silver.property"
    assert opts["driver"] == "org.postgresql.Driver"
    assert "partitionColumn" not in opts


def test_read_options_partitioned_validation():
    with pytest.raises(ValueError, match="partitioned JDBC read"):
        read_options(CFG, "t", partition_column="id")
    opts = read_options(
        CFG, "t", partition_column="id", lower_bound=0, upper_bound=100,
        num_partitions=8,
    )
    assert opts["numPartitions"] == "8"
    assert opts["lowerBound"] == "0"


def test_write_options_batched():
    opts = write_options(CFG, "gold.property", batchsize=5000)
    assert opts["batchsize"] == "5000"
    assert "reWriteBatchedInserts=true" in opts["url"]


def test_pg_type_mapping():
    assert pg_type(T.DecimalType(10, 2)) == "NUMERIC(10,2)"
    assert pg_type(T.StringType()) == "TEXT"
    assert pg_type(T.LongType()) == "BIGINT"
    with pytest.raises(ValueError):
        pg_type(T.ArrayType(T.FloatType()))


def test_create_table_sql_gold_hoa():
    # Mirrors reference gold.hoa DDL (dags/dag_etl_minio_to_postgres.py:413-420)
    struct = T.StructType(
        [
            T.StructField("hoa_key", T.StringType()),
            T.StructField("hoa", T.LongType()),
            T.StructField("hoa_flag", T.StringType()),
        ]
    )
    sql = create_table_sql(
        struct, "hoa", schema_name="gold", serial_id="id", unique=["hoa_key"]
    )
    assert '"id" SERIAL PRIMARY KEY' in sql
    assert '"hoa_key" TEXT UNIQUE' in sql
    assert 'CREATE TABLE IF NOT EXISTS "gold"."hoa"' in sql


def test_create_table_sql_foreign_key():
    struct = T.StructType([T.StructField("property_id", T.LongType())])
    sql = create_table_sql(
        struct, "leads", schema_name="gold",
        foreign_keys={"property_id": 'gold."property" (id)'},
    )
    assert 'FOREIGN KEY ("property_id") REFERENCES gold."property" (id)' in sql


def test_execute_ddl_single_txn():
    executed, committed, closed = [], [], []

    class FakeCursor:
        def execute(self, stmt):
            executed.append(stmt)

    class FakeConn:
        def cursor(self):
            return FakeCursor()

        def commit(self):
            committed.append(True)

        def close(self):
            closed.append(True)

    execute_ddl(FakeConn, [create_schema_sql("gold"), "CREATE TABLE t (x INT)"])
    assert executed == ['CREATE SCHEMA IF NOT EXISTS "gold"', "CREATE TABLE t (x INT)"]
    assert committed == [True] and closed == [True]
