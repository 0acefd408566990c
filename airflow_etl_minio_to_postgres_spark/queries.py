"""Engine query registry — every operator from SURVEY.md §2 exposed as a
(spark, sf_dir) -> DataFrame callable plus a matching DuckDB oracle SQL.

Each entry exercises one operator family over the driver test tables
(TESTDATA.md), since the DuckDB oracle views are pre-registered for exactly
those ten names.  Columns are aliased identically on both sides — the driver
hash-compares values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_etl_minio_to_postgres_spark.operators.cleaning import (
    clean_strings,
    fill_nulls,
)
from airflow_etl_minio_to_postgres_spark.operators.keys import (
    add_hash_key,
    add_natural_key,
    assign_surrogate_ids,
    dedup_rows,
    resolve_key_to_id,
)
from airflow_etl_minio_to_postgres_spark.sources.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary over lineitem.
# Exercises: scan + filter pushdown + partial agg + sort (SURVEY.md §2.4).
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                        AS sum_qty,
           sum(l_extendedprice)                                   AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount))                AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))  AS sum_charge,
           avg(l_quantity)                                        AS avg_qty,
           avg(l_extendedprice)                                   AS avg_price,
           avg(l_discount)                                        AS avg_disc,
           count(*)                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Cleaning kernel (T1-T3) over customer strings.
# ---------------------------------------------------------------------------


@register(
    "clean_strings_customer",
    """
    SELECT c_custkey,
           nullif(lower(trim(c_name)), '')       AS c_name,
           c_nationkey, c_acctbal,
           nullif(lower(trim(c_mktsegment)), '') AS c_mktsegment
    FROM customer
    """,
)
def clean_strings_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean_strings(load_table(spark, "customer", sf_dir))


@register(
    "fill_nulls_customer",
    """
    SELECT coalesce(c_custkey, -1)            AS c_custkey,
           coalesce(c_name, 'unknown')        AS c_name,
           coalesce(c_nationkey, -1)          AS c_nationkey,
           c_acctbal,
           coalesce(c_mktsegment, 'unknown')  AS c_mktsegment
    FROM customer
    """,
)
def fill_nulls_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fill_nulls(load_table(spark, "customer", sf_dir))


# ---------------------------------------------------------------------------
# Key kernel (T9-T13) over customer/orders.
# ---------------------------------------------------------------------------


@register(
    "natural_key_orders",
    """
    SELECT o_orderkey,
           concat_ws('|', cast(o_orderkey AS varchar), o_orderstatus,
                     o_orderpriority) AS natural_key
    FROM orders
    """,
)
def natural_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return add_natural_key(
        o, ["o_orderkey", "o_orderstatus", "o_orderpriority"]
    ).select("o_orderkey", "natural_key")


@register(
    "hash_key_customer",
    """
    SELECT c_custkey,
           substr(sha256(concat(cast(c_custkey AS varchar), c_mktsegment)), 1, 16)
               AS customer_key
    FROM customer
    """,
)
def hash_key_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    return add_hash_key(c, ["c_custkey", "c_mktsegment"], "customer_key").select(
        "c_custkey", "customer_key"
    )


@register(
    "dedup_mktsegment_dim",
    """
    SELECT DISTINCT substr(sha256(c_mktsegment), 1, 16) AS segment_key,
                    c_mktsegment
    FROM customer
    """,
)
def dedup_mktsegment_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    dim = add_hash_key(c, ["c_mktsegment"], "segment_key").select(
        "segment_key", "c_mktsegment"
    )
    return dedup_rows(dim)


@register(
    "surrogate_ids_mktsegment",
    """
    SELECT c_mktsegment,
           row_number() OVER (ORDER BY c_mktsegment) AS segment_id
    FROM (SELECT DISTINCT c_mktsegment FROM customer)
    """,
)
def surrogate_ids_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    return assign_surrogate_ids(c, "c_mktsegment", "segment_id")


@register(
    "key_to_id_resolution",
    """
    WITH ids AS (
        SELECT c_mktsegment,
               row_number() OVER (ORDER BY c_mktsegment) AS segment_id
        FROM (SELECT DISTINCT c_mktsegment FROM customer)
    )
    SELECT ids.segment_id, c.c_custkey, c.c_name
    FROM customer c LEFT JOIN ids USING (c_mktsegment)
    """,
)
def key_to_id_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    ids = assign_surrogate_ids(c, "c_mktsegment", "segment_id")
    child = c.select("c_mktsegment", "c_custkey", "c_name")
    # The segment id map is dimension-sized -> broadcast is safe and right.
    return resolve_key_to_id(child, ids, "c_mktsegment", "segment_id", broadcast=True)
