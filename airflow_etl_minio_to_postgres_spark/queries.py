"""Engine query registry — every operator from SURVEY.md §2 exposed as a
(spark, sf_dir) -> DataFrame callable plus a matching DuckDB oracle SQL.

Each entry exercises one operator family over the driver test tables
(TESTDATA.md), since the DuckDB oracle views are pre-registered for exactly
those ten names.  Columns are aliased identically on both sides — the driver
hash-compares values after sorting columns by name.
"""

from __future__ import annotations

import os
import tempfile
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
from airflow_etl_minio_to_postgres_spark.plans.medallion import run_medallion
from airflow_etl_minio_to_postgres_spark.schemas import TESTDATA_SCHEMAS
from airflow_etl_minio_to_postgres_spark.sources.catalog import load_table
from airflow_etl_minio_to_postgres_spark.sources.files import read_csv, write_csv

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


# ---------------------------------------------------------------------------
# End-to-end medallion (O1-O4 + T1-T13) over a medallion-shaped wide table
# derived from orders |X| customer, so the DuckDB oracle can replay the whole
# bronze->silver->gold pipeline in SQL (reference gold task
# dags/dag_etl_minio_to_postgres.py:365-597).
#
# The raw frame carries the reference's RAW header casing (exercises T1
# standardize on real data) and the field config carries mixed-case target
# values (exercises the lower/trim normalization at reference :152-155).
# ---------------------------------------------------------------------------

# (raw header, target table as it would appear in the workbook)
MEDALLION_FIELD_CONFIG: list[tuple[str, str]] = [
    ("Property_Title", "property"),
    ("Zip", "property"),
    ("Market", "property"),
    ("HOA", "HOA"),
    ("HOA_Flag", "hoa"),
    ("Taxes", "Taxes"),
    ("Reviewed_Status", "Leads"),
    ("Source", "leads"),
    ("Paint", "Rehab"),
    ("Underwriting_Rehab", "rehab"),
    ("Previous_Rent", "Valuation"),
    ("List_Price", "valuation"),
    ("Order_Key", "valuation"),
]


def _medallion_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Medallion-shaped raw wide table from orders |X| customer.

    Columns mirror the reference's fake_data.csv shape (FIXTURES.md A1):
    customer attrs play the property/hoa dims, order attrs the satellites.
    """
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    return o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_name").alias("Property_Title"),
        F.col("c_nationkey").cast("string").alias("Zip"),
        F.col("c_mktsegment").alias("Market"),
        F.col("c_nationkey").alias("HOA"),
        F.col("c_mktsegment").alias("HOA_Flag"),
        (F.col("o_orderkey") % 7).alias("Taxes"),
        F.col("o_orderstatus").alias("Reviewed_Status"),
        F.col("o_orderpriority").alias("Source"),
        F.col("o_orderstatus").alias("Paint"),
        (F.col("o_orderkey") % 100).alias("Underwriting_Rehab"),
        F.col("o_custkey").alias("Previous_Rent"),
        F.col("o_totalprice").alias("List_Price"),
        F.col("o_orderkey").alias("Order_Key"),
    )


def _run_demo_medallion(spark: SparkSession, sf_dir: str):
    raw = _medallion_raw(spark, sf_dir)
    fc = spark.createDataFrame(
        MEDALLION_FIELD_CONFIG, ["column_name", "target_table"]
    )
    return run_medallion(raw, fc)


# Shared oracle prefix: replay raw -> silver (T1-T3) -> keys (T9-T10) -> ids
# (T12) exactly as the engine computes them.
_MEDALLION_CTE = """
WITH raw AS (
    SELECT c.c_name                       AS property_title,
           CAST(c.c_nationkey AS VARCHAR) AS zip,
           c.c_mktsegment                 AS market,
           c.c_nationkey                  AS hoa,
           c.c_mktsegment                 AS hoa_flag,
           o.o_orderkey % 7               AS taxes,
           o.o_orderstatus                AS reviewed_status,
           o.o_orderpriority              AS source,
           o.o_orderstatus                AS paint,
           o.o_orderkey % 100             AS underwriting_rehab,
           o.o_custkey                    AS previous_rent,
           o.o_totalprice                 AS list_price,
           o.o_orderkey                   AS order_key
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
silver AS (
    SELECT coalesce(nullif(lower(trim(property_title)), ''), 'unknown')  AS property_title,
           coalesce(nullif(lower(trim(zip)), ''), 'unknown')             AS zip,
           coalesce(nullif(lower(trim(market)), ''), 'unknown')          AS market,
           coalesce(hoa, -1)                                             AS hoa,
           coalesce(nullif(lower(trim(hoa_flag)), ''), 'unknown')        AS hoa_flag,
           coalesce(taxes, -1)                                           AS taxes,
           coalesce(nullif(lower(trim(reviewed_status)), ''), 'unknown') AS reviewed_status,
           coalesce(nullif(lower(trim(source)), ''), 'unknown')          AS source,
           coalesce(nullif(lower(trim(paint)), ''), 'unknown')           AS paint,
           coalesce(underwriting_rehab, -1)                              AS underwriting_rehab,
           coalesce(previous_rent, -1)                                   AS previous_rent,
           list_price,
           coalesce(order_key, -1)                                      AS order_key
    FROM raw
),
keyed AS (
    SELECT *,
           concat_ws('|', property_title, zip)                            AS natural_key,
           substr(sha256(concat(property_title, zip)), 1, 16)             AS property_key,
           substr(sha256(concat(CAST(hoa AS VARCHAR), hoa_flag)), 1, 16)  AS hoa_key,
           substr(sha256(CAST(taxes AS VARCHAR)), 1, 16)                  AS taxes_key
    FROM silver
),
ids AS (
    SELECT property_key,
           row_number() OVER (ORDER BY property_key) AS property_id
    FROM (SELECT DISTINCT property_key FROM keyed) t
)
"""


@register(
    "medallion_silver",
    _MEDALLION_CTE
    + """
    SELECT property_title, zip, market, hoa, hoa_flag, taxes,
           reviewed_status, source, paint, underwriting_rehab,
           previous_rent, list_price, order_key
    FROM silver
    """,
)
def medallion_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_demo_medallion(spark, sf_dir).silver


@register(
    "medallion_gold_property",
    _MEDALLION_CTE
    + """
    SELECT i.property_id, k.natural_key, k.property_key, k.hoa_key,
           k.taxes_key, k.property_title, k.zip, k.market
    FROM keyed k LEFT JOIN ids i USING (property_key)
    """,
)
def medallion_gold_property(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_demo_medallion(spark, sf_dir).gold["property"]


@register(
    "medallion_gold_hoa",
    _MEDALLION_CTE + "SELECT DISTINCT hoa_key, hoa, hoa_flag FROM keyed",
)
def medallion_gold_hoa(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_demo_medallion(spark, sf_dir).gold["hoa"]


@register(
    "medallion_gold_taxes",
    _MEDALLION_CTE + "SELECT DISTINCT taxes_key, taxes FROM keyed",
)
def medallion_gold_taxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_demo_medallion(spark, sf_dir).gold["taxes"]


@register(
    "medallion_gold_leads",
    _MEDALLION_CTE
    + """
    SELECT i.property_id, k.reviewed_status, k.source AS lead_source
    FROM keyed k LEFT JOIN ids i USING (property_key)
    """,
)
def medallion_gold_leads(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_demo_medallion(spark, sf_dir).gold["leads"]


@register(
    "medallion_gold_rehab",
    _MEDALLION_CTE
    + """
    SELECT i.property_id, k.paint, k.underwriting_rehab
    FROM keyed k LEFT JOIN ids i USING (property_key)
    """,
)
def medallion_gold_rehab(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_demo_medallion(spark, sf_dir).gold["rehab"]


@register(
    "medallion_gold_valuation",
    _MEDALLION_CTE
    + """
    SELECT i.property_id, k.previous_rent, k.list_price, k.order_key
    FROM keyed k LEFT JOIN ids i USING (property_key)
    """,
)
def medallion_gold_valuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_demo_medallion(spark, sf_dir).gold["valuation"]


# ---------------------------------------------------------------------------
# Bronze I/O (S1/S4): land a table as CSV under a bronze prefix, read it
# back with an explicit schema, and prove the roundtrip is lossless against
# the parquet truth (reference bronze task dags/dag_etl_minio_to_postgres
# .py:253-265; read/write at :32-68).
# ---------------------------------------------------------------------------


@register(
    "bronze_csv_roundtrip_region",
    "SELECT r_regionkey, r_name FROM region",
)
def bronze_csv_roundtrip_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, "region", sf_dir)
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_bronze",
        os.path.basename(sf_dir.rstrip("/")) or "sf",
    )
    path = write_csv(region, os.path.join(base, "region"), mode="overwrite")
    return read_csv(spark, path, schema=TESTDATA_SCHEMAS["region"])
