"""Key-kernel unit tests: scalable surrogate ids + conditional broadcast.

VERDICT r01 item 5: the surrogate-id path must not funnel all keys through
one task, and ``resolve_key_to_id`` must not force a broadcast for large id
maps (AQE decides).  These tests pin both properties.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_etl_minio_to_postgres_spark.operators.keys import (
    assign_surrogate_ids,
    resolve_key_to_id,
)


def test_surrogate_ids_are_global_rank(spark):
    # 1000 distinct keys across 4 shuffle partitions: ids must be exactly
    # the global rank by key (== row_number() over (order by key)).
    df = spark.range(3000).select(
        F.format_string("k%04d", (F.col("id") % 1000)).alias("k")
    )
    got = {r["k"]: r["kid"] for r in assign_surrogate_ids(df, "k", "kid").collect()}
    assert len(got) == 1000
    for rank, key in enumerate(sorted(got), start=1):
        assert got[key] == rank, (key, got[key], rank)


def test_surrogate_ids_empty_input(spark):
    df = spark.createDataFrame([], "k string")
    out = assign_surrogate_ids(df, "k", "kid")
    assert out.columns == ["k", "kid"]
    assert out.count() == 0


def test_resolve_no_forced_broadcast_by_default(spark):
    child = spark.range(100).select(
        F.col("id"), F.format_string("k%d", F.col("id")).alias("k")
    )
    id_map = spark.range(100).select(
        F.format_string("k%d", F.col("id")).alias("k"),
        (F.col("id") + 1).alias("kid"),
    )
    plain = resolve_key_to_id(child, id_map, "k", "kid")
    hinted = resolve_key_to_id(child, id_map, "k", "kid", broadcast=True)
    # The *logical* plan must carry a broadcast hint only when requested;
    # physical broadcast chosen by AQE for genuinely small maps is fine.
    plain_logical = plain._jdf.queryExecution().logical().toString()
    hinted_logical = hinted._jdf.queryExecution().logical().toString()
    assert "broadcast" not in plain_logical.lower()
    assert "broadcast" in hinted_logical.lower()


def test_resolve_left_join_keeps_unmatched(spark):
    child = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    id_map = spark.createDataFrame([("a", 10)], ["k", "kid"])
    rows = {
        r["v"]: r["kid"]
        for r in resolve_key_to_id(child, id_map, "k", "kid").collect()
    }
    assert rows == {1: 10, 2: None}


def test_resolve_keep_key(spark):
    child = spark.createDataFrame([("a", 1)], ["k", "v"])
    id_map = spark.createDataFrame([("a", 10)], ["k", "kid"])
    out = resolve_key_to_id(child, id_map, "k", "kid", drop_key=False)
    assert out.columns == ["kid", "k", "v"]
