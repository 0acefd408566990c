"""Unit tests for operators/temporal.py (as-of join, bucketed range join)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from airflow_etl_minio_to_postgres_spark.operators.temporal import (
    as_of_join,
    range_join,
)


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 00:10:00")),
            (2, "a", _ts("2024-01-01 01:00:00")),
            (3, "a", _ts("2024-01-01 00:00:00")),  # before any right row
            (4, "b", _ts("2024-01-01 00:30:00")),
            (5, "c", _ts("2024-01-01 00:30:00")),  # key with no right rows
        ],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:05:00"), 10.0),
            ("a", _ts("2024-01-01 00:50:00"), 20.0),
            ("b", _ts("2024-01-01 00:30:00"), 30.0),  # exact tie with left id=4
        ],
        ["k", "ts", "v"],
    )
    return left, right


def test_asof_backward(spark, sides):
    left, right = sides
    got = {
        r["id"]: r["v"]
        for r in as_of_join(left, right, on="k").collect()
    }
    # id=1: latest right <= 00:10 is 00:05 (10.0); id=2: 00:50 (20.0);
    # id=3: none yet; id=4: exact-ts tie matches (inclusive); id=5: no key.
    assert got == {1: 10.0, 2: 20.0, 3: None, 4: 30.0, 5: None}


def test_asof_forward(spark, sides):
    left, right = sides
    got = {
        r["id"]: r["v"]
        for r in as_of_join(left, right, on="k", direction="forward").collect()
    }
    # forward: earliest right >= left ts
    assert got == {1: 20.0, 2: None, 3: 10.0, 4: 30.0, 5: None}


def test_asof_tolerance(spark, sides):
    left, right = sides
    got = {
        r["id"]: r["v"]
        for r in as_of_join(
            left, right, on="k", tolerance_seconds=360
        ).collect()
    }
    # id=1 gap 5min ok; id=2 gap 10min > 6min -> nulled; id=4 gap 0 ok
    assert got == {1: 10.0, 2: None, 3: None, 4: 30.0, 5: None}


def test_asof_collision_prefix(spark):
    """A right payload column whose name collides with a left column comes
    back as right_<name>; matched_ts always carries the match time."""
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 01:00:00"), 99.0)], ["id", "k", "ts", "v"]
    )
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01 00:00:00"), 7.0)], ["k", "ts", "v"]
    )
    row = as_of_join(left, right, on="k").collect()[0]
    assert row["v"] == 99.0
    assert row["right_v"] == 7.0
    assert row["matched_ts"] == _ts("2024-01-01 00:00:00")


def test_range_join_boundaries(spark):
    """start inclusive, end exclusive; bucket-boundary-spanning intervals
    match points in every covered bucket exactly once."""
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 00:00:00")),  # == start: match
            (2, "a", _ts("2024-01-01 01:59:59")),  # inside, 2nd bucket
            (3, "a", _ts("2024-01-01 02:00:00")),  # == end: no match
            (4, "b", _ts("2024-01-01 00:30:00")),  # wrong key
        ],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 02:00:00"), 1)],
        ["k", "s", "e", "iv"],
    )
    got = sorted(
        (r["id"], r["iv"])
        for r in range_join(
            left, right, on="k", ts_col="ts", start_col="s", end_col="e"
        ).collect()
    )
    assert got == [(1, 1), (2, 1)]


def test_range_join_overlapping_intervals(spark):
    """A point inside two overlapping windows matches both — and each pair
    appears exactly once even when intervals span multiple buckets."""
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 01:30:00"))], ["id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 03:00:00"), 1),
            ("a", _ts("2024-01-01 01:00:00"), _ts("2024-01-01 02:00:00"), 2),
        ],
        ["k", "s", "e", "iv"],
    )
    got = sorted(
        r["iv"]
        for r in range_join(
            left, right, on="k", ts_col="ts", start_col="s", end_col="e"
        ).collect()
    )
    assert got == [1, 2]


def test_range_join_rejects_collisions(spark):
    left = spark.createDataFrame([(1, "a", _ts("2024-01-01"))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01"), _ts("2024-01-02"), 5)], ["k", "s", "e", "id"]
    )
    with pytest.raises(ValueError, match="collision"):
        range_join(left, right, on="k", ts_col="ts", start_col="s", end_col="e")


def test_asof_rejects_bad_direction(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="direction"):
        as_of_join(left, right, on="k", direction="nearest")


def test_asof_tie_break_picks_max_without_extra_exchange(spark):
    """Three right rows tied on (key, ts): tie_break must pick the max
    payload deterministically, and the plan must still contain exactly
    ONE hash-partitioning Exchange (the tie resolution rides the window
    sort, not a pre-aggregation shuffle)."""
    from datetime import datetime

    from airflow_etl_minio_to_postgres_spark.operators.temporal import (
        as_of_join,
    )

    t1, t2 = datetime(2020, 1, 1), datetime(2020, 1, 2)
    left = spark.createDataFrame(
        [(100, 1, t2)], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t1, 5.0), (1, t1, 9.0), (1, t1, 2.0)],
        "user_id long, ts timestamp, v double",
    )
    out = as_of_join(left, right, on="user_id", tie_break="v")
    # plan audited BEFORE collect: the post-AQE string repeats the plan
    # under "== Initial Plan ==" and would double-count exchanges
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    rows = out.collect()
    assert len(rows) == 1 and rows[0].v == 9.0
    # unknown tie_break column fails loudly, not silently unordered
    import pytest

    with pytest.raises(ValueError, match="tie_break"):
        as_of_join(left, right, on="user_id", tie_break="nope")


def test_asof_payload_is_row_consistent(spark):
    """Round-8 advisor finding: when the winning right row has NULL in
    one payload column, that NULL must survive — per-column
    last(ignorenulls) would fill it from a losing/earlier row, attaching
    a payload no single right row ever had."""
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 02:00:00"))], ["id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [
            # earlier row: both fields set
            ("a", _ts("2024-01-01 00:00:00"), 10.0, "old"),
            # winner (latest <= left ts): v is NULL
            ("a", _ts("2024-01-01 01:00:00"), None, "new"),
        ],
        "k string, ts timestamp, v double, tag string",
    )
    row = as_of_join(left, right, on="k").collect()[0]
    assert row.tag == "new"
    assert row.v is None  # NOT 10.0 from the losing row
    assert row.matched_ts == _ts("2024-01-01 01:00:00")

    # tie_break winner must also carry its own NULLs
    right2 = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 01:00:00"), 5.0, "lo"),
            ("a", _ts("2024-01-01 01:00:00"), 9.0, None),
        ],
        "k string, ts timestamp, v double, tag string",
    )
    row = as_of_join(left, right2, on="k", tie_break="v").collect()[0]
    assert row.v == 9.0 and row.tag is None
