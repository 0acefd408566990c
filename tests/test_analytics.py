"""Hand-computed semantics for the product-analytics operators
(events_funnel_conversion / events_cohort_retention / events_user_zscore):
the oracle gate proves Spark == DuckDB, these pin what BOTH must mean —
a purchase before any view must not convert, cohorts anchor at first
activity, z-scores drop constant users.
"""

from __future__ import annotations

import datetime as dt

from airflow_etl_minio_to_postgres_spark import queries as registry


def _events(spark, rows):
    # (event_id, ts, user_id, event_type, value)
    return spark.createDataFrame(
        [(eid, ts, uid, et, val, None) for eid, ts, uid, et, val in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _with_table(spark, df, tmp_path, name="events.parquet"):
    # load_table resolves {sf_dir}/{table}.parquet — mirror that layout.
    # Write MICROS like the driver's testdata (Spark's INT96 default is
    # sniffed as nanos by the catalog's footer check).
    old = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        df.write.mode("overwrite").parquet(str(tmp_path / name))
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", old)
    return str(tmp_path)


def test_funnel_requires_stage_order(spark, tmp_path, monkeypatch):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1: view -> click -> purchase, in order: full conversion
        (1, t(0), 1, "view", 1.0),
        (2, t(1), 1, "click", 1.0),
        (3, t(2), 1, "purchase", 5.0),
        # user 2: purchase BEFORE any view, then view: reaches view only
        (4, t(0), 2, "purchase", 5.0),
        (5, t(1), 2, "view", 1.0),
        # user 3: click before view, then view (no later click): view only
        (6, t(0), 3, "click", 1.0),
        (7, t(1), 3, "view", 1.0),
        # user 4: view -> click, no purchase: two stages
        (8, t(0), 4, "view", 1.0),
        (9, t(1), 4, "click", 1.0),
        # user 5: never views: reaches nothing
        (10, t(0), 5, "purchase", 2.0),
    ]
    sf_dir = _with_table(spark, _events(spark, rows), tmp_path)
    got = registry.events_funnel_conversion(spark, sf_dir).collect()[0]
    assert got["n_users"] == 5
    assert got["n_view"] == 4              # users 1-4
    assert got["n_view_click"] == 2        # users 1, 4
    assert got["n_view_click_purchase"] == 1  # user 1 only


def test_cohort_retention_anchors_at_first_activity(spark, tmp_path):
    # user 1 first active Mon Jan 1 week, returns 8 days later (offset 1);
    # user 2 first active the following week (its own cohort, offset 0)
    rows = [
        (1, dt.datetime(2024, 1, 2, 12), 1, "view", 1.0),
        (2, dt.datetime(2024, 1, 10, 12), 1, "view", 1.0),
        (3, dt.datetime(2024, 1, 9, 9), 2, "view", 1.0),
    ]
    sf_dir = _with_table(spark, _events(spark, rows), tmp_path)
    got = {
        (r["cohort_week"].date(), r["week_offset"]): r["n_users"]
        for r in registry.events_cohort_retention(spark, sf_dir).collect()
    }
    assert got == {
        (dt.date(2024, 1, 1), 0): 1,  # user 1, week of activity
        (dt.date(2024, 1, 1), 1): 1,  # user 1 retained in week 1
        (dt.date(2024, 1, 8), 0): 1,  # user 2's own cohort
    }


def test_user_zscore_drops_constant_users(spark, tmp_path):
    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "view", 10.0),
        (2, dt.datetime(2024, 1, 2), 1, "view", 20.0),
        (3, dt.datetime(2024, 1, 1), 2, "view", 7.0),  # single event: no sd
        (4, dt.datetime(2024, 1, 1), 3, "view", 5.0),  # constant user
        (5, dt.datetime(2024, 1, 2), 3, "view", 5.0),
    ]
    sf_dir = _with_table(spark, _events(spark, rows), tmp_path)
    got = {r["event_id"]: r["zscore"] for r in
           registry.events_user_zscore(spark, sf_dir).collect()}
    # only user 1 has nonzero spread: mean 15, stddev_pop 5 -> z = ∓1
    assert set(got) == {1, 2}
    assert abs(got[1] + 1.0) < 1e-12 and abs(got[2] - 1.0) < 1e-12


def test_hourly_gapfill_locf_semantics(spark, tmp_path):
    # hours 0 and 3 observed; 1-2 are gaps: counts 0, avg carried forward
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 15), 1, "view", 4.0),
        (2, dt.datetime(2024, 1, 1, 0, 45), 1, "view", 6.0),
        (3, dt.datetime(2024, 1, 1, 3, 30), 2, "view", 9.0),
    ]
    sf_dir = _with_table(spark, _events(spark, rows), tmp_path)
    got = {
        r["hour"].hour: (r["n_events"], r["last_avg_value"])
        for r in registry.events_hourly_gapfill_locf(spark, sf_dir).collect()
    }
    assert got == {
        0: (2, 5.0),   # observed: avg(4, 6)
        1: (0, 5.0),   # gap: count 0, LOCF carries 5.0
        2: (0, 5.0),
        3: (1, 9.0),   # new observation replaces the carried value
    }


def test_funnel_composes_with_per_user_cap(spark):
    """The bot guard in front of the funnel: a 1000-event bot user is
    capped to <= 5 rows BEFORE the per-user window, while a small
    organic user passes through uncapped and still converts."""
    from pyspark.sql import functions as F

    from airflow_etl_minio_to_postgres_spark.operators.cleaning import (
        cap_events_per_user,
    )

    t0 = dt.datetime(2024, 1, 1)
    bot = [
        (1000 + i, t0 + dt.timedelta(seconds=i), 99, "view", 1.0)
        for i in range(1000)
    ]
    organic = [
        (1, t0, 1, "view", 1.0),
        (2, t0 + dt.timedelta(minutes=1), 1, "click", 1.0),
        (3, t0 + dt.timedelta(minutes=2), 1, "purchase", 5.0),
    ]
    e = _events(spark, bot + organic)
    capped = cap_events_per_user(e, cap=5)
    per_user = {
        r.user_id: r.n
        for r in capped.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_user[99] == 5 and per_user[1] == 3
    # determinism: same rows regardless of input partitioning
    ids_a = sorted(r.event_id for r in capped.collect())
    ids_b = sorted(
        r.event_id
        for r in cap_events_per_user(e.repartition(7), cap=5).collect()
    )
    assert ids_a == ids_b
    # the organic user's ordered funnel survives the cap intact
    w = (
        capped.where(F.col("user_id") == 1)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert w[0].n == 3
