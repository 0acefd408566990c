"""SCD2 merge edge cases (operators/scd.py) the oracle query can't hit:
brand-new keys, keys absent from the snapshot, no-op re-merge, multi-merge
history accumulation, and null-safe change detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_etl_minio_to_postgres_spark.operators.scd import scd2_init, scd2_merge

T1, T2, T3 = "2020-01-01 00:00:00", "2020-02-01 00:00:00", "2020-03-01 00:00:00"
KEYS, TRACKED = ["k"], ["seg", "bal"]


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, seg string, bal double")


def _merge(dim, snap, ts):
    return scd2_merge(dim, snap, ts, KEYS, TRACKED)


def test_new_key_inserts_open_row(spark):
    dim = scd2_init(_snap(spark, [(1, "A", 1.0)]), T1, KEYS, TRACKED)
    out = _merge(dim, _snap(spark, [(1, "A", 1.0), (2, "B", 2.0)]), T2).collect()
    by_key = {(r.k, r.is_current): r for r in out}
    assert len(out) == 2
    assert by_key[(2, True)].valid_from.isoformat() == "2020-02-01T00:00:00"
    assert by_key[(2, True)].valid_to is None
    assert by_key[(1, True)].valid_from.isoformat() == "2020-01-01T00:00:00"


def test_absent_key_stays_open(spark):
    dim = scd2_init(_snap(spark, [(1, "A", 1.0), (2, "B", 2.0)]), T1, KEYS, TRACKED)
    out = _merge(dim, _snap(spark, [(1, "A", 1.0)]), T2).collect()
    assert {(r.k, r.is_current, r.valid_to) for r in out} == {
        (1, True, None),
        (2, True, None),
    }


def test_unchanged_snapshot_is_a_noop(spark):
    snap = _snap(spark, [(1, "A", 1.0), (2, "B", 2.0)])
    dim = scd2_init(snap, T1, KEYS, TRACKED)
    out = _merge(dim, snap, T2)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, dim.collect()))


def test_two_changes_accumulate_history(spark):
    dim = scd2_init(_snap(spark, [(1, "A", 1.0)]), T1, KEYS, TRACKED)
    dim = _merge(dim, _snap(spark, [(1, "B", 1.0)]), T2)
    dim = _merge(dim, _snap(spark, [(1, "C", 1.0)]), T3)
    rows = sorted(dim.collect(), key=lambda r: r.valid_from)
    assert [(r.seg, r.is_current) for r in rows] == [
        ("A", False),
        ("B", False),
        ("C", True),
    ]
    assert [r.valid_to.isoformat() if r.valid_to else None for r in rows] == [
        "2020-02-01T00:00:00",
        "2020-03-01T00:00:00",
        None,
    ]


def test_null_safe_change_detection(spark):
    # null -> value and value -> null are both changes; null -> null is not.
    dim = scd2_init(
        _snap(spark, [(1, None, 1.0), (2, "B", None), (3, None, 3.0)]),
        T1,
        KEYS,
        TRACKED,
    )
    out = _merge(
        dim,
        _snap(spark, [(1, "A", 1.0), (2, None, None), (3, None, 3.0)]),
        T2,
    )
    n_versions = {
        r.k: r.n for r in out.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert n_versions == {1: 2, 2: 2, 3: 1}


def test_apply_cdc_latest_op_wins_and_validates_payload(spark):
    """Per key the highest-seq change wins (update-then-delete deletes;
    delete-then-reinsert resurrects); untouched keys pass through; a
    feed missing base columns fails loudly instead of nulling them."""
    import pytest
    from airflow_etl_minio_to_postgres_spark.operators.scd import apply_cdc

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, bal double",
    )
    changes = spark.createDataFrame(
        [
            # key 1: U then D -> gone
            (1, "a", 11.0, "U", 1),
            (1, "a", 11.0, "D", 2),
            # key 2: two updates -> seq-2 payload wins
            (2, "b", 21.0, "U", 1),
            (2, "b2", 22.0, "U", 2),
            # key 3: D then I -> resurrected with new payload
            (3, "c", 30.0, "D", 1),
            (3, "c2", 33.0, "I", 2),
            # key 5: pure insert
            (5, "e", 50.0, "I", 1),
        ],
        "k long, name string, bal double, op string, seq long",
    )
    got = {
        r.k: (r.name, r.bal)
        for r in apply_cdc(base, changes, ["k"]).collect()
    }
    assert got == {
        2: ("b2", 22.0),
        3: ("c2", 33.0),
        4: ("d", 40.0),   # untouched
        5: ("e", 50.0),
    }
    with pytest.raises(ValueError, match="cannot supply"):
        apply_cdc(base, changes.drop("bal"), ["k"])
