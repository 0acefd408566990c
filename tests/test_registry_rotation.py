"""The driver-window rotation contract (queries.py `_driver_order`).

The driver oracle-checks only the first 50 `queries()` entries, so the
order is derived from committed `CORRECTNESS_r*.json` history.  Round 5
shipped three brand-new operators outside the window by hand-ordering;
these tests make that class of mistake impossible to reintroduce silently.
"""

from __future__ import annotations

from airflow_etl_minio_to_postgres_spark import queries as registry

DRIVER_WINDOW = 50


def test_order_is_a_permutation_of_the_registry():
    ordered = list(registry.queries())
    assert sorted(ordered) == sorted(registry._QUERIES)
    assert list(registry.oracle_sql()) == [
        n for n in ordered if n in registry._ORACLES
    ]


def test_unverified_entries_precede_all_verified_ones():
    hist = registry._verification_history()
    ordered = list(registry.queries())
    ranks = {n: i for i, n in enumerate(ordered)}
    unverified = [n for n in ordered if n not in hist]
    verified = [n for n in ordered if n in hist]
    if unverified and verified:
        assert max(ranks[n] for n in unverified) < min(ranks[n] for n in verified)
    # An unverified entry outside the window means >50 NEW entries at
    # once — flag it loudly rather than silently shipping unchecked ops.
    for n in unverified:
        assert ranks[n] < DRIVER_WINDOW, f"{n} is new but outside the window"


def test_verified_entries_are_least_recently_verified_first():
    hist = registry._verification_history()
    last_round = [hist[n] for n in registry.queries() if n in hist]
    assert last_round == sorted(last_round)


def test_failed_rows_do_not_count_as_verified(tmp_path, monkeypatch):
    import json

    art = tmp_path / "CORRECTNESS_r01.json"
    art.write_text(
        json.dumps(
            {
                "good": {"rows_match": True, "hash_match": True, "err": None},
                "bad_hash": {"rows_match": True, "hash_match": False, "err": None},
                "bad_err": {"rows_match": True, "hash_match": True, "err": "boom"},
                "no_checks": {"err": None},
            }
        )
    )
    real_glob = registry._verification_history.__globals__  # sanity only
    assert "Path" not in real_glob  # Path is imported inside the function

    import pathlib

    monkeypatch.setattr(
        pathlib.Path,
        "glob",
        lambda self, pat: iter([art]) if pat == "CORRECTNESS_r*.json" else iter([]),
    )
    hist = registry._verification_history()
    assert hist == {"good": 1}
