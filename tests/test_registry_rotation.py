"""The driver-window rotation contract (queries.py `_driver_order`).

The driver oracle-checks only the first 50 `queries()` entries, so the
order is derived from committed `CORRECTNESS_r*.json` history.  Round 5
shipped three brand-new operators outside the window by hand-ordering;
these tests make that class of mistake impossible to reintroduce silently.
"""

from __future__ import annotations

from airflow_etl_minio_to_postgres_spark import queries as registry

# Imported from the registry so the sidecar script, the tests, and the
# rotation itself cannot drift apart on the window size.
DRIVER_WINDOW = registry.DRIVER_WINDOW


def test_order_is_a_permutation_of_the_registry():
    ordered = list(registry.queries())
    assert sorted(ordered) == sorted(registry._QUERIES)
    assert list(registry.oracle_sql()) == [
        n for n in ordered if n in registry._ORACLES
    ]


def test_unverified_entries_precede_all_verified_ones():
    hist = registry._verification_history()
    green = registry._recorded_green_hashes()
    ordered = list(registry.queries())
    ranks = {n: i for i, n in enumerate(ordered)}
    eff = {n: registry._effective_round(n, hist, green) for n in ordered}
    unverified = [n for n in ordered if eff[n] == 0]
    verified = [n for n in ordered if eff[n] > 0]
    if unverified and verified:
        assert max(ranks[n] for n in unverified) < min(ranks[n] for n in verified)
    # A NEVER-green entry outside the window means >50 brand-new entries
    # at once — flag it loudly rather than silently shipping unchecked
    # ops.  (Hash-stale entries MAY overflow when one round's edits touch
    # more than 50 closures; the secondary sort guarantees the spill-over
    # is the most-recently-actually-verified entries, due back next
    # round.)
    for n in unverified:
        if hist.get(n, 0) == 0:
            assert ranks[n] < DRIVER_WINDOW, f"{n} is new but outside the window"
    # among needs-verification entries: never-green first, then DIRECT
    # wrapper/oracle edits, then transitive bumps — each group ordered
    # least-recently-actually-verified first
    def cls(n):
        if hist.get(n, 0) == 0:
            return 0
        return 1 if registry._directly_edited(n, green) else 2

    keys = [(cls(n), hist.get(n, 0)) for n in ordered if eff[n] == 0]
    assert keys == sorted(keys)


def test_verified_entries_are_least_recently_verified_first():
    hist = registry._verification_history()
    green = registry._recorded_green_hashes()
    eff = [
        registry._effective_round(n, hist, green) for n in registry.queries()
    ]
    assert eff == sorted(eff)


def test_code_change_resets_an_entry_to_unverified():
    # An entry green at round N whose implementing code hash no longer
    # matches the recorded green hash must sort as round 0 — this is the
    # r6 policy hole (docs_training_prep changed in r6 but rode its r5
    # row outside the window) made impossible.
    name = next(iter(registry._QUERIES))
    h_now = registry._current_code_hash(name)

    # _effective_round is pure given (name, hist, green) — no patching
    assert registry._effective_round(name, {name: 6}, {name: {"hash": h_now}}) == 6
    assert registry._effective_round(name, {name: 6}, {name: {"hash": "x"}}) == 0
    # green-but-never-hash-recorded is conservative: unverified
    assert registry._effective_round(name, {name: 5}, {}) == 0
    # sidecar missing entirely degrades to recency-only
    assert registry._effective_round(name, {name: 5}, None) == 5
    # never green: round 0 regardless
    assert registry._effective_round(name, {}, {name: {"hash": h_now}}) == 0


def test_query_code_hash_tracks_callee_modules_and_oracle():
    import inspect

    from airflow_etl_minio_to_postgres_spark.functions import graph
    from airflow_etl_minio_to_postgres_spark.rotation_hash import (
        hash_parts,
        query_code_hash,
    )

    fn = registry._QUERIES["docs_pagerank"]
    oracle = registry._ORACLES["docs_pagerank"]
    base = query_code_hash(fn, oracle)
    assert base == query_code_hash(fn, oracle)  # deterministic
    assert base != query_code_hash(fn, "SELECT 1")  # oracle is identity
    assert len(base) == 64 and set(base) <= set("0123456789abcdef")

    parts = hash_parts(fn, oracle)
    # the wrapper's own (normalized) source leads, the oracle closes
    from airflow_etl_minio_to_postgres_spark import rotation_hash as rh

    assert parts[0] == rh._normalized_source(fn)
    assert parts[-1] == oracle
    # docstring/comment edits must NOT change the identity
    assert "Fixed 3-iteration" in inspect.getsource(fn)  # docstring present…
    assert not any("Fixed 3-iteration" in p for p in parts)  # …but not hashed
    # transitive closure: the wrapper calls pagerank() directly and
    # near_dup_pairs() -> word_ngrams() indirectly; each contributes its
    # OWN source (an edit to any of them bumps this entry), while
    # unrelated functions in the same modules do not (adding a new
    # text/dedup helper must not invalidate the whole family)
    from airflow_etl_minio_to_postgres_spark.functions import dedup
    from airflow_etl_minio_to_postgres_spark.rotation_hash import (
        _normalized_source,
    )

    assert _normalized_source(graph.pagerank) in parts
    assert _normalized_source(dedup.near_dup_pairs) in parts
    assert _normalized_source(dedup._minhash_table) in parts  # transitive
    assert _normalized_source(dedup.simhash) not in parts  # unrelated
    # same-module helper rides along without dragging in all of queries.py
    assert _normalized_source(registry._near_dup_input) in parts
    assert inspect.getsource(registry) not in parts


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


def test_sync_script_green_names_and_artifact_ordering(tmp_path):
    import importlib.util
    import json
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "sync_query_hashes",
        Path(__file__).resolve().parent.parent / "scripts" / "sync_query_hashes.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    art = tmp_path / "CORRECTNESS_r03.json"
    art.write_text(
        json.dumps(
            {
                "good": {"rows_match": True, "hash_match": True, "err": None},
                "red": {"rows_match": False, "hash_match": True, "err": None},
                "errored": {"rows_match": True, "err": "boom"},
                "checkless": {"err": None},
            }
        )
    )
    assert mod.green_names(art) == ["good"]


def test_verified_commit_rejects_revert_shaped_history(tmp_path, monkeypatch):
    """Content A -> B -> A: the matching blobs form two non-contiguous
    runs, the candidate trees differ in code, and attribution must be
    refused (round-8 advisor finding: the early-break scan attributed
    greens to the revert commit's tree, which the driver never ran)."""
    import importlib.util
    import subprocess
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "sync_query_hashes_t",
        Path(__file__).resolve().parent.parent / "scripts" / "sync_query_hashes.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "REPO", tmp_path)

    def git(*args):
        subprocess.check_call(
            ["git", *args], cwd=tmp_path,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    art = tmp_path / "CORRECTNESS_r01.json"

    art.write_text('{"v": "A"}')
    git("add", "."); git("commit", "-q", "-m", "drop A")
    art.write_text('{"v": "B"}')
    git("add", "."); git("commit", "-q", "-m", "drop B")
    art.write_text('{"v": "A"}')
    git("add", "."); git("commit", "-q", "-m", "revert to A")

    assert mod.verified_commit("CORRECTNESS_r01.json") is None

    # Single-run history stays attributable: oldest commit of the run,
    # even when a later byte-identical touch re-commits the same content.
    art2 = tmp_path / "CORRECTNESS_r02.json"
    art2.write_text('{"v": "C"}')
    git("add", "."); git("commit", "-q", "-m", "drop C")
    first = subprocess.check_output(
        ["git", "rev-parse", "HEAD"], cwd=tmp_path, text=True
    ).strip()
    chosen = mod.verified_commit("CORRECTNESS_r02.json")
    assert chosen == first


def test_rotation_spill_sidecar_derivation(tmp_path, monkeypatch):
    """write_rotation_spill derives its sidecar from the LIVE registry:
    window == the first 50 queries() entries, due == the effective-
    round-0 set, spilled == due minus window.  Regenerated into a temp
    dir at test time (the committed sidecar goes stale the moment the
    next driver artifact lands — that is why the round-start ritual
    reruns the sync script)."""
    import importlib.util
    import json
    import shutil
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "sync_query_hashes_s", root / "scripts" / "sync_query_hashes.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # round inference needs at least one artifact in REPO
    art = sorted(root.glob("CORRECTNESS_r*.json"))[-1]
    shutil.copy(art, tmp_path / art.name)
    monkeypatch.setattr(mod, "REPO", tmp_path)
    mod.write_rotation_spill()

    out = list(tmp_path.glob("ROTATION_SPILL_r*.json"))
    assert len(out) == 1
    data = json.loads(out[0].read_text())
    order = list(registry.queries())
    assert data["window"] == order[:DRIVER_WINDOW]
    hist = registry._verification_history()
    green = registry._recorded_green_hashes()
    due = [
        n for n in order if registry._effective_round(n, hist, green) == 0
    ]
    assert data["due"] == due
    assert data["spilled_due"] == [
        n for n in due if n not in set(order[:DRIVER_WINDOW])
    ]


def test_query_code_hash_resolves_function_local_imports():
    """Round-11 walker gap: 'from X import Y' INSIDE a function body
    binds a local, invisible to the __globals__ walk — editing
    salted_band_sides did not bump the aHash entries that call it
    through exactly such an import, leaving them riding stale green
    rows.  Pin that a local-import dependency's OWN source now
    participates in the closure."""
    from airflow_etl_minio_to_postgres_spark.functions import (
        dedup,
        multimodal,
    )
    from airflow_etl_minio_to_postgres_spark.rotation_hash import (
        _local_imports,
        _normalized_source,
        hash_parts,
    )

    # ahash_near_dup_pairs imports salted_band_sides function-locally
    mods = {m for m, _ in _local_imports(multimodal.ahash_near_dup_pairs)}
    assert any("functions.dedup" in m for m in mods)

    fn = registry._QUERIES["multimodal_ahash_near_dup_pairs_salted"]
    parts = hash_parts(
        fn, registry._ORACLES["multimodal_ahash_near_dup_pairs_salted"]
    )
    assert _normalized_source(dedup.salted_band_sides) in parts
    # still no over-triggering: unrelated dedup functions stay out
    assert _normalized_source(dedup.near_dup_pairs) not in parts
