#!/usr/bin/env python
"""Sync ``QUERY_HASHES.json`` — the code-identity record the rotation uses.

For every entry with a green row in a committed ``CORRECTNESS_r*.json``,
record the hash of the code that the driver actually verified.  The code
tested is the tree of the commit that last touched that artifact (the
driver commits artifacts on top of the builder's final round commit), so
this script, for each artifact in ascending round order:

  1. finds the artifact's introducing commit;
  2. ``git archive``s that commit into a temp dir;
  3. in a subprocess rooted there, imports the OLD registry and computes
     ``rotation_hash.query_code_hash`` for each green entry — using the
     CURRENT repo's hashing source (exec'd in, since the old tree may
     predate rotation_hash.py);
  4. merges the results into ``QUERY_HASHES.json`` (ascending order means
     each entry keeps the record of its LATEST green round).

A round whose old tree cannot be imported/hashed is skipped with a
warning — its entries simply stay "unverified" and re-enter the driver
window, the safe direction.  Run at round START, before editing any
code; idempotent.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import tempfile
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "airflow_etl_minio_to_postgres_spark"


def artifacts_ascending() -> list[tuple[Path, int]]:
    out = []
    for p in REPO.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m:
            out.append((p, int(m.group(1))))
    if not out:
        sys.exit("no CORRECTNESS_r*.json artifact found")
    return sorted(out, key=lambda t: t[1])


def green_names(artifact: Path) -> list[str]:
    rows = json.loads(artifact.read_text())
    out = []
    for name, row in rows.items():
        if not isinstance(row, dict) or row.get("err") is not None:
            continue
        checks = [v for k, v in row.items() if k.endswith("_match")]
        if checks and all(v is True for v in checks):
            out.append(name)
    return sorted(out)


def hashes_at_commit(commit: str, names: list[str], hash_src: str) -> dict:
    with tempfile.TemporaryDirectory() as td:
        tar = subprocess.Popen(
            ["git", "archive", commit], cwd=REPO, stdout=subprocess.PIPE
        )
        subprocess.check_call(["tar", "-x", "-C", td], stdin=tar.stdout)
        if tar.wait() != 0:
            raise RuntimeError("git archive failed")
        prog = textwrap.dedent(
            """
            import json, sys
            ns = {}
            exec(sys.stdin.read(), ns)
            from airflow_etl_minio_to_postgres_spark import queries as reg
            names = json.loads(sys.argv[1])
            out = {}
            for n in names:
                fn = reg._QUERIES.get(n)
                if fn is None:
                    continue
                o = reg._ORACLES.get(n)
                out[n] = {
                    "hash": ns["query_code_hash"](fn, o),
                    "wrapper_hash": ns["wrapper_hash"](fn, o),
                }
            print(json.dumps(out))
            """
        )
        res = subprocess.run(
            [sys.executable, "-c", prog, json.dumps(names)],
            cwd=td,
            input=hash_src,
            capture_output=True,
            text=True,
        )
        if res.returncode != 0:
            raise RuntimeError(f"hashing in {commit[:9]} failed:\n{res.stderr}")
        return json.loads(res.stdout.strip().splitlines()[-1])


def verified_commit(artifact: str) -> str | None:
    """The commit whose tree the driver actually verified for ``artifact``.

    NOT simply ``git log -n 1 -- artifact``: a later combined commit
    (conflict resolution, reformat) touching the artifact alongside code
    edits would silently attribute green hashes to code the driver never
    ran — the unsafe direction.  Instead: the OLDEST commit whose blob
    for the artifact equals its current content (the driver's original
    artifact drop; later byte-identical touches are ignored), and that
    commit must be a pure artifact drop — if it also modifies Python
    source, attribution is ambiguous and the artifact is skipped with a
    warning (its entries stay unverified and re-enter the driver window,
    the safe direction).

    On a revert-shaped history (content A -> B -> A) the matching
    commits form MULTIPLE non-contiguous runs and the two candidate
    trees differ in code, so no attribution is safe: the artifact is
    skipped rather than guessed (round-8 advisor finding — the earlier
    implementation stopped at the first divergence and silently
    attributed greens to the revert commit's tree, which the driver
    never ran)."""
    cur = subprocess.check_output(
        ["git", "hash-object", "--", artifact], cwd=REPO, text=True
    ).strip()
    # --full-history: default history simplification can drop the
    # side-branch commits of a revert that landed via merge, collapsing
    # an A->B->A history into one contiguous run — exactly the shape the
    # runs-detection below exists to refuse (round-9 advisor finding).
    commits = subprocess.check_output(
        ["git", "log", "--full-history", "--format=%H", "--", artifact],
        cwd=REPO,
        text=True,
    ).split()
    if not commits:
        print(f"skip {artifact}: not committed yet")
        return None
    # Scan the FULL history (no early break): collect contiguous runs of
    # commits whose blob equals the current content.
    runs: list[list[str]] = []
    in_run = False
    for c in commits:  # newest -> oldest
        try:
            blob = subprocess.check_output(
                ["git", "rev-parse", f"{c}:{artifact}"], cwd=REPO, text=True
            ).strip()
        except subprocess.CalledProcessError:
            in_run = False
            continue  # artifact absent at this commit
        if blob == cur:
            if in_run:
                runs[-1].append(c)
            else:
                runs.append([c])
                in_run = True
        else:
            in_run = False
    if not runs:
        print(f"skip {artifact}: working-tree content matches no commit")
        return None
    if len(runs) > 1:
        print(
            f"skip {artifact}: content matches {len(runs)} non-contiguous "
            f"commit runs (revert-shaped history) — attribution ambiguous"
        )
        return None
    chosen = runs[0][-1]  # oldest commit of the single matching run
    touched = subprocess.check_output(
        ["git", "diff-tree", "--no-commit-id", "--name-only", "-r", chosen],
        cwd=REPO,
        text=True,
    ).split()
    code = [p for p in touched if p.endswith(".py")]
    if code:
        print(
            f"skip {artifact}: introducing commit {chosen[:9]} also edits "
            f"code ({code[:3]}...) — cannot attribute driver-verified tree"
        )
        return None
    return chosen


def main() -> None:
    hash_src = (REPO / PKG / "rotation_hash.py").read_text()
    sidecar = REPO / "QUERY_HASHES.json"
    try:
        merged = json.loads(sidecar.read_text())
        assert isinstance(merged, dict)
    except (OSError, ValueError, AssertionError):
        merged = {}

    for artifact, rnd in artifacts_ascending():
        commit = verified_commit(artifact.name)
        if not commit:
            continue
        names = green_names(artifact)
        try:
            hashes = hashes_at_commit(commit, names, hash_src)
        except RuntimeError as e:
            print(f"skip {artifact.name}: {e}")
            continue
        for n, rec in hashes.items():
            merged[n] = {"round": rnd, **rec}
        print(f"{artifact.name}: {len(hashes)}/{len(names)} green entries "
              f"hashed @ {commit[:9]}")

    # Prune records for queries that no longer exist in the registry —
    # stale names would otherwise accumulate forever.
    sys.path.insert(0, str(REPO))
    from airflow_etl_minio_to_postgres_spark.queries import _QUERIES

    dropped = sorted(set(merged) - set(_QUERIES))
    for n in dropped:
        del merged[n]
    if dropped:
        print(f"pruned {len(dropped)} deleted queries: {dropped}")

    sidecar.write_text(json.dumps(merged, indent=1, sort_keys=True) + "\n")
    print(f"QUERY_HASHES.json: {len(merged)} total records")
    write_rotation_spill()


def write_rotation_spill() -> None:
    """Emit ``ROTATION_SPILL_r{next}.json`` — the COMPUTED prediction of
    the next driver window, replacing round 8's narrated spill list
    (SURVEY prose said "8 entries spill" while the judge reconstructed
    9; the set must come from the same code the rotation runs, not from
    prose).  Records the 50-slot window, every DUE entry (current code
    hash unverified: new, edited, or transitively bumped), the due
    entries that do NOT fit (the spill), and the stale tail (entries
    outside the window whose latest green round lags)."""
    from airflow_etl_minio_to_postgres_spark import queries as reg

    nxt = max(rnd for _, rnd in artifacts_ascending()) + 1
    hist = reg._verification_history()
    green = reg._recorded_green_hashes()
    order = list(reg.queries())
    window = order[: reg.DRIVER_WINDOW]
    eff = {n: reg._effective_round(n, hist, green) for n in order}
    due = [n for n in order if eff[n] == 0]
    spilled = [n for n in due if n not in set(window)]
    stale_tail = {
        n: hist.get(n, 0)
        for n in order[reg.DRIVER_WINDOW:]
        if eff[n] != 0 and hist.get(n, 0) < nxt - 2
    }
    out = {
        "for_round": nxt,
        "window": window,
        "due": due,
        "spilled_due": spilled,
        "stale_tail_outside_window": dict(
            sorted(stale_tail.items(), key=lambda kv: (kv[1], kv[0]))
        ),
    }
    p = REPO / f"ROTATION_SPILL_r{nxt}.json"
    p.write_text(json.dumps(out, indent=1) + "\n")
    print(
        f"{p.name}: {len(due)} due, {len(spilled)} spilled, "
        f"{len(stale_tail)} stale outside window"
    )


if __name__ == "__main__":
    main()
