"""Code-identity hashing for the driver-window rotation.

Round 6's rotation ordered entries by verification RECENCY only: an entry
green in round N whose implementing code changed in round N+1 kept riding
its old green row and could stay outside the 50-entry driver window for a
round after being modified (it actually happened: ``prepare_training_corpus``
gained parameters in r6 while ``docs_training_prep`` sat outside the
window).  This module supplies the missing signal — a deterministic hash of
the code that IMPLEMENTS a query — so the rotation can treat "green at
round N but edited since" as unverified.

Granularity: the registered wrapper's own source, the source of every
same-module helper it calls directly, the FULL module source of every
package module it pulls functions from (a deep edit inside
``functions/dedup.py`` must bump every query that calls
``near_dup_pairs``), and the oracle SQL string (an oracle edit needs
re-verification exactly like a code edit).  Hashing whole sibling modules
is deliberate: per-function closures would miss helper-of-helper edits,
while whole-module hashing only over-bumps the handful of entries that
genuinely share that module — a cheap false positive (one extra driver row)
versus an expensive false negative (a changed operator shipping unchecked).

This module must stay import-free of the rest of the package: the sidecar
sync script (``scripts/sync_query_hashes.py``) ``exec``s its source inside
a checkout of a PAST commit to compute the hashes the driver actually
verified, so it can only rely on the standard library.
"""

from __future__ import annotations

import hashlib
import inspect
import sys
import types


def _package_of(fn) -> str:
    return fn.__module__.split(".")[0]


def hash_parts(fn, oracle: str | None = None) -> list[str]:
    """The ordered component list ``query_code_hash`` digests.

    Components, in deterministic order:
      1. the registered function's own source;
      2. sources of same-module callables it references directly
         (helpers like ``_near_dup_input`` that whole-module hashing of
         the registry would over-trigger on);
      3. full source of every OTHER package module whose callables it
         references (operators/functions/plans/streaming modules);
      4. the oracle SQL string, if any.
    """
    pkg = _package_of(fn)
    own_module = fn.__module__
    parts: list[str] = [inspect.getsource(fn)]
    local_sources: dict[str, str] = {}
    module_sources: dict[str, str] = {}
    for name in fn.__code__.co_names:
        obj = fn.__globals__.get(name)
        if obj is None or not callable(obj):
            continue
        mod = getattr(obj, "__module__", None)
        if not isinstance(mod, str) or mod.split(".")[0] != pkg:
            continue
        if mod == own_module:
            if name not in local_sources and not inspect.isbuiltin(obj):
                try:
                    local_sources[name] = inspect.getsource(obj)
                except (OSError, TypeError):
                    pass
        elif mod not in module_sources:
            m = sys.modules.get(mod)
            if isinstance(m, types.ModuleType):
                try:
                    module_sources[mod] = inspect.getsource(m)
                except (OSError, TypeError):
                    pass
    for name in sorted(local_sources):
        parts.append(local_sources[name])
    for mod in sorted(module_sources):
        parts.append(module_sources[mod])
    if oracle is not None:
        parts.append(oracle)
    return parts


def query_code_hash(fn, oracle: str | None = None) -> str:
    """sha256 over the code identity of one registered query (the
    ``hash_parts`` components joined with NUL separators)."""
    return hashlib.sha256(
        "\x00".join(hash_parts(fn, oracle)).encode("utf-8")
    ).hexdigest()
