"""Code-identity hashing for the driver-window rotation.

Round 6's rotation ordered entries by verification RECENCY only: an entry
green in round N whose implementing code changed in round N+1 kept riding
its old green row and could stay outside the 50-entry driver window for a
round after being modified (it actually happened: ``prepare_training_corpus``
gained parameters in r6 while ``docs_training_prep`` sat outside the
window).  This module supplies the missing signal — a deterministic hash of
the code that IMPLEMENTS a query — so the rotation can treat "green at
round N but edited since" as unverified.

Granularity: the TRANSITIVE per-function closure.  Starting from the
registered wrapper, every package function/class it references is walked
recursively (through nested lambdas too, via code-object constants), each
contributing its DOCSTRING-AND-COMMENT-NORMALIZED source (parse -> strip
docstrings -> unparse), so documentation edits never re-sort an entry;
module-level constants it reads (regex tables, schema dicts, thresholds)
contribute their ``repr``; the oracle SQL string contributes verbatim (an
oracle edit needs re-verification exactly like a code edit).
Whole-module hashing was tried first and over-triggered: ADDING a new
function to ``functions/text.py`` bumped every text-family entry, and a
docstring fix bumped the whole streaming family — more entries than the
50-slot driver window can absorb in a round.  The normalized closure
responds to exactly the code a query can execute.

This module must stay import-free of the rest of the package: the sidecar
sync script (``scripts/sync_query_hashes.py``) ``exec``s its source inside
a checkout of a PAST commit to compute the hashes the driver actually
verified, so it can only rely on the standard library.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import re
import textwrap
import types

_ADDR_RE = re.compile(r"0x[0-9a-fA-F]{6,}")

_CONST_TYPES = (str, int, float, bool, bytes, tuple, list, dict)


def _package_of(fn) -> str:
    return fn.__module__.split(".")[0]


def _strip_docstrings(node: ast.AST) -> None:
    for child in ast.walk(node):
        if isinstance(
            child,
            (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Module),
        ):
            body = child.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                del body[0]


def _normalized_source(obj) -> str:
    """Source of ``obj`` with comments, docstrings, and formatting
    normalized away (parse -> strip docstrings -> unparse), so
    documentation-only edits do not re-sort an entry as unverified —
    only code that can change results does.  Falls back to the raw
    source when the fragment does not parse standalone."""
    src = inspect.getsource(obj)
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return src
    _strip_docstrings(tree)
    return ast.unparse(tree)


def _code_names(code) -> list[str]:
    """Global names referenced by ``code`` and every nested code object
    (lambdas, comprehensions, inner defs)."""
    names = list(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            names.extend(_code_names(const))
    return names


def _local_imports(f) -> list[tuple[str, list[str]]]:
    """(module, [names]) pairs for ``from X import Y`` statements inside
    ``f``'s body.  A function-LOCAL import binds a local variable, not a
    module global, so the ``__globals__``-based closure walk never sees
    it — found in round 11 when editing ``salted_band_sides`` failed to
    bump the aHash entries that call it through exactly such an import.
    Plain ``import X`` inside a function is not resolved (the package
    convention is ``from ... import name``); module-level imports are
    already covered by the globals walk."""
    try:
        src = textwrap.dedent(inspect.getsource(f))
        tree = ast.parse(src)
    except (OSError, SyntaxError, TypeError):
        return []
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            mod = node.module or ""
            if node.level:  # relative import: anchor at f's package
                parts = (getattr(f, "__module__", "") or "").split(".")
                base = ".".join(parts[: max(len(parts) - node.level, 0)])
                mod = f"{base}.{mod}" if mod else base
            if mod:
                out.append((mod, [a.name for a in node.names]))
    return out


def hash_parts(fn, oracle: str | None = None) -> list[str]:
    """The ordered component list ``query_code_hash`` digests.

    Components, deterministically ordered:
      1. the registered function's own source;
      2. source of every package function/class reachable from it
         (transitive closure over referenced global names, including
         names used inside nested lambdas/comprehensions);
      3. ``repr`` of every package-module constant those functions read
         (skipped if the repr embeds a memory address — such values hash
         unstably and would pin the entry permanently unverified);
      4. the oracle SQL string, if any.
    """
    pkg = _package_of(fn)
    sources: dict[tuple, str] = {}
    consts: dict[tuple, str] = {}
    seen: set[tuple] = set()
    stack = [fn]
    while stack:
        f = stack.pop()
        key = (
            getattr(f, "__module__", "") or "",
            getattr(f, "__qualname__", "") or repr(type(f)),
        )
        if key in seen:
            continue
        seen.add(key)
        try:
            sources[key] = _normalized_source(f)
        except (OSError, TypeError):
            continue
        code = getattr(f, "__code__", None)
        g = getattr(f, "__globals__", None)
        if code is None or g is None:
            continue  # classes: source captured above, methods not walked
        referenced = [(name, g.get(name)) for name in _code_names(code)]
        for mod_name, names in _local_imports(f):
            if mod_name.split(".")[0] != pkg:
                continue
            try:
                import importlib

                imported = importlib.import_module(mod_name)
            except Exception:
                continue
            referenced.extend(
                (n, getattr(imported, n, None)) for n in names
            )
        for name, obj in referenced:
            if obj is None:
                continue
            mod = getattr(obj, "__module__", None)
            if callable(obj):
                if isinstance(mod, str) and mod.split(".")[0] == pkg:
                    stack.append(obj)
            elif isinstance(obj, _CONST_TYPES):
                r = repr(obj)
                if not _ADDR_RE.search(r):
                    consts[(f.__module__, name)] = r

    parts = [_normalized_source(fn)]
    for key in sorted(sources):
        if sources[key] != parts[0]:
            parts.append(sources[key])
    for key in sorted(consts):
        parts.append(f"{key[0]}.{key[1]}={consts[key]}")
    if oracle is not None:
        parts.append(oracle)
    return parts


def query_code_hash(fn, oracle: str | None = None) -> str:
    """sha256 over the code identity of one registered query (the
    ``hash_parts`` components joined with NUL separators)."""
    return hashlib.sha256(
        "\x00".join(hash_parts(fn, oracle)).encode("utf-8")
    ).hexdigest()


def wrapper_hash(fn, oracle: str | None = None) -> str:
    """sha256 over ONLY the registered wrapper's normalized source + its
    oracle SQL.  Lets the rotation distinguish a DIRECT edit to a query
    (its own code or oracle changed — highest re-verification priority)
    from a TRANSITIVE bump (something it calls changed — still
    re-verified, but after the direct edits when one round invalidates
    more entries than the driver window holds)."""
    return hashlib.sha256(
        "\x00".join(
            [_normalized_source(fn)] + ([oracle] if oracle is not None else [])
        ).encode("utf-8")
    ).hexdigest()
