"""Key kernel — natural keys, content-hash keys, dedup, surrogate ids,
key->id resolution.

Reference semantics (``dags/dag_etl_minio_to_postgres.py``):

* natural key (``:203-205``): ``'|'``-joined stringified columns.
* hash key (``:209-212``): ``sha256(concat(str(v) for v in cols))`` hex,
  truncated to 16 chars — applied per-row via ``df.apply`` there; here a
  single codegen'd ``substring(sha2(concat(...)))`` expression.
* dedup (``:216-219``): full-row ``drop_duplicates`` on the hash-keyed dims.
* surrogate ids (``SERIAL`` DDL ``:415`` + ``RETURNING id`` capture
  ``:134-136``): Postgres insert-order ids, last-id-wins for duplicate keys.
  Distributed engines have no insert order, so the engine's policy
  (SURVEY.md §7 hard-part 1) is ``row_number() over (order by key)`` on the
  *distinct* keys — dense, deterministic, oracle-reproducible.
* key->id resolution (``:223-228``): driver-side dict ``.map`` — here a
  broadcast equi-join, the scale-safe equivalent.

Scale notes: the surrogate-id window is a global sort over *distinct* keys
only (dimension cardinality, not fact cardinality).  For fact-scale id
assignment use ``zipWithIndex``-free ``row_number`` per partition plus offset
— not needed for the reference surface.  ``resolve_key_to_id`` broadcasts the
id map, mirroring the reference's in-memory dict while staying executor-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_strings(cols: list[str]) -> list:
    return [F.col(c).cast("string") for c in cols]


def natural_key_expr(cols: list[str], delimiter: str = "|"):
    """``concat_ws(delimiter, cast(c as string)...)``.

    Note ``concat_ws`` skips NULLs (both Spark and DuckDB), which replaces the
    pandas ``astype(str)`` quirk of rendering nulls as the literal ``'nan'``
    (SURVEY.md §7 hard-part 2) — cleaned inputs are null-free anyway.
    """
    return F.concat_ws(delimiter, *_as_strings(cols))


def add_natural_key(
    df: DataFrame, cols: list[str], out: str = "natural_key", delimiter: str = "|"
) -> DataFrame:
    return df.withColumn(out, natural_key_expr(cols, delimiter))


def hash_key_expr(cols: list[str], hash_len: int = 16):
    """``substring(sha2(concat(cast(c as string)...), 256), 1, hash_len)``.

    ``concat`` (not ``concat_ws``) matches the reference's ``''.join``
    (``:210-212``); with any NULL input ``concat`` yields NULL, which the
    cleaned pipeline never feeds it.
    """
    return F.substring(F.sha2(F.concat(*_as_strings(cols)), 256), 1, hash_len)


def add_hash_key(
    df: DataFrame, cols: list[str], out: str, hash_len: int = 16
) -> DataFrame:
    return df.withColumn(out, hash_key_expr(cols, hash_len))


def dedup_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact dedup (reference ``:216-219``).  With ``subset``, keeps an
    arbitrary-but-single row per key — on the hash-keyed dims the key is a
    function of the remaining columns, so both forms agree."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def assign_surrogate_ids(
    df: DataFrame, key_col: str, id_col: str = "id"
) -> DataFrame:
    """One dense id per *distinct* key: ``row_number() over (order by key)``.

    Returns ``(key_col, id_col)``.  Deliberately NOT
    ``monotonically_increasing_id`` (non-dense, partition-dependent).  The
    global sort runs over distinct keys only — dimension-sized, fine at scale;
    the reference's equivalent is Postgres ``SERIAL`` + ``RETURNING id``
    (``:134-136``) with last-wins duplicate handling, which distinct-then-
    number makes deterministic instead.
    """
    distinct_keys = df.select(key_col).distinct()
    w = Window.orderBy(F.col(key_col))
    return distinct_keys.withColumn(id_col, F.row_number().over(w))


def resolve_key_to_id(
    child: DataFrame,
    id_map: DataFrame,
    key_col: str,
    id_col: str,
    id_first: bool = True,
) -> DataFrame:
    """Replace ``key_col`` with ``id_col`` via broadcast join
    (reference ``replace_key_with_id`` ``:223-228`` + ``re_order_df``
    ``:232-240``).

    ``id_map`` must be one row per key (the contract of
    :func:`assign_surrogate_ids`); it is dimension-sized, so broadcast is
    always the right physical join — no shuffle of the child.
    """
    joined = child.join(
        F.broadcast(id_map.select(key_col, id_col)), on=key_col, how="left"
    ).drop(key_col)
    if id_first:
        rest = [c for c in joined.columns if c != id_col]
        joined = joined.select(id_col, *rest)
    return joined
