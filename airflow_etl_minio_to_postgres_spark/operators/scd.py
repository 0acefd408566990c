"""Slowly-changing-dimension type 2 merge.

The reference maintains dimensions as overwrite-on-conflict upserts keyed
by natural key (``dags/dag_etl_minio_to_postgres.py:328-335`` — the
``id_mapping`` insert-or-lookup), which keeps only the LATEST version of
each dimension row.  SCD2 is the standard warehouse extension: instead of
overwriting, each change CLOSES the current version (sets ``valid_to`` /
``is_current = false``) and opens a new one, so facts can join the
dimension as it was at any point in time.

Spark-first shape: ONE full-outer shuffle join between the open slice of
the dimension and the incoming snapshot decides every row's fate —
unchanged, changed (close + reopen), brand-new, or absent-from-snapshot
(stays open; SCD2 without deletes).  Closed history rows never enter the
join at all: they union straight through, so the shuffle is bounded by
the CURRENT dimension size plus the snapshot, not by accumulated history
— the property that keeps a decade of history mergeable at 100 TB.
Change detection is exact null-safe column comparison (no row-hash, no
collision risk).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCD2_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(
    snapshot: DataFrame,
    as_of: str,
    key_cols: list[str],
    tracked_cols: list[str],
) -> DataFrame:
    """First load: every snapshot row becomes an open version."""
    return snapshot.select(
        *key_cols,
        *tracked_cols,
        F.lit(as_of).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def _any_tracked_differs(tracked_cols: list[str]) -> Column:
    diff = F.lit(False)
    for c in tracked_cols:
        diff = diff | ~F.col(c).eqNullSafe(F.col(f"_s_{c}"))
    return diff


def scd2_merge(
    dim: DataFrame,
    snapshot: DataFrame,
    as_of: str,
    key_cols: list[str],
    tracked_cols: list[str],
) -> DataFrame:
    """Merge ``snapshot`` (key + tracked columns, effective ``as_of``)
    into an SCD2 dimension (key + tracked + ``valid_from``/``valid_to``/
    ``is_current``), returning the new dimension.

    Per key: unchanged rows pass through; changed rows are closed at
    ``as_of`` and a new open version is inserted; unseen keys insert an
    open version; keys missing from the snapshot stay open (no deletes).
    """
    ts = F.lit(as_of).cast("timestamp")
    closed = dim.where(~F.col("is_current"))
    open_ = dim.where(F.col("is_current")).withColumn("_o", F.lit(True))
    snap = snapshot.select(
        *key_cols,
        *[F.col(c).alias(f"_s_{c}") for c in tracked_cols],
        F.lit(True).alias("_s"),
    )
    j = open_.join(snap, on=key_cols, how="full_outer")
    o_present = F.col("_o").eqNullSafe(F.lit(True))
    s_present = F.col("_s").eqNullSafe(F.lit(True))
    changed = o_present & s_present & _any_tracked_differs(tracked_cols)

    # Every joined row resolves to 1-2 output versions in ONE projection
    # (array-of-struct + explode), so the full-outer join executes exactly
    # once — a per-branch union would recompute the shuffle join 3x.
    def _version(tracked: list[Column], vf: Column, vt: Column, cur: Column):
        cols = [F.col(k).alias(k) for k in key_cols]
        cols += [t.alias(c) for t, c in zip(tracked, tracked_cols)]
        return F.struct(
            *cols,
            vf.alias("valid_from"),
            vt.alias("valid_to"),
            cur.alias("is_current"),
        )

    o_tracked = [F.col(c) for c in tracked_cols]
    s_tracked = [F.col(f"_s_{c}") for c in tracked_cols]
    null_ts = F.lit(None).cast("timestamp")
    survivor = _version(
        o_tracked, F.col("valid_from"), F.col("valid_to"), F.col("is_current")
    )
    closed_now = _version(o_tracked, F.col("valid_from"), ts, F.lit(False))
    opened = _version(s_tracked, ts, null_ts, F.lit(True))
    versions = (
        F.when(changed, F.array(closed_now, opened))
        .when(s_present & ~o_present, F.array(opened))
        .otherwise(F.array(survivor))  # open & unchanged, or absent
    )
    merged = j.select(F.explode(versions).alias("_v")).select("_v.*")
    return closed.unionByName(merged)
