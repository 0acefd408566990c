"""Temporal joins Spark lacks natively: as-of join and interval range join.

Both are implemented as compositions of built-in DataFrame operators (the
brief's preferred path for missing operators) — no Python crosses the row
path, and neither ever materializes an all-pairs product:

- :func:`as_of_join` is ONE shuffle on the key: tag both sides, union,
  sort within key partitions, and carry the latest right-side payload
  forward with ``last(..., ignorenulls=True)``.  This is the classic
  union-scan formulation (pandas ``merge_asof`` semantics, Flink temporal
  join semantics) expressed as a window — for a 100 TB fact it is optimal
  in shuffle volume: each side moves once, partitioned by the join key.
- :func:`range_join` buckets time so the interval predicate becomes an
  EQUI-join on (key, bucket): intervals replicate into each bucket they
  overlap, point rows land in exactly one bucket, and the exact range
  predicate refines after the hash join.  A naive ``l.ts BETWEEN r.s AND
  r.e`` join would plan as BroadcastNestedLoopJoin — per-pair evaluation
  that dies at scale (pinned away by ``tests/test_plans.py``).

Reference parity: the reference engine (a pandas/psycopg2 DAG,
``dags/dag_etl_minio_to_postgres.py``) has no temporal joins; these extend
the engine for the events/time-series analytics a training-data pipeline
needs (feature as-of lookups, attribution windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_TS = "_asof_ts"
_BUCKET = "_range_bucket"


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the single right row with
    the largest ``right_ts <= left_ts`` (direction='backward') or smallest
    ``right_ts >= left_ts`` ('forward') within the same key group — left
    rows with no match keep NULL payloads (left-outer semantics, matching
    DuckDB ``ASOF LEFT JOIN`` and pandas ``merge_asof``).

    Right payload columns (everything except key and timestamp) come back
    prefixed ``right_`` only when a name collides with a left column;
    ``right_ts`` itself is exposed as ``matched_ts``.

    Scale: one Exchange total.  Both sides shuffle by the key once; the
    per-key sort is the window sort.  Monster keys (one key with a large
    fraction of all rows) serialize into one task — for those, pre-split
    by coarse time range and union, or fall back to a bucketed range
    join.  If ``tolerance_seconds`` is set, matches further than that
    from the left timestamp are nulled out (pandas ``tolerance=``).

    Ties: a right row at exactly ``left_ts`` matches (inclusive, both
    directions).  Multiple right rows on the SAME (key, ts) make the
    winner order-dependent — either dedupe the right side first, or pass
    ``tie_break=<payload column>``: tied right rows are then ordered by
    that column inside the SAME window sort (ascending, so the MAXIMUM
    deterministically wins) — no extra shuffle, the one-Exchange plan is
    preserved (vs a groupBy pre-aggregation, which adds its own
    Exchange on the (key, ts) pair).
    """
    if direction not in {"backward", "forward"}:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in set(keys) | {right_ts}]
    out_names = {
        c: f"right_{c}" if c in left.columns else c for c in payload
    }

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast("timestamp").alias("matched_ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(out_names[c])
            for c in payload
        ],
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias("matched_ts"),
        *[F.col(c).alias(out_names[c]) for c in payload],
    ).select(*lhs.columns)  # align column order for the union

    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    order_cols = [ts_order, F.col(_SIDE).asc()]
    if tie_break is not None:
        if tie_break not in out_names:
            raise ValueError(
                f"tie_break must be a right payload column, got {tie_break!r}"
            )
        # left rows carry NULL here and are already separated by _SIDE;
        # only tied RIGHT rows reorder, last (= max) wins in last().
        order_cols.append(F.col(out_names[tie_break]).asc())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ["matched_ts", *[out_names[c] for c in payload]]
    # The payload travels as ONE struct: per-column last(ignorenulls)
    # would fill a NULL field of the winning right row from a different
    # (losing or earlier) row, attaching a Frankenstein payload.  The
    # struct is non-NULL for every right row (even when all its fields
    # are NULL), so last() picks whole rows — the winner's NULLs are
    # preserved, matching DuckDB ASOF JOIN / pandas merge_asof.
    pay = F.when(
        F.col(_SIDE) == 0, F.struct(*[F.col(c).alias(c) for c in carried])
    )
    matched = lhs.unionByName(rhs).select(
        *[c for c in lhs.columns if c not in carried],
        F.last(pay, ignorenulls=True).over(w).alias("_asof_pay"),
    )
    result = (
        matched.where(F.col(_SIDE) == 1)
        .select(
            *[c for c in matched.columns if c != "_asof_pay"],
            *[F.col("_asof_pay")[c].alias(c) for c in carried],
        )
        .drop(_SIDE, _TS)
    )

    if tolerance_seconds is not None:
        gap = (
            F.col(left_ts).cast("double") - F.col("matched_ts").cast("double")
            if direction == "backward"
            else F.col("matched_ts").cast("double") - F.col(left_ts).cast("double")
        )
        keep = F.col("matched_ts").isNotNull() & (gap <= F.lit(tolerance_seconds))
        result = result.select(
            *[c for c in result.columns if c not in carried],
            *[F.when(keep, F.col(c)).alias(c) for c in carried],
        )
    return result


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner-join each left point row to every right interval row of the
    same key with ``start <= ts < end``, as an equi-join.

    Mechanics: a point lands in exactly ONE time bucket; an interval
    replicates into every bucket it overlaps (``explode(sequence(...))``
    — one generator expression).  The join key becomes (key..., bucket),
    Catalyst plans an ordinary hash join, and the exact range predicate
    refines the bucket matches.  Because a matching (point, interval)
    pair co-occurs only in the point's own bucket, no dedup is needed.

    Pick ``bucket_seconds`` near the typical interval length: replication
    factor is ``len/bucket + 1`` per interval, while over-wide buckets
    inflate the per-bucket candidate count.  Both column sets survive;
    alias collisions must be resolved by the caller beforehand (raises
    otherwise).
    """
    keys = [on] if isinstance(on, str) else list(on)
    overlap = set(left.columns) & set(right.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"alias collisions {sorted(overlap)}; rename before range_join"
        )
    b = F.lit(float(bucket_seconds))
    lhs = left.withColumn(
        _BUCKET, F.floor(F.col(ts_col).cast("double") / b)
    )
    rhs = right.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("double") / b),
                # end is exclusive: an interval ending exactly on a bucket
                # boundary does not reach into that bucket
                F.floor(
                    (F.col(end_col).cast("double") - F.lit(1e-6)) / b
                ),
            )
        ),
    )
    return (
        lhs.join(rhs, on=keys + [_BUCKET])
        .where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop(_BUCKET)
    )
