"""Deterministic sketches — scale-path estimators that remain ORACLE-EXACT.

The usual objection to sketch operators in this engine is that an
approximate answer (HyperLogLog, t-digest) cannot be value-matched against
a second engine.  That is only true for RANDOMIZED sketches: a sketch
built from a deterministic hash (sha256) computes the *same* estimate in
any engine, so the estimator itself can be oracle-gated bit-for-bit while
still exercising the real scale trade-off (bounded state instead of exact
distinct sets).

KMV (k-minimum values) distinct counting [Bar-Yossef et al. 2002; the
estimator DataSketches' theta sketch generalizes]: hash every value to a
uniform fraction in [0, 1); keep only the k smallest per group; with
U_(k) the k-th smallest of n uniform draws, E[U_(k)] ~ k/(n+1), so
``(k-1)/U_(k)`` is an (unbiased) estimate of n.  Groups with fewer than k
distinct values report exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 13 hex chars = 52 bits: the hash fraction and its divisor (2^52) are both
# EXACTLY representable in a double, so no engine-dependent rounding exists
# anywhere in the estimate.
_HEX_CHARS = 13
_DENOM = float(16**_HEX_CHARS)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-group approximate distinct count via a k-minimum-values sketch.

    Returns (group, n_tracked, est_distinct): ``n_tracked`` = how many of
    the k slots filled; ``est_distinct`` = exact count when the group has
    fewer than k distinct values, else ``(k-1)/U_(k)``.

    Scale shape: one distinct (map-side partially aggregated — the
    shuffle carries (group, value) pairs, never rows), then one
    group-keyed window to keep the k minima; per-group state is k
    fractions regardless of cardinality — the entire point vs an exact
    ``count(DISTINCT)`` whose per-group state grows with the data.  At
    extreme group counts the window sort is the standard per-group
    top-k; a custom Aggregator keeping a bounded heap map-side would
    drop the second shuffle (noted, not needed at test scale).

    Determinism: sha256 is the hash, so the k minima — and therefore the
    estimate — are identical on any engine and any partition layout;
    the DuckDB oracle reproduces the estimator end-to-end.

    NULL contract: NULL values are excluded from the sketch (an
    explicit ``isNotNull`` filter before hashing).  Without it a NULL
    hashes to a NULL fraction, which Spark's window sorts FIRST while
    SQL engines default NULLS LAST — a slot would burn
    engine-dependently.  This matches ``count(DISTINCT x)`` SQL
    semantics, which also ignores NULLs; a group whose values are ALL
    NULL therefore produces no output row, same as ``GROUP BY`` over an
    inner ``WHERE x IS NOT NULL``.
    """
    from pyspark.sql import Window

    frac = (
        F.conv(
            F.substring(
                F.sha2(F.col(value_col).cast("string"), 256), 1, _HEX_CHARS
            ),
            16,
            10,
        ).cast("double")
        / F.lit(_DENOM)
    )
    dv = (
        df.select(group_col, value_col)
        .where(F.col(value_col).isNotNull())
        .distinct()
        .select(F.col(group_col), frac.alias("_frac"))
    )
    w = Window.partitionBy(group_col).orderBy("_frac")
    topk = dv.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    return (
        topk.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_tracked"),
            F.max("_frac").alias("_kth"),
        )
        .select(
            group_col,
            "n_tracked",
            F.when(
                F.col("n_tracked") < k, F.col("n_tracked").cast("double")
            )
            .otherwise(F.lit(float(k - 1)) / F.col("_kth"))
            .alias("est_distinct"),
        )
    )
