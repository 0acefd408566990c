"""Inline data-quality auditing via ``DataFrame.observe``.

The reference has no QA gates at all — a silent upstream change (column
gone all-null, row count collapse) flows straight into gold.  The naive
fix is a ``df.count()`` / null-count job per check, DOUBLING the passes
over the data; ``observe`` attaches aggregate metrics to the plan itself,
so they are collected DURING the sink action — at 100 TB the audit is
free, riding the write's single scan.

Usage::

    audited, obs = observe_quality(silver, "silver_audit", ["market"])
    write_parquet(audited, path)          # action fires the metrics
    obs.get  # {'n_rows': ..., 'n_null_market': ...}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame, name: str, null_check_cols: list[str] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count metrics to ``df``'s plan.

    Returns the observed frame (use IT for the downstream action) and the
    ``Observation``; read ``observation.get`` only AFTER an action ran.
    Metrics: ``n_rows`` plus ``n_null_<col>`` for each requested column.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_check_cols or []:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        )
    return df.observe(obs, *metrics), obs


def assert_min_rows(
    observation: Observation, minimum: int, name: str = "audit"
) -> None:
    """Post-action gate: fail loudly when the observed row count collapsed
    below ``minimum`` (the cheap canary for a broken upstream feed).

    ``name`` labels the failure message; call sites already know the audit
    name they passed to :func:`observe_quality` (``Observation`` exposes no
    stable public accessor for it, and reaching into the private ``_name``
    would couple us to pyspark internals)."""
    n = observation.get["n_rows"]
    if n < minimum:
        raise ValueError(
            f"audit {name!r}: observed {n} rows < required "
            f"minimum {minimum}"
        )
