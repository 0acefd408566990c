"""End-to-end training-data preparation: the flagship composition of the
LLM-pipeline operator family into ONE lazy Catalyst plan.

funnel: quality filter -> language filter -> exact dedup -> [benchmark
decontamination] -> near-dup removal (EXACT prefix-filtered n-gram
Jaccard join) -> per-source stratified cap.

Why composition matters at 100 TB: each stage is expression-only or a
bounded join, so Catalyst sees the whole funnel at once — the quality and
language predicates run in the SAME scan stage (narrow, codegen'd, pushed
against the parquet read), shrinking the corpus BEFORE any shuffle-bearing
stage (dedup's groupBy, the similarity join, the cap's window) touches it.
A stage-by-stage materialized pipeline would pay a full write+read between
every step; here the only materializations are the similarity join's
internal gram cache and one tracked persist of the funnel's survivor set
(below).

Stage order is deliberate: cheap narrow filters first (largest volume
reduction per cycle), exact dedup before the similarity join (exact dups
are also near-dups — remove them with a hash groupBy instead of the
strictly more expensive set-similarity machinery), the cap last (sampling
before dedup would under-fill capped sources whose sampled rows then get
deduped away).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_etl_minio_to_postgres_spark.functions.dedup import (
    _persist_tracked,
    decontaminate,
    drop_exact_dups,
    ngram_jaccard_pairs,
)
from airflow_etl_minio_to_postgres_spark.functions.text import (
    quality_lang_pred_expr,
    stratified_cap,
)


def prepare_training_corpus(
    docs: DataFrame,
    quality_min: float = 0.35,
    lang: str = "en",
    ngram_n: int = 3,
    jaccard_threshold: float = 0.6,
    cap_per_source: int = 8,
    benchmark: DataFrame | None = None,
    decontam_n: int = 3,
    decontam_min_hits: int = 1,
) -> DataFrame:
    """Run the full prep funnel over a ``documents``-shaped frame
    (``doc_id, source, lang, text``); returns the surviving
    ``doc_id, source, lang`` rows.

    When ``benchmark`` is given (same shape, the held-out eval set), a
    decontamination stage runs between exact dedup and near-dup removal:
    any corpus doc sharing >= ``decontam_min_hits`` distinct word
    ``decontam_n``-grams with the benchmark is dropped.  It sits there
    because the screen is the cheapest shuffle-bearing stage (a broadcast
    semi-join against the benchmark gram vocabulary), so it shrinks the
    corpus BEFORE the strictly more expensive set-similarity join.

    Near-dup policy matches :func:`docs_near_dup_dedup`'s greedy survivor
    rule: for every qualifying pair the LOWER doc_id survives (anti-join
    on the pair list's ``id_b`` side).
    """
    # One-pass admission predicate: the CSE-bound form of
    # quality_score_expr >= min AND lang_id_expr == lang (bit-identical
    # decisions; see quality_lang_pred_expr for why the naive AND
    # evaluates split(lower(trim(text))) ~15x per row in FilterExec).
    filtered = docs.where(
        quality_lang_pred_expr(F.col("text"), quality_min, lang)
    )
    deduped = drop_exact_dups(filtered)
    if benchmark is not None:
        # Persist the exact-dedup survivors before the screen: decontaminate
        # consumes its corpus twice (gram screen + anti-join side), and
        # without a boundary each consumption would re-run the quality/lang
        # expression forest AND drop_exact_dups' own two-sided evaluation —
        # the scan-stage funnel would execute ~4x per downstream reader.
        deduped = _persist_tracked(deduped)
        deduped = decontaminate(
            deduped, benchmark, n=decontam_n, min_hits=decontam_min_hits
        )
    # The funnel's survivor set feeds TWO consumers (the similarity join's
    # gram build and the anti-join that drops near-dup losers).  Persist it
    # so the upstream funnel — scan + quality/lang expressions + exact
    # dedup's groupBy/semi-join (+ the decontamination screen) — runs once
    # per corpus instead of once per consumer (guide §5: reuse x recompute
    # cost).  Tracked: released by dedup.release_caches() like the gram
    # cache itself.
    deduped = _persist_tracked(deduped)
    dup_ids = (
        ngram_jaccard_pairs(
            deduped, n=ngram_n, threshold=jaccard_threshold, unit="word"
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    survivors = deduped.join(dup_ids, on="doc_id", how="left_anti")
    return stratified_cap(
        survivors.select("doc_id", "source", "lang"),
        "source",
        "doc_id",
        cap=cap_per_source,
    )
