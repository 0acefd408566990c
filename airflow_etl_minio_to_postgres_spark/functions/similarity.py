"""Similarity search over embedding columns — brute-force cosine top-k and
a sign-LSH bucketed ANN variant.

Scale design:

* Brute force is the *baseline*: one broadcast of the query point, one
  narrow map computing cosine, one top-k (``orderBy + limit`` -> Spark's
  TakeOrdered, which keeps only k rows per partition then k at the driver).
  Linear in corpus size but embarrassingly parallel — correct reference
  semantics for verifying approximate paths.
* Sign-LSH ANN is the scale path: each vector gets a small bucket key from
  the signs of its leading components (a fixed, data-independent set of
  axis-aligned hyperplanes — deterministic, so the oracle reproduces it).
  Search touches ONE bucket: a partition-pruned fraction of the corpus.
  Production IVF would learn centroids instead; the plumbing (bucket
  assignment -> bucket-local top-k) is identical.

All arithmetic is double-precision: float32 embeddings are cast up before
any multiply, matching DuckDB's behavior on ``FLOAT[]`` lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    """``try_divide``, not ``/``: under Spark 4's default ANSI mode a
    single zero-norm embedding (an all-zeros vector from a failed
    upstream encode) would raise DIVIDE_BY_ZERO and kill the whole job —
    at 100 TB a dirty row must degrade to NULL, never fail the pipeline
    (same policy as the try_cast in events_json_props).  DuckDB's ``/``
    returns NULL on zero divisors already, so the oracle agrees."""
    return F.try_divide(dot_expr(a, b), norm_expr(a) * norm_expr(b))


def topk_cosine(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors of ``query_id`` by cosine similarity.

    The query point is a one-row broadcast — no shuffle of the corpus; the
    top-k is a TakeOrdered, not a global sort materialization.  The query
    norm rides the broadcast (computed once, not re-folded per corpus
    row — the ``ivf_knn_join`` norm-precompute pattern; bit-identical:
    same sqrt-then-multiply, same fold order).
    """
    q = df.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_query_vec"),
        norm_expr(F.col(vec_col)).alias("_qnorm"),
    )
    return (
        df.where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.try_divide(
                dot_expr(F.col(vec_col), F.col("_query_vec")),
                norm_expr(F.col(vec_col)) * F.col("_qnorm"),
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def sign_bucket_expr(vec: Column, n_bits: int = 8) -> Column:
    """Deterministic LSH bucket: concatenated sign bits of the first
    ``n_bits`` components (axis-aligned hyperplanes)."""
    bits = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)


def add_sign_bucket(
    df: DataFrame, vec_col: str = "embedding", n_bits: int = 8
) -> DataFrame:
    return df.withColumn("bucket", sign_bucket_expr(F.col(vec_col), n_bits))


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "cid",
    centroid_vec: str = "cvec",
    nprobe: int = 1,
    rank_col: str | None = None,
) -> DataFrame:
    """IVF cell assignment: each vector joins its ``nprobe`` nearest
    centroids (max cosine, centroid id as the deterministic tie-break).

    Shape at scale: corpus x n_cells narrow map against BROADCAST centroids
    + a per-vector top-nprobe window — no corpus shuffle beyond the window's
    own (vector-id-partitioned, perfectly balanced).  Returns (id, cid)
    with up to ``nprobe`` rows per id; ``nprobe`` defaults to 1 (one
    row per id, the classic assignment).  nprobe > 1 is the standard
    mitigation for the cell-boundary recall edge: a vector near a
    boundary lands in BOTH flanking cells, so a near-dup pair split
    across the boundary still shares a cell downstream.  ``rank_col``
    additionally exposes the 1-based probe rank (1 = primary cell) for
    callers that need to distinguish the nearest cell from the extra
    probes.
    """
    from pyspark.sql import Window

    sims = df.select(id_col, vec_col).crossJoin(
        F.broadcast(centroids.select(centroid_id, centroid_vec))
    ).select(
        id_col,
        centroid_id,
        cosine_expr(F.col(vec_col), F.col(centroid_vec)).alias("_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_sim").desc(), F.col(centroid_id))
    ranked = sims.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= F.lit(int(nprobe))
    )
    cols = [id_col, centroid_id]
    if rank_col is not None:
        ranked = ranked.withColumn(rank_col, F.col("_rn").cast("long"))
        cols.append(rank_col)
    return ranked.select(*cols)


def ivf_topk(
    df: DataFrame,
    query_id: int,
    k: int = 5,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style ANN: partition the corpus into cells around centroids,
    search the query's ``nprobe`` nearest cells (classic IVF serving:
    the CORPUS is partitioned once — one cell per vector — and recall
    is tuned per query by probing more cells).

    Default centroid "training" is a deterministic stub — the first
    ``n_cells`` corpus vectors by id; pass
    ``centroids=kmeans_centroids(df, ...)`` for trained cells (same
    (cid, cvec) contract, identical serving plan).  At scale the corpus
    is written partitioned by cell, making this a partition-pruned scan
    (``nprobe`` partitions) + tiny top-k.
    """
    if centroids is None:
        centroids = df.where(F.col(id_col) < n_cells).select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
        )
    else:
        centroids = centroids.select("cid", "cvec")
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    corpus = df.join(assigned, on=id_col)
    qrow = df.where(F.col(id_col) == query_id)
    probes = ivf_assign(
        qrow, centroids, id_col, vec_col, nprobe=nprobe
    ).select("cid")
    # query norm rides the one-row broadcast — computed once, not
    # re-folded per probed-corpus row (bit-identical hoist, the
    # ivf_knn_join precompute pattern)
    q = qrow.select(
        F.col(vec_col).alias("_query_vec"),
        norm_expr(F.col(vec_col)).alias("_qnorm"),
    )
    return (
        corpus.join(F.broadcast(probes), "cid", "semi")
        .where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.try_divide(
                dot_expr(F.col(vec_col), F.col("_query_vec")),
                norm_expr(F.col(vec_col)) * F.col("_qnorm"),
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def write_ivf_index(
    df: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF serving layout the :func:`ivf_topk`
    docstring prescribes: the corpus written as parquet PARTITIONED BY
    cell id, so a query's probe set becomes a partition-pruned scan —
    at 100 TB the difference between reading ``nprobe`` directories
    and reading everything.  One assignment pass (broadcast centroids,
    per-vector top-1 window), one partitioned write; re-running
    overwrites (idempotent index rebuild)."""
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    (
        df.join(assigned, id_col)
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(path)
    )


def ivf_topk_indexed(
    spark: SparkSession,
    path: str,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Serve a cosine top-k from a :func:`write_ivf_index` layout: the
    query's ``nprobe`` nearest cells are chosen DRIVER-SIDE against the
    (metadata-sized) centroid table, and the scan carries
    ``cid IN (probes)`` — Spark prunes to exactly those partition
    directories (visible as PartitionFilters in the plan; pinned in
    tests), so the corpus read is proportional to the probed cells,
    not the index.  Tie-break (max cosine, then smallest cid) matches
    :func:`ivf_assign` exactly, so results are identical to running
    :func:`ivf_topk` over the unindexed corpus."""
    import math

    q = [float(x) for x in query_vec]
    qn = math.sqrt(sum(x * x for x in q))
    scored = []
    for row in centroids.select("cid", "cvec").collect():
        cv = [float(x) for x in row["cvec"]]
        num = sum(a * b for a, b in zip(q, cv))
        den = qn * math.sqrt(sum(x * x for x in cv))
        sim = (num / den) if den else float("-inf")
        scored.append((sim, -int(row["cid"])))
    probes = [-nc for _, nc in sorted(scored, reverse=True)[: int(nprobe)]]
    from airflow_etl_minio_to_postgres_spark.sources.manifest import (
        resolve_data_root,
    )

    corpus = spark.read.parquet(resolve_data_root(spark, path)).where(
        F.col("cid").isin(probes)
    )
    if exclude_id is not None:
        corpus = corpus.where(F.col(id_col) != exclude_id)
    qcol = F.array(*[F.lit(x) for x in q])
    # the query norm is already computed driver-side for probe ranking
    # with the engine's exact fold order (sequential x*x adds from 0,
    # then sqrt — Python and JVM binary64 agree bit-for-bit), so embed
    # it as a literal instead of re-folding the query array per corpus
    # row (the ivf_knn_join norm-precompute pattern, linear-path form)
    return (
        corpus.select(
            id_col,
            F.try_divide(
                dot_expr(F.col(vec_col), qcol),
                norm_expr(F.col(vec_col)) * F.lit(qn),
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_topk_batch(
    spark: SparkSession,
    path: str,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    exclude_self: bool = False,
) -> DataFrame:
    """Serve cosine top-k for a TABLE of queries from a
    :func:`write_ivf_index` layout — the realistic eval/retrieval
    workload (:func:`ivf_topk_indexed` is its single-vector sibling
    for point lookups).

    Shape at scale: probe cells are assigned ENGINE-side
    (:func:`ivf_assign` over the query table — no per-query driver
    round-trips), the UNION of all probe cells is collected driver-side
    (bounded by n_cells, metadata-sized — the same probe-selection
    collect as the single-query path) and drives ONE partition-pruned
    corpus scan shared by every query; the (query id, probe cell,
    query vector) side is then broadcast into the pruned corpus, so
    each corpus row is scored only against the queries probing ITS
    cell, and a per-query top-k window finishes.  The broadcast
    presumes an eval-sized query set (thousands); a corpus-scale query
    table would co-partition both sides by cell id instead of
    broadcasting — a different operator (a cell-bucketed join), not a
    bigger broadcast.

    Consistency contract (pinned in tests): per-query results are
    bit-identical to :func:`ivf_topk_indexed` run one query at a time
    with the same (k, nprobe) — both sides rank probe cells by
    (max cosine, then smallest cid) and results by (cosine desc, then
    smallest id), and both compute the same sequential double fold
    over the same array order.  ``exclude_self`` drops the corpus row
    whose id equals the query id (queries drawn from the corpus).

    Returns (query_id_col, id_col, cosine), k rows per query, ordered
    within each query by (cosine desc, id).
    """
    probes = ivf_assign(
        queries,
        centroids,
        query_id_col,
        query_vec_col,
        nprobe=nprobe,
    )
    cells = sorted(
        r[0] for r in probes.select("cid").distinct().collect()
    )
    # per-side norm precompute (the ivf_knn_join pattern, where it was
    # measured 3.6x on the quadratic term): each corpus row is scored
    # against EVERY query probing its cell, so folding the corpus norm
    # once per row — and each query norm once into the broadcast —
    # replaces two O(dim) folds per (row, query) pair with one dot
    # product; bit-identical (same sqrt-then-multiply, same fold order)
    from airflow_etl_minio_to_postgres_spark.sources.manifest import (
        resolve_data_root,
    )

    corpus = (
        spark.read.parquet(resolve_data_root(spark, path))
        .where(F.col("cid").isin(cells))
        .withColumn("_cnorm", norm_expr(F.col(vec_col)))
    )
    qside = probes.join(
        queries.select(query_id_col, query_vec_col), query_id_col
    ).withColumn("_qnorm", norm_expr(F.col(query_vec_col)))
    scored = corpus.join(F.broadcast(qside), "cid").select(
        F.col(query_id_col),
        F.col(id_col),
        F.try_divide(
            dot_expr(F.col(vec_col), F.col(query_vec_col)),
            F.col("_cnorm") * F.col("_qnorm"),
        ).alias("cosine"),
    )
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col(query_id_col))
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.lit(int(k)))
        .drop("_rn")
        .orderBy(query_id_col, F.col("cosine").desc(), id_col)
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic
    complement of ``functions/dedup.py decontaminate`` exactly as
    :func:`semantic_dedup` complements the lexical dedup family: drop
    every corpus vector whose cosine to ANY benchmark vector reaches
    ``threshold``.  Paraphrased eval questions share no n-grams with
    the benchmark text, but their embeddings sit at cosine ~1 — the
    leak the gram screen cannot see.

    EXACT by design, not LSH-bucketed: a missed leak silently inflates
    eval scores, so recall is the contract here (same reasoning as the
    gram screen's exact containment).  Scale shape mirrors the lexical
    twin: the benchmark is BROADCAST (eval suites are small by nature
    — thousands of rows against a corpus of billions), flag discovery
    is a narrow corpus x |benchmark| fan-out with the threshold filter
    applied before anything shuffles, the flagged-id set is tiny, and
    AQE converts the final anti-join to a broadcast — the corpus is
    never shuffled end-to-end.  A forced broadcast of the flagged side
    is deliberately NOT used (the lexical twin's rationale: an
    adversarially contaminated corpus could flag a large fraction)."""
    flagged = (
        corpus.select(id_col, vec_col)
        .crossJoin(
            F.broadcast(benchmark.select(F.col(vec_col).alias("_bv")))
        )
        .where(cosine_expr(F.col(vec_col), F.col("_bv")) >= F.lit(threshold))
        .select(id_col)
        .distinct()
    )
    return corpus.join(flagged, id_col, "left_anti")


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes: NumPy PCG64 with a fixed seed,
    components rounded to 6 decimals so the SAME float literals embed
    byte-for-byte into both the Spark expression and the DuckDB oracle SQL
    — identical IEEE doubles on both sides, so bucket assignment can never
    drift between engine and oracle."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [
        [round(float(x), 6) for x in rng.standard_normal(dim)]
        for _ in range(n_planes)
    ]


def _projection_sql(vec_col: str, weights: list[float]) -> str:
    """Literal dot product as ``aggregate(zip_with(...))`` SQL text.

    Why THIS form and not an inlined ``w1*v[1] + w2*v[2] + ...`` chain:
    16 planes x 64 dims inlines to a ~4096-node expression that (a) costs
    seconds of py4j round-trips just to BUILD as Column objects, (b) fails
    Janino codegen outright (interpreted fallback after a long compile
    attempt), and (c) if any interpreted HOF sits upstream, projection
    collapse re-inlines it into every element access — the same trap as
    the round-2 minhash rewrite.  The HOF lambdas here are tiny, parse
    JVM-side in one call, and evaluate the input array once per plane.

    Determinism (the oracle contract): ``aggregate`` folds strictly left to
    right from 0.0, so the float sum order is fixed — the DuckDB oracle
    writes the identical left-associated chain and both engines produce
    bit-for-bit equal IEEE doubles.
    """
    ws = ", ".join(f"{w!r}D" for w in weights)
    return (
        f"aggregate(zip_with({vec_col}, array({ws}), "
        "(x, y) -> CAST(x AS DOUBLE) * y), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def hyperplane_band_keys_expr(
    vec_col: str, planes: list[list[float]], n_bands: int
) -> Column:
    """Array of ``n_bands`` LSH band keys; each key is the band index plus
    the sign bits of ``len(planes)/n_bands`` random-hyperplane projections.
    Multi-band = minhash-style OR-amplification: near-identical vectors
    (tiny angle) agree on ALL bits of at least one band almost surely.

    ``vec_col`` is a column NAME (the keys are built as one SQL string —
    see :func:`_projection_sql` for why)."""
    per_band = len(planes) // n_bands
    keys = []
    for band in range(n_bands):
        bits = ", ".join(
            f"CASE WHEN ({_projection_sql(vec_col, p)}) >= 0 "
            "THEN '1' ELSE '0' END"
            for p in planes[band * per_band : (band + 1) * per_band]
        )
        keys.append(f"concat('{band}|', {bits})")
    return F.expr("array(" + ", ".join(keys) + ")")


def ivf_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    exclude_self: bool = False,
) -> DataFrame:
    """Cosine top-k for a CORPUS-SCALE query table — the cell-bucketed
    join the :func:`ivf_topk_batch` docstring prescribes when the query
    side outgrows a broadcast (e.g. joining two embedding corpora, or
    serving a full eval suite against a training corpus).

    Shape at scale: both sides take ONE narrow assignment pass against
    the broadcast centroid table (corpus -> its primary cell, queries ->
    their ``nprobe`` nearest cells), then meet in a SHUFFLE equi-join
    keyed on cell id — each side exchanges once on ``cid``, scoring is
    confined within cells (the IVF bound: candidate volume is
    sum over cells of |queries probing c| x |corpus in c|, never
    |queries| x |corpus|), and a per-query top-k window finishes.  No
    broadcast of either data side; only the metadata-sized centroid
    table ships.  Skewed (hot) cells are a centroid-quality problem —
    train more cells (``kmeans_centroids``) rather than salting here,
    because splitting a cell also shrinks every query's candidate set.

    Consistency contract (pinned in tests): identical results to
    :func:`ivf_topk_batch` over a :func:`write_ivf_index` of the same
    corpus with the same (k, nprobe) — same assignment, same tie-breaks
    ((max cosine, min cid) for probes; (cosine desc, min id) for
    results) — and with ``nprobe == n_cells`` it provably recovers
    per-query brute force.  Returns (query_id_col, id_col, cosine),
    up to k rows per query, ordered within each query.
    """
    corpus_cells = ivf_assign(corpus, centroids, id_col, vec_col)
    probe_cells = ivf_assign(
        queries, centroids, query_id_col, query_vec_col, nprobe=nprobe
    )
    # Norms are per-VECTOR, so compute them once on each side before the
    # pair join — inside cosine_expr they would be re-derived per
    # CANDIDATE PAIR (3x the higher-order-function arithmetic on the
    # quadratic term; at nprobe=n_cells that is 3x the whole brute-force
    # scan).  dot/(na*nb) via try_divide keeps the exact expression
    # shape of cosine_expr, so results are bit-identical.
    qside = probe_cells.join(
        queries.select(
            query_id_col,
            F.col(query_vec_col),
            norm_expr(F.col(query_vec_col)).alias("_qnorm"),
        ),
        query_id_col,
    )
    scored = (
        corpus.select(
            id_col,
            F.col(vec_col),
            norm_expr(F.col(vec_col)).alias("_cnorm"),
        )
        .join(corpus_cells, id_col)
        .join(qside, "cid")
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.try_divide(
                dot_expr(F.col(vec_col), F.col(query_vec_col)),
                F.col("_cnorm") * F.col("_qnorm"),
            ).alias("cosine"),
        )
    )
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col(query_id_col))
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.lit(int(k)))
        .drop("_rn")
        .orderBy(query_id_col, F.col("cosine").desc(), id_col)
    )


def rrf_fuse(
    results: list[tuple[DataFrame, str]],
    k: int = 10,
    k_rrf: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked retrieval lists — the hybrid
    step production retrieval runs after its dense (``ivf_topk_*`` /
    ``topk_cosine``) and sparse (``bm25_topk``) paths: fused score
    ``Σ_lists 1/(k_rrf + rank)``, robust to incomparable score scales
    because only RANKS enter (the standard k_rrf = 60).

    Each input is ``(result_frame, score_col)`` — a ranked list keyed
    by ``id_col``, higher score better; ranks are assigned by a
    (score desc, id) row_number so ties are deterministic, and an id
    missing from a list contributes 0 for it.  Scale shape: inputs are
    top-k RESULT tables (result-sized, never corpus-sized — the
    ann_recall_at_k posture), so the rank windows and the chain of
    full-outer joins on the id touch ≤ Σ k_i rows; the fused sum is a
    fixed left-to-right fold over explicit coalesces (reproduce the
    same list order in any oracle).  Returns the top-``k`` rows
    ``(id_col, rrf)`` by (fused score desc, id)."""
    if not results:
        raise ValueError("rrf_fuse: results must be non-empty")
    from pyspark.sql import Window

    fused = None
    rank_cols = []
    for i, (r, score_col) in enumerate(results):
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
        ranked = r.select(
            id_col,
            (
                F.lit(1.0)
                / (F.lit(int(k_rrf)) + F.row_number().over(w))
            ).alias(f"_rrf{i}"),
        )
        rank_cols.append(f"_rrf{i}")
        fused = (
            ranked
            if fused is None
            else fused.join(ranked, id_col, "full")
        )
    expr = F.coalesce(F.col(rank_cols[0]), F.lit(0.0))
    for c in rank_cols[1:]:
        expr = expr + F.coalesce(F.col(c), F.lit(0.0))
    return (
        fused.select(id_col, expr.alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col(id_col))
        .limit(int(k))
    )


def rrf_fuse_grouped(
    results: list[tuple[DataFrame, str]],
    k: int = 10,
    k_rrf: int = 60,
    id_col: str = "doc_id",
    query_id_col: str = "qid",
) -> DataFrame:
    """Per-query reciprocal-rank fusion — :func:`rrf_fuse` for BATCHED
    retrieval: each input is a multi-query result table
    ``(query_id_col, id_col, score_col)`` (the shape
    ``ivf_topk_batch`` / ``text.bm25_topk_batch`` return), and fusion
    runs independently inside every query group.  This is the hybrid
    step of a batched retrieval pipeline and the fused side of the
    hybrid health eval (fused served lists vs fused brute-force truth
    through :func:`ann_recall_at_k`).

    Semantics per query group are exactly :func:`rrf_fuse`: rank by
    (score desc, id) row_number within the (list, query) pair, fused
    score ``Σ_lists 1/(k_rrf + rank)``, an id absent from a list
    contributes 0 for it, output cut to the top ``k`` per query by
    (fused desc, id).  Scale shape: inputs are top-k result tables
    (≤ Σ k_i rows PER QUERY, result-sized, never corpus-sized), the
    rank windows partition on the query id (no global single-partition
    window — the batched form stays parallel where the single-query
    form cannot), and the full-outer join chain keys on
    (query, id)."""
    if not results:
        raise ValueError("rrf_fuse_grouped: results must be non-empty")
    from pyspark.sql import Window

    fused = None
    rank_cols = []
    for i, (r, score_col) in enumerate(results):
        w = Window.partitionBy(query_id_col).orderBy(
            F.col(score_col).desc(), F.col(id_col)
        )
        ranked = r.select(
            query_id_col,
            id_col,
            (
                F.lit(1.0)
                / (F.lit(int(k_rrf)) + F.row_number().over(w))
            ).alias(f"_rrf{i}"),
        )
        rank_cols.append(f"_rrf{i}")
        fused = (
            ranked
            if fused is None
            else fused.join(ranked, [query_id_col, id_col], "full")
        )
    expr = F.coalesce(F.col(rank_cols[0]), F.lit(0.0))
    for c in rank_cols[1:]:
        expr = expr + F.coalesce(F.col(c), F.lit(0.0))
    scored = fused.select(query_id_col, id_col, expr.alias("rrf"))
    wk = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(wk))
        .where(F.col("_rn") <= int(k))
        .drop("_rn")
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    query_id_col: str = "qid",
    id_col: str = "doc_id",
    score_col: str = "score",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversification of retrieval results
    (Carbonell & Goldstein): greedily re-rank each query's candidate
    list by ``lam * rel - (1 - lam) * max_{s in selected} cos(d, s)``
    — the standard post-retrieval step that stops a RAG top-k from
    being five paraphrases of the same passage.  ``candidates`` is a
    per-query result table ``(query_id_col, id_col, score_col,
    vec_col)`` — the shape the serving operators return joined back to
    their vectors; ``lam = 1`` reproduces pure relevance order.

    Shape at scale: inputs are top-N RESULT tables (≤ N rows per
    query — result-sized, never corpus-sized), and greedy selection
    has a loop-carried dependency (step i needs the i-1 picks) that a
    relational form could only fake with k chained self-joins — so
    this is a deliberate Arrow crossing: ONE ``applyInPandas`` per
    query group, O(k·N) numpy inside the batch, plan-pinned like the
    package's other five crossings.  Determinism: candidates are
    canonically ordered (score desc, id) before the loop and every
    pick's ties resolve to the first candidate in that order (higher
    relevance, then smaller id), duplicate (query, id) rows are
    dropped first, and a zero-norm vector similarity counts as 0.0
    (the try_divide posture).  Returns (query_id_col, id_col,
    score_col, mmr, rank) with rank 1..k per query."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    in_schema = candidates.schema
    out_schema = T.StructType(
        [
            in_schema[query_id_col],
            in_schema[id_col],
            in_schema[score_col],
            T.StructField("mmr", T.DoubleType()),
            T.StructField("rank", T.LongType()),
        ]
    )
    kk, ll = int(k), float(lam)

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = (
            # sort BEFORE dedup so the kept duplicate is deterministic
            # (the highest-scored row per id), whatever the input order
            pdf.sort_values([score_col, id_col], ascending=[False, True])
            .drop_duplicates(subset=[id_col], keep="first")
            .reset_index(drop=True)
        )
        vecs = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        norms = np.linalg.norm(vecs, axis=1)
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        picked: list[int] = []
        picked_mmr: list[float] = []
        max_sim = np.zeros(n)
        avail = np.ones(n, dtype=bool)
        while avail.any() and len(picked) < kk:
            mmr = np.where(avail, ll * rel - (1.0 - ll) * max_sim, -np.inf)
            best = int(np.argmax(mmr))  # first max in canonical order
            picked.append(best)
            picked_mmr.append(float(mmr[best]))
            avail[best] = False
            denom = norms * norms[best]
            with np.errstate(invalid="ignore", divide="ignore"):
                sim = np.where(denom > 0.0, vecs @ vecs[best] / denom, 0.0)
            max_sim = np.maximum(max_sim, sim)
        out = pdf.iloc[picked][[query_id_col, id_col, score_col]].copy()
        out["mmr"] = picked_mmr
        out["rank"] = np.arange(1, len(picked) + 1, dtype=np.int64)
        return out

    return (
        candidates.select(query_id_col, id_col, score_col, vec_col)
        .groupBy(query_id_col)
        .applyInPandas(_mmr, schema=out_schema)
    )


def ann_recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    query_id_col: str = "qid",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query recall@k of an approximate ANN result against exact
    ground truth: ``|approx ∩ exact| / least(|exact|, k)`` — the eval
    metric that closes the ANN family's loop ("measure, don't guess"
    applied to retrieval quality: nprobe/cell-count tuning is a recall
    curve, not a feeling).  Both inputs are (query_id, id) result
    tables — typically :func:`ivf_knn_join` at the serving nprobe vs
    the same call at ``nprobe = n_cells`` (provably brute force), so
    ground truth needs no separate implementation.

    Scale shape: both sides are top-k results (≤ k rows per query —
    result-sized, never corpus-sized); ONE left join on (query, id) and
    one map-side-combined aggregate, so each input plan executes
    exactly once — ground truth is usually an expensive unpersisted
    brute-force plan, and a totals/hits two-branch shape would execute
    it twice (measured 15.3 s -> 7 s on the registry entry).  The
    division is small-integer / small-integer, bit-identical on any
    engine.  Queries with no approx rows (empty probe cells) correctly
    report 0.0 via the left join, not a dropped row.  Both sides are
    deduped on (query, id) first: a malformed approx table with
    duplicate result rows would otherwise fan out the left join and
    inflate both ``_total`` and ``_hits`` — recall stays a set metric
    regardless of input hygiene (dedup of a ≤ k-rows-per-query result
    table is result-sized, free at any corpus scale)."""
    a = (
        approx.select(query_id_col, id_col)
        .dropDuplicates([query_id_col, id_col])
        .withColumn("_hit", F.lit(1))
    )
    e = exact.select(query_id_col, id_col).dropDuplicates(
        [query_id_col, id_col]
    )
    per_q = (
        e.join(a, [query_id_col, id_col], "left")
        .groupBy(query_id_col)
        .agg(
            F.count(F.lit(1)).alias("_total"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("_hits"),
        )
    )
    return per_q.select(
        query_id_col,
        (
            F.col("_hits").cast("double")
            / F.least(F.col("_total"), F.lit(int(k))).cast("double")
        ).alias("recall"),
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_bands: int = 4,
    bits_per_band: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate detection, banded-hyperplane-LSH.

    Candidates come from an equi-join on any of ``n_bands`` band keys built
    from seeded RANDOM hyperplane sign bits — not axis-aligned leading
    components, which on real (anisotropic) embeddings collapse into one
    hot bucket and degrade to the n^2 all-pairs scan this operator exists
    to avoid (r2 VERDICT #5).  Random directions make each bit split the
    corpus near 50/50 regardless of how the embedding distribution is
    skewed, so per-band bucket sizes concentrate around corpus/2^bits;
    banding then recovers the recall a single longer signature would lose.
    Only candidates pay the exact cosine.  Returns (id_a, id_b, cosine)
    with ``id_a < id_b`` and ``cosine >= threshold``.
    """
    from airflow_etl_minio_to_postgres_spark.functions.dedup import (
        _persist_tracked,
    )

    planes = hyperplanes(dim, n_bands * bits_per_band, seed)
    # Cache barrier, twice over: the corpus feeds three plan branches (band
    # keys + both sides of the verification join), and any interpreted HOF
    # upstream (e.g. a float->double transform) would otherwise be inlined
    # by projection collapse into every band-key evaluation.
    df = _persist_tracked(df.select(id_col, vec_col))
    b = df.select(
        F.col(id_col),
        F.explode(
            hyperplane_band_keys_expr(vec_col, planes, n_bands)
        ).alias("band_key"),
    )
    pairs = (
        b.select(F.col(id_col).alias("id_a"), "band_key")
        .join(b.select(F.col(id_col).alias("id_b"), "band_key"), on="band_key")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = df
    return (
        pairs.join(
            vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")),
            "id_a",
        )
        .join(
            vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")),
            "id_b",
        )
        .withColumn("cosine", cosine_expr(F.col("v_a"), F.col("v_b")))
        .where(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )


def knn_join(
    df: DataFrame,
    dim: int,
    k: int = 3,
    n_bands: int = 4,
    bits_per_band: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-nearest-neighbor SELF-join: for EVERY vector, its top
    ``k`` neighbors by cosine among LSH-band candidates.

    This is the all-rows variant of :func:`topk_cosine` (one query point)
    — the shape a training pipeline needs for corpus-wide retrieval
    augmentation or semantic-cluster labeling.  Candidate pairs come from
    the same seeded random-hyperplane band join as
    :func:`embedding_near_dup_pairs`, kept in BOTH directions (k-NN is
    asymmetric: b in knn(a) says nothing about a in knn(b)); each side
    then ranks its candidates with one window partitioned by the query id
    — a single shuffle keyed on a high-cardinality column, never a global
    sort.  Complexity O(sum of per-band bucket^2), bounded by the random
    hyperplanes keeping buckets near corpus/2^bits.

    Recall contract (approximate by design): a true neighbor sharing no
    band with its query is missed; near-identical vectors collide on some
    band almost surely (see :func:`embedding_near_dup_pairs`).  Returns
    (``id_col``, neighbor_id, cosine, rank) with rank 1..k, cosine-desc,
    neighbor id as the deterministic tie-break.
    """
    from pyspark.sql import Window

    from airflow_etl_minio_to_postgres_spark.functions.dedup import (
        _persist_tracked,
    )

    planes = hyperplanes(dim, n_bands * bits_per_band, seed)
    base = _persist_tracked(df.select(id_col, vec_col))
    b = base.select(
        F.col(id_col),
        F.explode(
            hyperplane_band_keys_expr(vec_col, planes, n_bands)
        ).alias("band_key"),
    )
    cand = (
        b.select(F.col(id_col).alias("_qid"), "band_key")
        .join(b.select(F.col(id_col).alias("_nid"), "band_key"), on="band_key")
        .where(F.col("_qid") != F.col("_nid"))
        .select("_qid", "_nid")
        .dropDuplicates(["_qid", "_nid"])
    )
    scored = (
        cand.join(
            base.select(F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv")),
            "_qid",
        )
        .join(
            base.select(F.col(id_col).alias("_nid"), F.col(vec_col).alias("_nv")),
            "_nid",
        )
        .select(
            "_qid", "_nid", cosine_expr(F.col("_qv"), F.col("_nv")).alias("cosine")
        )
    )
    w = Window.partitionBy("_qid").orderBy(F.col("cosine").desc(), F.col("_nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(id_col),
            F.col("_nid").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def ann_topk_sign_lsh(
    df: DataFrame,
    query_id: int,
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only the query's sign bucket (~corpus /
    2^n_bits candidates).  At scale the corpus is written partitioned by
    bucket, so this is a partition-pruned scan + tiny top-k."""
    bucketed = add_sign_bucket(df, vec_col, n_bits)
    q = bucketed.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_query_vec"), F.col("bucket").alias("_qb")
    )
    return (
        bucketed.crossJoin(F.broadcast(q))
        .where((F.col("bucket") == F.col("_qb")) & (F.col(id_col) != query_id))
        .select(
            id_col,
            cosine_expr(F.col(vec_col), F.col("_query_vec")).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _nearest_centroid_expr(
    vec: Column, centroids: list[tuple[int, list[float]]]
) -> Column:
    """Argmax-cosine cell id for ``vec`` against a LITERAL centroid list,
    as one expression: max of (cosine, -cid) structs — highest cosine
    wins, ties break to the smallest cid (the ivf_assign contract).

    This is the scale-defining choice of :func:`kmeans_centroids`: with
    centroids as plan literals the assignment is a narrow map — no
    corpus crossJoin, no per-vector window shuffle — so one k-means
    iteration touches the corpus exactly once."""
    candidates = [
        F.struct(
            F.coalesce(
                cosine_expr(vec, F.array(*[F.lit(float(x)) for x in cvec])),
                F.lit(float("-inf")),  # zero-norm row: any cell, det.
            ).alias("s"),
            F.lit(-cid).alias("nc"),
        )
        for cid, cvec in centroids
    ]
    return (-F.array_max(F.array(*candidates))["nc"]).cast("long")


def _assign_broadcast(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Argmax-cosine cell assignment against a BROADCAST centroid
    table — the large-``n_cells`` twin of :func:`_nearest_centroid_expr`.

    The literal form embeds n_cells x dim constants in the plan; at
    SemDeDup-paper scale (~100k cells) that explodes plan size and
    codegen.  Here centroids travel as a broadcast table instead: a
    constant-key equi-join (BroadcastHashJoin, never a nested-loop —
    the build side is one bucket, the probe streams the corpus) fans
    each vector out to n_cells scored rows, and a map-side-combinable
    ``max(struct(sim, -cid))`` groupBy collapses them back to one row
    per vector.  The fan-out rows of a vector never leave their
    partition before the partial aggregate, so the shuffle carries ONE
    row per vector — the assignment costs one corpus-sized exchange
    per iteration, the price of not inlining the centroids.  Tie-break
    and zero-norm semantics are IDENTICAL to the literal form (same
    cosine_expr, same (sim, -cid) struct ordering), so both forms
    assign bit-identically.  Returns (id, cid, vec)."""
    spark = corpus.sparkSession
    cent = spark.createDataFrame(
        [(cid, [float(x) for x in cvec]) for cid, cvec in centroids],
        "cid long, cvec array<double>",
    )
    # The fan-out key is constant-by-construction but written as
    # pmod(col, 1) on BOTH sides: literal keys get constant-folded —
    # Catalyst rewrites the equi-condition into a probe-side filter and
    # the join degrades to BroadcastNestedLoopJoin.  Non-foldable keys
    # keep a HashedRelation build + streamed probe (BroadcastHashJoin);
    # the per-row pmod is noise.
    scored = (
        corpus.withColumn("_k", F.pmod(F.col(id_col), F.lit(1)))
        .join(
            F.broadcast(
                cent.withColumn("_k", F.pmod(F.col("cid"), F.lit(1)))
            ),
            "_k",
        )
        .select(
            id_col,
            vec_col,
            F.struct(
                F.coalesce(
                    cosine_expr(F.col(vec_col), F.col("cvec")),
                    F.lit(float("-inf")),
                ).alias("s"),
                (-F.col("cid")).alias("nc"),
            ).alias("_cand"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.max("_cand").alias("_m"),
            F.first(vec_col).alias(vec_col),
        )
        .select(
            id_col,
            (-F.col("_m")["nc"]).cast("long").alias("cid"),
            vec_col,
        )
    )


def kmeans_centroids(
    df: DataFrame,
    n_cells: int = 4,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    literal_centroid_limit: int = 256,
) -> DataFrame:
    """Deterministic Lloyd's k-means over an embedding column — the
    centroid trainer SemDeDup/IVF were stubbing (first-n-by-id).
    Returns ``(cid, cvec array<double>, n_members)``, directly pluggable
    into :func:`semantic_dedup` / :func:`ivf_assign`.

    Deterministic end-to-end, no RNG (the kmv_distinct /
    docs_training_order recipe):

    * init — the ``n_cells`` vectors with the smallest
      ``sha256('kmeans-init:' || id)`` (a seedless uniform sample;
      first-n-by-id would bias toward whatever the id order encodes),
      cid assigned in that same sha order;
    * assignment — argmax cosine with cid as tie-break
      (:func:`_nearest_centroid_expr`), a pure expression;
    * update — per-cell per-dim mean accumulated as EXACT bigint
      micro-units (``sum(round(x*1e6))::long / n / 1e6`` — the
      stable_sum policy), so the new centroids are bit-identical on any
      partition layout and in the DuckDB oracle; the ~1e-6 value
      quantization is noise at clustering granularity.  Component sums
      stay inside int64 up to ~9e12 members per cell.  Cells that lose
      every member keep their previous centroid (n_members = 0);
    * a FIXED iteration count, not a convergence test — float
      convergence thresholds are where cross-engine drift hides.

    Scale shape, per iteration: ONE corpus scan -> assignment ->
    map-side-combined groupBy collapsing to ``n_cells`` rows of ``dim``
    integer sums.  Assignment has two bit-identical forms, selected by
    ``literal_centroid_limit``: up to the limit, centroids are inlined
    as plan literals (:func:`_nearest_centroid_expr` — a narrow map,
    zero exchanges); above it, they travel as a broadcast table
    (:func:`_assign_broadcast` — plan size stays O(1) in n_cells, one
    corpus exchange per iteration), which is the SemDeDup-paper regime
    of ~100k cells.  The driver holds only the centroid matrix
    (n_cells x dim — metadata, the Spark MLlib KMeans pattern); nothing
    data-sized ever reaches the driver.  The init top-k is a
    TakeOrdered (partial per-partition top-k), not a global sort."""
    corpus = df.select(id_col, vec_col)
    if dim is None:
        probe = corpus.select(F.size(vec_col).alias("d")).first()
        if probe is None:
            raise ValueError("kmeans_centroids: empty corpus")
        dim = probe["d"]
    init_key = F.sha2(
        F.concat(F.lit("kmeans-init:"), F.col(id_col).cast("string")), 256
    )
    seeds = (
        corpus.select(id_col, vec_col, init_key.alias("_h"))
        .orderBy("_h", id_col)
        .limit(n_cells)
        .collect()
    )
    if not seeds:
        raise ValueError("kmeans_centroids: empty corpus")
    centroids = [
        (cid, [float(x) for x in r[vec_col]]) for cid, r in enumerate(seeds)
    ]
    counts = {cid: 0 for cid, _ in centroids}
    for _ in range(n_iters):
        if len(centroids) <= literal_centroid_limit:
            # literal form: assignment is a narrow map, ZERO exchanges
            # before the n_cells-row aggregate
            assigned = corpus.select(
                _nearest_centroid_expr(F.col(vec_col), centroids).alias(
                    "cid"
                ),
                vec_col,
            )
        else:
            # broadcast form: plan size stays O(1) in n_cells at the
            # cost of one corpus-sized exchange per iteration — the
            # SemDeDup-paper regime (~100k cells) where inlining
            # centroids as literals would explode the plan
            assigned = _assign_broadcast(
                corpus, centroids, id_col, vec_col
            ).select("cid", vec_col)
        stats = (
            assigned
            .groupBy("cid")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(
                        F.round(
                            F.element_at(F.col(vec_col), i + 1).cast(
                                "double"
                            )
                            * 1e6
                        ).cast("long")
                    ).alias(f"_s{i}")
                    for i in range(dim)
                ],
            )
            .collect()  # n_cells rows — metadata-sized, like MLlib
        )
        new = {
            int(r["cid"]): [r[f"_s{i}"] / r["_n"] / 1e6 for i in range(dim)]
            for r in stats
        }
        counts = {cid: 0 for cid, _ in centroids}
        counts.update({int(r["cid"]): int(r["_n"]) for r in stats})
        centroids = [(cid, new.get(cid, cvec)) for cid, cvec in centroids]
    return df.sparkSession.createDataFrame(
        [(cid, cvec, counts[cid]) for cid, cvec in centroids],
        "cid long, cvec array<double>, n_members long",
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space, compare vectors ONLY
    within their cluster, and greedily drop every vector that has a
    lower-id within-cluster neighbor at cosine >= ``threshold``.
    Returns the survivors as (id, cid); callers semi-join the corpus
    against it.

    This is the semantic complement of the lexical family in
    ``functions/dedup.py``: paraphrases and re-encodings share no
    n-grams, but their embeddings sit at cosine ~1.

    Scale shape — the whole point of the clustering step: pairwise
    cosine is confined to each cell, so the quadratic term is
    ``sum(|cell|^2)``, controlled by choosing ``n_cells`` proportional
    to corpus size (SemDeDup runs web-scale with ~100k k-means
    clusters; the paper's policy).  Centroids are BROADCAST for
    assignment; pass ``centroids=kmeans_centroids(df, ...)`` for
    trained cells (the default is a deterministic stub — first
    ``n_cells`` vectors by id — kept as the fast path and for the SQL
    oracle); the within-cell pair join is an equi-join on cid.  Known
    recall edge, straight from the paper: a near-dup pair split across
    a cell boundary is not compared — pass ``nprobe > 1`` to mitigate:
    each vector then joins its nprobe nearest cells for PAIR DISCOVERY
    (a boundary vector sits in both flanking cells, so the split pair
    meets), multiplying candidate volume by at most nprobe^2 while the
    returned row per survivor still carries its PRIMARY cell.  The
    greedy min-id keep policy is one anti-join, no iteration
    (transitive chains collapse to the smallest id per chain *within a
    shared cell*).

    Determinism: assignment tie-breaks on cid (inside
    :func:`ivf_assign`); the drop set is a pure predicate over exact
    cosines — no RNG, identical on any partition layout.
    """
    from airflow_etl_minio_to_postgres_spark.functions.dedup import (
        _persist_tracked,
    )

    corpus = _persist_tracked(df.select(id_col, vec_col))
    if centroids is None:
        # fast path: deterministic stub (first n_cells vectors by id);
        # pass centroids=kmeans_centroids(df, ...) for trained cells —
        # same (cid, cvec) contract, identical downstream plan.
        centroids = corpus.where(F.col(id_col) < n_cells).select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
        )
    else:
        centroids = centroids.select("cid", "cvec")
    assigned = ivf_assign(
        corpus, centroids, id_col, vec_col,
        nprobe=nprobe, rank_col="_cell_rank",
    )
    # cellv feeds BOTH sides of the pair join and the final anti-join:
    # persist so cell assignment (a window over a broadcast cross) runs
    # once, not three times.
    cellv = _persist_tracked(corpus.join(assigned, id_col))
    a = cellv.select(
        "cid", F.col(id_col).alias("_ida"), F.col(vec_col).alias("_va")
    )
    b = cellv.select(
        "cid", F.col(id_col).alias("_idb"), F.col(vec_col).alias("_vb")
    )
    dropped = (
        a.join(b, "cid")
        .where(F.col("_ida") < F.col("_idb"))
        .where(cosine_expr(F.col("_va"), F.col("_vb")) >= F.lit(threshold))
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return (
        cellv.where(F.col("_cell_rank") == 1)
        .join(dropped, id_col, "left_anti")
        .select(id_col, "cid")
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid of an embedding column, emitted LONG —
    one (label, dim, mean_val, n_vecs) row per coordinate — rather than as
    an array, so the result joins/filters like any other table.

    Shape: ``posexplode`` fans each vector into (label, dim, value) rows,
    then one partial-aggregating groupBy on (label, dim) — the map-side
    combine collapses the fan-out inside each task, so the shuffle carries
    at most ``n_labels x dim`` rows per task regardless of corpus size.
    The clustering/classification bookend: compute class prototypes over
    billions of vectors with a single bounded shuffle (contrast with
    collecting vectors to a driver-side kmeans step).
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "_v"),
    )
    return exploded.groupBy("label", "dim").agg(
        F.avg(F.col("_v").cast("double")).alias("mean_val"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``(id, scale,
    qvec array<int>)`` with ``qvec[i] = round(x[i] / scale)`` and
    ``scale = max(|x|) / 127`` — the storage/bandwidth scale path for
    ANN at 100 TB (4x smaller vectors than float32, 8x than float64;
    dot products on int8 SIMD-vectorize, and the scale factors multiply
    back out per pair).

    Expression-only and shuffle-free: one ``transform`` to double, one
    ``array_max`` for the per-vector scale, one ``transform`` for the
    rounded quotients — all whole-stage-codegen'd in the scan stage.
    Arithmetic is double end-to-end (float32 cast up first), so the
    DuckDB oracle reproduces every quantized value bit-exactly;
    ``greatest(scale, 1e-12/127)`` keeps zero vectors from dividing by
    zero (they quantize to all-zero).  Dequantization error is bounded
    by ``scale/2`` per coordinate — the standard symmetric-quantization
    contract."""
    xd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    out = df.select(F.col(id_col), xd.alias("_xd")).withColumn(
        "scale",
        F.greatest(
            F.array_max(F.transform(F.col("_xd"), F.abs)), F.lit(1e-12)
        )
        / F.lit(127.0),
    )
    return out.select(
        id_col,
        "scale",
        F.transform(
            F.col("_xd"),
            lambda v: F.round(v / F.col("scale")).cast("int"),
        ).alias("qvec"),
    )


def dequantize_int8(
    df: DataFrame,
    qvec_col: str = "qvec",
    scale_col: str = "scale",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reconstruct float vectors from a :func:`quantize_int8` table:
    ``vec[i] = qvec[i] * scale`` — the read side of the int8 storage
    path, so a quantized corpus plugs straight into every serving
    operator (``topk_cosine`` / ``knn_join`` / the IVF family) and the
    recall cost of quantization becomes MEASURABLE through
    :func:`ann_recall_at_k` (quantized serving vs full-precision
    truth) instead of assumed.  Expression-only (one ``transform`` in
    the scan stage, shuffle-free); reconstruction error per coordinate
    is bounded by ``scale/2``, the symmetric-quantization contract the
    quantizer documents.  Keeps every other column; replaces nothing
    but adds ``vec_col``."""
    return df.withColumn(
        vec_col,
        F.transform(
            F.col(qvec_col),
            lambda v: v.cast("double") * F.col(scale_col),
        ),
    )
