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

from pyspark.sql import Column, DataFrame
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
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def topk_cosine(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors of ``query_id`` by cosine similarity.

    The query point is a one-row broadcast — no shuffle of the corpus; the
    top-k is a TakeOrdered, not a global sort materialization.
    """
    q = df.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_query_vec")
    )
    return (
        df.where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            cosine_expr(F.col(vec_col), F.col("_query_vec")).alias("cosine"),
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
) -> DataFrame:
    """IVF cell assignment: each vector joins its nearest centroid
    (max cosine, centroid id as the deterministic tie-break).

    Shape at scale: corpus x n_cells narrow map against BROADCAST centroids
    + a per-vector top-1 window — no corpus shuffle beyond the window's own
    (vector-id-partitioned, perfectly balanced).  Returns (id, cid).
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
    return (
        sims.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, centroid_id)
    )


def ivf_topk(
    df: DataFrame,
    query_id: int,
    k: int = 5,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: partition the corpus into cells around centroids,
    search only the query's cell (nprobe=1).

    Centroid "training" is a deterministic stub — the first ``n_cells``
    corpus vectors by id (production: k-means/k-means||; the serving-path
    plumbing is identical).  At scale the corpus is written partitioned by
    cell, making this a partition-pruned scan + tiny top-k.
    """
    centroids = df.where(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    corpus = df.join(assigned, on=id_col)
    q = corpus.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_query_vec"), F.col("cid").alias("_qcid")
    )
    return (
        corpus.crossJoin(F.broadcast(q))
        .where((F.col("cid") == F.col("_qcid")) & (F.col(id_col) != query_id))
        .select(
            id_col,
            cosine_expr(F.col(vec_col), F.col("_query_vec")).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate detection, LSH-bucketed.

    Candidate pairs come from an equi-join on the sign bucket (cosine-close
    vectors almost surely share sign patterns on leading components); only
    candidates pay the exact cosine.  Returns (id_a, id_b, cosine) with
    ``id_a < id_b`` and ``cosine >= threshold`` — never an all-pairs
    product: complexity is sum of squared bucket sizes, ~corpus^2 / 2^n_bits
    for balanced buckets.
    """
    b = add_sign_bucket(df, vec_col, n_bits)
    left = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "bucket"
    )
    right = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "bucket"
    )
    return (
        left.join(right, on="bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_expr(F.col("v_a"), F.col("v_b")))
        .where(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
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
