"""Connected components over near-duplicate pair graphs.

Why this exists: pairwise near-dup removal (drop the higher id of every
qualifying pair) is NOT transitive-closure dedup.  With pairs (A,B) and
(B,C) but no (A,C) edge, the pairwise policy drops B and C even though C
only resembles the already-dropped B — the correct cluster {A,B,C} keeps
exactly one survivor.  Production LLM dedup (e.g. the MinHash pipelines
described in the Gopher/RefinedWeb reports) clusters candidate pairs into
components and keeps one document per component; this module supplies that
clustering as a DataFrame-native operator.

Scale design: the operator is iterative min-label propagation —
``label(v) <- min(label(v), min over neighbors' labels)`` to fixpoint.
Each round is one shuffle keyed on node id (join labels to edges +
groupBy), so total cost is O(E) per round x graph diameter.  Near-dup
graphs are unions of tiny, dense clusters (a doc, its shards, its mirror
copies) — diameter is 2-3 in practice, so the loop runs 3-4 rounds
regardless of corpus size.  Every round ``localCheckpoint``s the label
table: lineage stays O(1) deep instead of growing one join per round
(the classic iterative-DataFrame blowup), and the convergence check reads
a 2-value aggregate off the checkpointed result, not a recompute.  For
adversarial high-diameter graphs (long chains), switch to the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14), which converges in O(log^2 n) rounds on
the same join/groupBy primitives; near-dup workloads never need it.

Convergence detection is free of a distinct "did anything change" join:
labels only ever decrease, so ``sum(label)`` strictly decreases on every
round that changes anything — the loop stops the first time the (count,
sum) signature repeats.
"""

from __future__ import annotations

import math
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# One reduce task per this many edge/label rows inside the iterative
# loops.  Rows are two ids (~16 bytes), so this is ~100 MB-class reduce
# partitions (guide-of-thumb shuffle sizing) — NOT a local-mode tune.
_LOOP_ROWS_PER_TASK = 2_000_000


@contextmanager
def _loop_shuffle_partitions(spark, n_rows: int):
    """Scale the iterative loop's reduce parallelism to the MEASURED
    graph size, capped at the session's configured
    ``spark.sql.shuffle.partitions``.

    The per-round label/rank tables are bounded by the (already
    checkpointed, already counted) edge list, so the right partition
    count is derivable instead of configured: a billion-edge graph at
    cluster scale keeps the session's full parallelism, while a
    thousand-edge dup graph stops paying 6+ stages x 32-64 near-empty
    tasks of pure per-task setup EVERY round (measured: the iterative
    entries' propagate stages ran 64 tasks at ~0.1 CPU-s of fixed cost
    per task for label tables of a few thousand rows).  Partition count
    never affects results — only task-grain scheduling.

    CONCURRENCY CONTRACT (shared with streaming.scaled_state_partitions,
    where it is spelled out): session-global conf, safe serially and
    nested on one thread (restores on exit/exception, pytest-pinned);
    concurrent same-session queries would observe the scaled value —
    use ``spark.newSession()`` clones for concurrent callers."""
    n_parts = max(1, math.ceil(n_rows / _LOOP_ROWS_PER_TASK))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    n_parts = min(n_parts, int(prev))
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the MINIMUM
    node id of its connected component.

    Returns (node, component).  Nodes appearing only as isolated vertices
    are the caller's concern — ``edges`` has no way to mention them; join
    the result back to the corpus with ``coalesce(component, id)``.

    Raises ``RuntimeError`` if the propagation has not converged after
    ``max_iter`` rounds (diameter > max_iter ⇒ the input is not a
    near-dup-shaped graph; see module docstring for the log-rounds
    alternative).
    """
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .union(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    def _checkpoint_with_sig(df: DataFrame):
        """Eager-checkpoint ``df`` and return (checkpointed, (n, sum)).

        The convergence signature rides the checkpoint's own
        materialization job via ``observe`` (r18, guide §1/§2: the
        per-round ``agg().collect()`` was a SECOND full job over the
        just-checkpointed labels — one job per round saved, verified in
        the entries' event logs).  CollectMetrics is exact (not
        sampled), and localCheckpoint truncates the returned plan, so
        the observation node never leaks into downstream lineage."""
        obs = Observation()
        out = df.observe(
            obs, F.count(F.lit(1)).alias("n"), F.sum("label").alias("s")
        ).localCheckpoint(eager=True)
        got = obs.get  # blocks on the checkpoint action just issued
        return out, (got["n"], got["s"])

    with _loop_shuffle_partitions(edges.sparkSession, sym.count()):
        # round 0: label(u) = min(u, min neighbor) — one groupBy seeds the
        # same state a separate init + first propagation round would.
        labels, prev_sig = _checkpoint_with_sig(
            sym.groupBy("u")
            .agg(F.least(F.min("v"), F.first("u")).alias("label"))
            .withColumnRenamed("u", "node")
        )
        for _ in range(max_iter):
            # propagate: each node offers its label to every neighbor;
            # keep min
            offers = sym.join(
                labels.withColumnRenamed("node", "u"), on="u"
            ).select(F.col("v").alias("node"), "label")
            labels, sig = _checkpoint_with_sig(
                labels.unionByName(offers)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
            )
            if sig == prev_sig:
                return labels.select(
                    "node", F.col("label").alias("component")
                )
            prev_sig = sig
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "graph diameter exceeds the near-dup contract — use a "
        "large-star/small-star implementation for chain-shaped graphs"
    )


def assign_clusters(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Every corpus row labeled with its duplicate-cluster id: the minimum
    ``id_col`` reachable through ``pairs``; singletons label themselves.

    The component table is small (only docs that appear in some pair —
    the duplicate minority), so AQE turns the join back to the corpus
    into a broadcast; the full corpus never shuffles.
    """
    comp = connected_components(pairs, src_col, dst_col).withColumnRenamed(
        "node", id_col
    )
    return corpus.select(id_col).join(comp, on=id_col, how="left").select(
        id_col,
        F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
    )


def transitive_dedup(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Transitive-closure dedup: ONE survivor per duplicate cluster — the
    minimum id — instead of the pairwise drop-the-higher-id policy (see
    module docstring for why those differ on chained duplicates)."""
    clustered = assign_clusters(corpus, pairs, id_col, src_col, dst_col)
    return clustered.where(F.col(id_col) == F.col("cluster_id")).select(id_col)


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    id_col: str = "doc_id",
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Fixed-iteration power PageRank over a directed edge list
    ``(src, dst)`` — the second iterative-graph operator family (the
    first, connected components, labels duplicate clusters; PageRank
    scores node CENTRALITY, e.g. canonical-document selection inside a
    dup cluster or domain authority over a link graph).

    Same scale shape as label propagation: each iteration is one edge
    shuffle (join ranks on src + groupBy dst) and the rank table is
    ``localCheckpoint``ed per round so lineage stays O(1) deep.
    ``edges`` (and the out-degree table derived from it) is eagerly
    checkpointed ONCE up front — without this, every power iteration
    re-executes the caller's full upstream plan (for near-dup graphs
    that is the entire MinHash-LSH candidate pipeline), turning an
    O(E x iterations) loop into O(upstream x iterations).  The node
    count is the only driver scalar (metadata-sized).  Fixed iteration
    count — power iteration's per-round cost is what matters at scale,
    and a fixed unroll keeps the computation exactly reproducible in
    the SQL oracle.

    Dangling nodes (no out-edges): by default their mass leaks — the
    standard simplification, exact for symmetric near-dup graphs, which
    have none.  With ``redistribute_dangling=True`` each iteration adds
    ``damping * dangling_mass / n`` to every node, where dangling_mass
    is the summed rank of sink nodes — the honest formulation for
    directed link graphs (domain authority), conserving total mass at
    1.0.  Cost: one extra 1-row aggregate per iteration (an anti-join
    of ranks against the out-degree table, both already checkpointed),
    broadcast back via a 1-row cross join — no driver collect.
    """
    n = nodes.count()
    if n == 0:
        return nodes.select(
            F.col(id_col).alias("node"), F.lit(0.0).alias("pagerank")
        )
    base_mass = (1.0 - damping) / n
    # Materialize the edge list once; every iteration (and the degree
    # aggregate) reads the checkpointed blocks, never the upstream plan.
    # Mirrors ``sym`` in connected_components above.
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    # Eager per-round checkpoints so every round's shuffles plan (and
    # run) inside the scaled-parallelism scope; each round computes
    # exactly once either way — eager only moves WHEN, and pins the
    # loop's task grain to the measured graph size.
    with _loop_shuffle_partitions(nodes.sparkSession, max(n, edges.count())):
        out_deg = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .localCheckpoint(eager=True)
        )
        ranks = nodes.select(
            F.col(id_col).alias("node"), F.lit(1.0 / n).alias("pagerank")
        )
        for _ in range(iterations):
            contrib = (
                edges.join(ranks, edges["src"] == ranks["node"])
                .join(out_deg, "src")
                .groupBy("dst")
                .agg(F.sum(F.col("pagerank") / F.col("_deg")).alias("_c"))
            )
            new_ranks = nodes.select(F.col(id_col).alias("node")).join(
                contrib, F.col("node") == contrib["dst"], "left"
            )
            if redistribute_dangling:
                dangling = (
                    ranks.join(
                        out_deg, ranks["node"] == out_deg["src"], "left_anti"
                    ).agg(
                        F.coalesce(F.sum("pagerank"), F.lit(0.0)).alias("_dm")
                    )
                )
                new_ranks = new_ranks.crossJoin(F.broadcast(dangling)).select(
                    "node",
                    (
                        F.lit(base_mass)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("_c"), F.lit(0.0))
                            + F.col("_dm") / F.lit(float(n))
                        )
                    ).alias("pagerank"),
                )
            else:
                new_ranks = new_ranks.select(
                    "node",
                    (
                        F.lit(base_mass)
                        + F.lit(damping) * F.coalesce(F.col("_c"), F.lit(0.0))
                    ).alias("pagerank"),
                )
            ranks = new_ranks.localCheckpoint(eager=True)
    return ranks
