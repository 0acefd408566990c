"""Unit tests for functions/graph.py (connected-components dedup clustering)."""

from __future__ import annotations

import pytest

from airflow_etl_minio_to_postgres_spark.functions.graph import (
    assign_clusters,
    connected_components,
    transitive_dedup,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["id_a", "id_b"])


def _components(spark, pairs):
    rows = connected_components(_edges(spark, pairs)).collect()
    return {r["node"]: r["component"] for r in rows}


def test_disjoint_pairs(spark):
    comp = _components(spark, [(1, 2), (3, 4)])
    assert comp == {1: 1, 2: 1, 3: 3, 4: 3}


def test_chain_converges_across_rounds(spark):
    # A 7-node path needs several propagation rounds (diameter 6) — pins
    # the iteration/convergence logic, not just the seeded first round.
    chain = [(i, i + 1) for i in range(1, 7)]
    comp = _components(spark, chain)
    assert comp == {i: 1 for i in range(1, 8)}


def test_merge_through_shared_node(spark):
    # V-shape: (1,3) and (2,3) form ONE component through 3.
    comp = _components(spark, [(1, 3), (2, 3)])
    assert comp == {1: 1, 2: 1, 3: 1}


def test_edge_order_is_irrelevant(spark):
    # min label flows "uphill" regardless of which side is smaller
    comp = _components(spark, [(5, 9), (2, 9), (2, 7)])
    assert comp == {2: 2, 5: 2, 7: 2, 9: 2}


def test_assign_clusters_labels_singletons(spark):
    corpus = spark.createDataFrame([(i,) for i in range(1, 6)], ["doc_id"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in assign_clusters(corpus, _edges(spark, [(2, 4)])).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 4: 2, 5: 5}


def test_transitive_vs_pairwise_on_v_shape(spark):
    # Pairs (1,3), (2,3): the pairwise drop-every-id_b policy keeps {1, 2}
    # — two surviving near-duplicates of the same cluster.  Transitive
    # clustering keeps exactly one survivor: min id 1.
    corpus = spark.createDataFrame([(1,), (2,), (3,)], ["doc_id"])
    pairs = _edges(spark, [(1, 3), (2, 3)])
    survivors = {
        r["doc_id"] for r in transitive_dedup(corpus, pairs).collect()
    }
    assert survivors == {1}
    pairwise = {1, 2}  # what the anti-join-on-id_b policy would keep
    assert survivors != pairwise


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(1, 9)]), max_iter=2
        )


def test_pagerank_uniform_on_symmetric_clique(spark):
    from airflow_etl_minio_to_postgres_spark.functions.graph import pagerank

    # 3-clique, symmetric: ranks stay uniform at 1/N every iteration.
    nodes = spark.createDataFrame([(i,) for i in range(3)], "doc_id long")
    pairs = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    ranks = {r.node: r.pagerank for r in pagerank(nodes, edges, 3).collect()}
    for v in ranks.values():
        assert abs(v - 1 / 3) < 1e-12


def test_pagerank_isolated_node_keeps_base_mass_and_hub_leads(spark):
    from airflow_etl_minio_to_postgres_spark.functions.graph import pagerank

    # star: 1-2-3 all point at 0 (and back); 9 is isolated.
    nodes = spark.createDataFrame([(i,) for i in (0, 1, 2, 3, 9)], "doc_id long")
    pairs = []
    for leaf in (1, 2, 3):
        pairs += [(leaf, 0), (0, leaf)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    ranks = {r.node: r.pagerank for r in pagerank(nodes, edges, 3).collect()}
    n = 5
    assert abs(ranks[9] - 0.15 / n) < 1e-12  # isolated: base mass only
    assert ranks[0] > max(ranks[1], ranks[2], ranks[3])  # hub dominates
    assert abs(ranks[1] - ranks[2]) < 1e-12  # leaves symmetric


def test_pagerank_dangling_redistribution_conserves_mass(spark):
    from airflow_etl_minio_to_postgres_spark.functions.graph import pagerank

    # chain 1 -> 2 -> 3; node 3 is a sink.  Without redistribution its
    # mass leaks (sum < 1); with redistribution total mass stays 1.0 and
    # every rank matches the hand-unrolled power iteration.
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3)], "doc_id long")
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")

    leaky = {
        r.node: r.pagerank for r in pagerank(nodes, edges, 3).collect()
    }
    assert sum(leaky.values()) < 1.0 - 1e-6

    got = {
        r.node: r.pagerank
        for r in pagerank(
            nodes, edges, 3, redistribute_dangling=True
        ).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-12  # mass conserved

    # hand-unrolled reference: r_new(v) = .05 + .85*(contrib(v) + dm/3)
    d, n = 0.85, 3
    r = {1: 1 / n, 2: 1 / n, 3: 1 / n}
    for _ in range(3):
        dm = r[3]  # only node 3 dangles
        r = {
            1: (1 - d) / n + d * (dm / n),
            2: (1 - d) / n + d * (r[1] + dm / n),
            3: (1 - d) / n + d * (r[2] + dm / n),
        }
    for v in (1, 2, 3):
        assert abs(got[v] - r[v]) < 1e-12


def test_scaled_conf_scopes_restore_nested_and_on_error(spark):
    """r18 (VERDICT #7): the two conf-scoping context managers —
    graph._loop_shuffle_partitions and streaming's
    scaled_state_partitions — mutate the session-global
    spark.sql.shuffle.partitions; their contract is restore-on-exit
    for the serial caller, INCLUDING nested scopes on one thread and
    exceptional exits.  Pin both so a refactor can't silently leak a
    scaled value into the rest of the session."""
    from airflow_etl_minio_to_postgres_spark.functions.graph import (
        _loop_shuffle_partitions,
    )
    from airflow_etl_minio_to_postgres_spark.streaming.pipeline import (
        scaled_state_partitions,
    )

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)

    # nested scopes: inner caps at the outer scope's value and restores
    # to it, outer restores the session value
    with _loop_shuffle_partitions(spark, 1):
        outer = spark.conf.get(key)
        assert outer == "1"
        with _loop_shuffle_partitions(spark, 10**9):
            # capped at the ENCLOSING scope's value, never above it
            assert spark.conf.get(key) == outer
        assert spark.conf.get(key) == outer
    assert spark.conf.get(key) == before

    # exceptional exit restores too
    try:
        with _loop_shuffle_partitions(spark, 1):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key) == before

    # streaming twin: empty backlog path (no sources) is a no-op scope;
    # a real path scales and restores, also on error
    with scaled_state_partitions(spark):
        assert spark.conf.get(key) == before
    with scaled_state_partitions(spark, "/root/testdata/sf0.001"):
        assert int(spark.conf.get(key)) <= int(before)
    assert spark.conf.get(key) == before
    try:
        with scaled_state_partitions(spark, "/root/testdata/sf0.001"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key) == before
