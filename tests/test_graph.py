"""Connected components: chains close transitively, singletons keep
their own label, and the convergence guard is loud, not infinite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _cc(spark, nodes, edges, **kw):
    from unicargo_medallion_data_pipeline_spark.operators.graph import (
        connected_components,
    )

    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    e = spark.createDataFrame(edges, "u long, v long")
    out = connected_components(n, e, **kw)
    return {r["node"]: r["component_id"] for r in out.collect()}


def test_chain_closes_transitively(spark):
    """1-2, 2-3, 3-4 chain: 4 never touches 1 directly but must join
    component 1 (needs multiple propagation rounds)."""
    got = _cc(spark, [1, 2, 3, 4, 9], [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9}


def test_two_components_and_direction_symmetry(spark):
    """Edges are undirected regardless of the order given."""
    got = _cc(spark, [1, 2, 3, 10, 11], [(2, 1), (3, 2), (11, 10)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_within_iteration_budget(spark):
    """The min label travels one hop per round; an 11-hop chain needs
    11 rounds and must converge inside the default 25-round guard."""
    n = 12
    got = _cc(spark, list(range(n)), [(i, i + 1) for i in range(n - 1)])
    assert set(got.values()) == {0}


def test_guard_raises_instead_of_looping(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (3, 4)], max_iterations=1)


def test_component_representative_invariants_on_corpus(spark):
    """Catalog-level invariants on real data: every component's
    representative is its min doc_id, sizes sum to the corpus, and every
    near-dup pair lands in one component."""
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    sf = "/root/testdata/sf0.001"
    comp = CATALOG["doc_neardup_components"].fn(spark, sf)
    rows = comp.collect()
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r["component_id"], []).append(r)
    for cid, members in by_comp.items():
        assert cid == min(m["doc_id"] for m in members)
        reps = [m for m in members if m["is_representative"]]
        assert len(reps) == 1 and reps[0]["doc_id"] == cid
        assert all(m["component_size"] == len(members) for m in members)
    assert len(rows) == sum(len(m) for m in by_comp.values())

    pairs = CATALOG["doc_minhash_near_dups"].fn(spark, sf).collect()
    label = {r["doc_id"]: r["component_id"] for r in rows}
    for p in pairs:
        assert label[p["a_id"]] == label[p["b_id"]]


def test_pagerank_integer_matches_python_reference(spark):
    """Hand-loop the exact integer recurrence in Python on a small graph
    and require bit-identical ranks from the distributed operator."""
    from unicargo_medallion_data_pipeline_spark.operators.graph import pagerank_integer

    nodes = [0, 1, 2, 3, 4]
    edges = [(0, 1, 3), (0, 2, 1), (1, 2, 2), (2, 0, 5), (3, 0, 1)]  # node 4 dangling
    scale, num, den, iters = 10**9, 85, 100, 5

    # Python reference of the declared recurrence.
    n = len(nodes)
    base = (scale * (den - num)) // den // n
    w_out = {}
    for s, d, w in edges:
        w_out[s] = w_out.get(s, 0) + w
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for s, d, w in edges:
            nxt[d] += (num * r[s] * w) // (den * w_out[s])
        r = nxt

    ndf = spark.createDataFrame([(v,) for v in nodes], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint, w bigint")
    got = {
        row["node"]: row["pagerank_scaled"]
        for row in pagerank_integer(ndf, edf, iterations=iters).collect()
    }
    assert got == r


def test_pagerank_empty_nodes_returns_empty_ranking(spark):
    # r11: the empty graph is a real state (matched-nothing filter), not
    # an error — PageRank over it IS the empty ranking
    from unicargo_medallion_data_pipeline_spark.operators.graph import pagerank_integer

    ndf = spark.createDataFrame([], "node bigint")
    edf = spark.createDataFrame([], "src bigint, dst bigint, w bigint")
    out = pagerank_integer(ndf, edf)
    assert out.columns == ["node", "pagerank_scaled"]
    assert out.count() == 0


def test_pagerank_mass_bounded_and_positive(spark):
    """Total rank mass never exceeds the scale (truncation + dangling
    decay only LOSE mass) and every node keeps at least the base
    teleport mass."""
    from unicargo_medallion_data_pipeline_spark.operators.graph import pagerank_integer

    nodes = [(v,) for v in range(8)]
    edges = [(a, (a * 3 + 1) % 8, (a % 3) + 1) for a in range(8)] + [
        (0, 5, 4), (7, 2, 2)
    ]
    ndf = spark.createDataFrame(nodes, "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint, w bigint")
    scale = 10**9
    ranks = [r["pagerank_scaled"] for r in pagerank_integer(ndf, edf, iterations=6, scale=scale).collect()]
    base = (scale * 15) // 100 // 8
    assert sum(ranks) <= scale
    assert all(r >= base for r in ranks)


def test_pagerank_dedups_node_frame(spark):
    """A duplicated node id must not inflate N or multiply its
    neighbors' rank mass — ranks equal those from the distinct frame."""
    from unicargo_medallion_data_pipeline_spark.operators.graph import pagerank_integer

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 1, 1), (1, 3, 1)], "src int, dst int, w int"
    )
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "node int")
    dup_nodes = nodes.unionByName(
        spark.createDataFrame([(1,), (1,)], "node int")
    )
    clean = {
        r[0]: r[1]
        for r in pagerank_integer(nodes, edges, iterations=5).collect()
    }
    dup = {
        r[0]: r[1]
        for r in pagerank_integer(dup_nodes, edges, iterations=5).collect()
    }
    assert clean == dup, "duplicate node rows changed pagerank output"


def test_pagerank_checkpoint_cadence_is_value_invariant(spark):
    """r15: bounded unrolls skip per-iteration materialization (one
    lineage chain, one job) while long runs still pin every
    ``checkpoint_every`` rounds.  The cadence is an execution detail —
    the exact-integer ranks must be bit-identical at every setting,
    including a cadence that divides the iteration count mid-run."""
    from unicargo_medallion_data_pipeline_spark.operators.graph import pagerank_integer

    nodes = spark.createDataFrame([(v,) for v in range(6)], "node bigint")
    edges = spark.createDataFrame(
        [(0, 1, 2), (1, 2, 1), (2, 0, 3), (3, 4, 1), (4, 3, 2), (0, 5, 1)],
        "src bigint, dst bigint, w bigint",
    )

    def run(**kw):
        return {
            r["node"]: r["pagerank_scaled"]
            for r in pagerank_integer(nodes, edges, iterations=7, **kw).collect()
        }

    unpinned = run(checkpoint_every=100)   # pure chain, no checkpoint
    every_round = run(checkpoint_every=1)  # pre-r15 behavior
    mid_run = run(checkpoint_every=3)      # pins after rounds 3 and 6
    assert unpinned == every_round == mid_run
