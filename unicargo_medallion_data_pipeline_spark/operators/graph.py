"""Connected components over an edge list (min-label propagation).

The missing piece between near-dup PAIR generation (minhash/simhash/
embedding twins in ``textops/dedup.py``) and an actionable dedup
decision: pairs chain (A~B, B~C ⇒ {A,B,C} must keep ONE representative,
even though A and C never matched directly), so production dedup needs
the transitive closure, not the pair list.

Algorithm: iterative min-label propagation — every node starts labeled
with itself; each round a node takes the minimum label among itself and
its neighbors; fixpoint ⇒ every node carries the minimum node id of its
component.  Each round is one equi-join + one groupBy (both plain
shuffles on the node key, AQE-coalesced), with the lineage pinned by an
eager ``localCheckpoint`` per round — the same iterative-algorithm
pattern as the k-means fit in ``textops/similarity.py``.  Rounds needed
= graph diameter (near-dup clusters are shallow: tiny diameters in
practice); a ``max_iterations`` guard turns a pathological chain into a
loud error instead of an infinite loop.

Scale: state is one (node, label) row per node, shuffled on node id each
round — linear, no supernode hazard (a hot component's rows still hash
across partitions; only the final min-agg sees the component key, with
map-side partial aggregation absorbing the skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "u",
    dst_col: str = "v",
    max_iterations: int = 25,
) -> DataFrame:
    """Label every node with its component's minimum node id.

    ``nodes``: one column ``node_col`` (all nodes, including singletons
    that appear in no edge).  ``edges``: undirected pairs in
    ``src_col``/``dst_col``.  Returns ``(node_col, component_id)``.
    Raises if the fixpoint is not reached within ``max_iterations``
    (propagation needs one round per unit of component diameter).
    """
    sym = edges.select(
        F.col(src_col).alias("_u"), F.col(dst_col).alias("_v")
    )
    sym = (
        sym.unionByName(sym.select(F.col("_v").alias("_u"), F.col("_u").alias("_v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        nodes.select(F.col(node_col).alias("_n"))
        .distinct()
        .withColumn("_label", F.col("_n"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_labels = sym.join(
            labels.select(F.col("_n").alias("_v"), "_label"), "_v"
        ).select(F.col("_u").alias("_n"), "_label")
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("_n")
            .agg(F.min("_label").alias("_label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.select("_n", F.col("_label").alias("_old")), "_n"
            )
            .filter(F.col("_label") != F.col("_old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("_n").alias(node_col), F.col("_label").alias("component_id")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds "
        "(component diameter exceeds the iteration guard)"
    )


def pagerank_integer(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    iterations: int = 5,
    scale: int = 10**9,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Weighted PageRank in EXACT integer arithmetic — every rank is a
    scaled bigint, every per-edge contribution an integer division, so
    the result is bit-identical on any engine at any parallelism (the
    textbook float iteration is summation-order dependent and cannot be
    hash-verified).

    Semantics: r₀(v) = scale DIV N;
    r_{t+1}(v) = (scale·(den−num)) DIV den DIV N
                 + Σ_{u→v} (num · r_t(u) · w(u,v)) DIV (den · W(u)).
    Truncation loses < 1 ulp-of-scale per edge per round (bounded bias,
    identical everywhere); dangling mass simply decays — declared spec,
    not redistributed.  Overflow bound: num·r·w must fit int64 — holds
    while scale · max(w) ≤ ~10^17.

    Scale shape: the edge frame (+ out-weight) is pinned ONCE with a
    localCheckpoint and re-joined each round; each iteration is one
    keyed join + one sum-groupBy on the dst key.  Rank state is one
    long per node.

    Checkpoint cadence (r15 optimization, guide §5: materialize only
    when recomputation or plan growth would cost more than the barrier
    does): the rank lineage is a straight CHAIN — each iteration's
    frame is consumed exactly once by the next — so nothing is ever
    recomputed without a checkpoint; the only reason to pin is to stop
    unbounded plan growth at high iteration counts.  Pinning EVERY
    iteration (the pre-r15 shape) forced one eager materialization job
    per round — five scheduler round-trips for the 5-round trade graph,
    pure overhead at any data size.  Now the chain materializes every
    ``checkpoint_every`` rounds (default 8): bounded unrolls (PageRank's
    classic 5-20 rounds) run as ONE Spark job whose plan depth is
    capped at ``checkpoint_every`` joins, while large ``iterations``
    still get O(1) lineage.  connected_components keeps its per-round
    materialization because its convergence test NEEDS a per-round
    action — there the barrier buys the stop condition, here it bought
    nothing.
    """
    # dedup like connected_components: a duplicated node id would
    # inflate n_nodes (wrong r0/base) AND fan every outgoing edge out
    # per duplicate, multiplying its neighbors' rank mass silently
    nodes = nodes.select(node_col).distinct()
    n_nodes = nodes.count()  # bounded metadata (node count, not rows-of-data)
    if n_nodes == 0:
        # PageRank over the empty graph IS the empty ranking — a
        # matched-nothing node filter is a real state at scale, not an
        # error (r11 degenerate-input sweep)
        return nodes.select(
            F.col(node_col),
            F.lit(None).cast("long").alias("pagerank_scaled"),
        ).limit(0)
    base = (scale * (damping_den - damping_num)) // damping_den // n_nodes
    r0 = scale // n_nodes

    outw = edges.groupBy(src_col).agg(F.sum(weight_col).alias("_w_out"))
    e = (
        edges.select(src_col, dst_col, weight_col)
        .join(outw, src_col)
        .localCheckpoint(eager=True)  # static across iterations
    )
    node_ids = nodes.select(F.col(node_col).alias("_node"))
    r = node_ids.withColumn("_pr", F.lit(r0).cast("long"))
    for it in range(iterations):
        contrib = (
            e.join(r, F.col(src_col) == F.col("_node"))
            .select(
                F.col(dst_col).alias("_dst"),
                (F.lit(damping_num) * F.col("_pr") * F.col(weight_col)).alias("_num"),
                (F.lit(damping_den) * F.col("_w_out")).alias("_den"),
            )
            .select("_dst", F.expr("_num div _den").alias("_contrib"))
        )
        summed = contrib.groupBy("_dst").agg(F.sum("_contrib").alias("_s"))
        r = node_ids.join(summed, F.col("_node") == F.col("_dst"), "left").select(
            "_node",
            (F.lit(base) + F.coalesce(F.col("_s"), F.lit(0)))
            .cast("long")
            .alias("_pr"),
        )
        if (it + 1) % checkpoint_every == 0 and (it + 1) < iterations:
            r = r.localCheckpoint(eager=True)
    return r.select(F.col("_node").alias(node_col), F.col("_pr").alias("pagerank_scaled"))
