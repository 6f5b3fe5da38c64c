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
