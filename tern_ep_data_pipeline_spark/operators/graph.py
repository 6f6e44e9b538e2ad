"""Distributed graph primitives for dedup clustering.

Near-dup detection (MinHash/SimHash/embedding blocking) yields *pairs*;
turning pairs into keep/drop decisions needs the transitive closure — a
connected-components pass that assigns every document the canonical
(minimum) id of its duplicate cluster. The reference pipeline has no
equivalent (its dedup is row-exact only); this is part of the
training-data mandate's scale surface.

Algorithm: iterative min-label propagation with pointer jumping
(path halving), the DataFrame rendition of the classic MapReduce
connected-components schemes (Kiveris et al., "Connected Components in
MapReduce and Beyond"). Each round is two shuffles:

1. neighbour-min — every node adopts the smallest label in its closed
   neighbourhood (`groupBy(node).min(label)` over the symmetric edge
   list joined to current labels);
2. pointer jump — every node re-reads its label's *own* label
   (`labels ⋈ labels on label = node`), halving chain lengths so
   convergence is O(log diameter) rounds, not O(diameter).

Labels are node ids, so the result is deterministic (min id per
component) regardless of partitioning, retries, or cluster size. Each
round ends in ``localCheckpoint`` to truncate lineage — an iterative
plan otherwise doubles in depth per round and overwhelms the planner
long before the data is the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns ``(node, component)`` where ``component`` is the minimum node
    id in the node's component — the canonical-document convention used
    by every dedup consumer. Only nodes that appear in ``edges`` are
    returned (isolated nodes are their own trivial components and carry
    no dedup information).

    Raises ``RuntimeError`` if ``max_iter`` rounds don't converge —
    pathological for real near-dup graphs, whose components are small
    and dense; the pointer jump makes even a path graph converge in
    O(log n) rounds.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # 1. neighbour-min over the closed neighbourhood
        nbr = sym.join(
            labels.withColumnRenamed("node", "b"), on="b"
        ).select(F.col("a").alias("node"), "label")
        stepped = (
            nbr.unionByName(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # 2. pointer jump: label <- label(label); labels are node ids so
        # the self-join always finds the row, but stay safe under
        # coalesce for the (impossible) miss. The right side is re-aliased
        # column-by-column: plain DataFrame.alias keeps the original
        # expression ids on both branches of a self-join and Catalyst can
        # mis-resolve them under complex upstream plans.
        right = stepped.select(
            F.col("node").alias("ptr_node"), F.col("label").alias("ptr_label")
        )
        jumped = stepped.join(
            right, stepped["label"] == right["ptr_node"], "left"
        ).select(
            "node",
            F.coalesce(F.col("ptr_label"), F.col("label")).alias("label"),
        )
        new_labels = jumped.localCheckpoint()

        prev = labels.select(
            F.col("node").alias("prev_node"), F.col("label").alias("prev_label")
        )
        changed = (
            new_labels.join(prev, new_labels["node"] == prev["prev_node"])
            .where(F.col("label") != F.col("prev_label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Cluster assignment from near-dup pairs: ``(node, component)`` with
    the canonical (min-id) member as the component id. Keep one doc per
    component via ``component = node``; drop the rest."""
    return connected_components(pairs, src=id_a, dst=id_b)
