"""Connected components over a pair graph — the clustering step that
turns near-duplicate PAIRS into dedup GROUPS (keep one doc per
component) at corpus scale.

Algorithm: min-label propagation to fixpoint. Each node's label starts
as itself; every iteration each node takes the min label in its closed
neighbourhood; converges in O(diameter) rounds. Per round: one join +
one groupBy (both shuffle on node id), localCheckpoint to keep the plan
flat — the same L3 loop shape as the scalable dorling and k-means.

Deterministic: labels are min() reductions — no ordering sensitivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_iter: int = 20) -> DataFrame:
    """(node, component) for every node in `edges`; component = min node
    id reachable. Stops early when a round changes no label."""
    # materialize the edge list once — it is re-joined every round, and
    # upstream it is typically an expensive pipeline (minhash LSH +
    # jaccard verify) that must not re-execute per iteration
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b")))
           .distinct()
           .localCheckpoint(eager=True))
    labels = (sym.select(F.col("a").alias("node"))
              .distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    for it in range(max_iter):
        nb_min = (sym.join(labels, sym["b"] == labels["node"])
                  .groupBy(F.col("a").alias("node2"))
                  .agg(F.min("label").alias("nb_label")))
        stepped = (labels.join(nb_min, labels["node"] == nb_min["node2"], "left")
                   .select("node",
                           F.least(F.col("label"),
                                   F.coalesce("nb_label", F.col("label")))
                           .alias("label")))
        # pointer jumping: also adopt label(label(node)) — collapses
        # chains in O(log n) rounds instead of O(diameter)
        parent = stepped.select(F.col("node").alias("p_node"),
                                F.col("label").alias("p_label"))
        new = (stepped.join(parent,
                            stepped["label"] == parent["p_node"], "left")
               .select("node",
                       F.least(F.col("label"),
                               F.coalesce("p_label", F.col("label")))
                       .alias("label"))
               .localCheckpoint(eager=True))
        prev = labels
        labels = new
        # convergence check costs a join + count action per probe; with
        # pointer jumping rounds are O(log n), so probing every 2nd round
        # (at worst one redundant cheap round) halves the driver actions
        if it % 2 == 1 or it == max_iter - 1:
            changed = (new.alias("n")
                       .join(prev.alias("o"), "node")
                       .filter(F.col("n.label") != F.col("o.label"))
                       .count())
            if changed == 0:
                break
    return labels.select(F.col("node"), F.col("label").alias("component"))
