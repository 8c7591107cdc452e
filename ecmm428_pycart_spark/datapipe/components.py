"""Connected components over a pair graph — the clustering step that
turns near-duplicate PAIRS into dedup GROUPS (keep one doc per
component) at corpus scale.

Algorithm: min-label propagation to fixpoint. Each node's label starts
as itself; every iteration each node takes the min label in its closed
neighbourhood; converges in O(diameter) rounds. Per round: one join +
one groupBy (both shuffle on node id), localCheckpoint to keep the plan
flat — the same L3 loop shape as the scalable dorling and k-means.

Two round-latency levers (r12, profiled in docs/ROUND11_NOTES.md §9 —
on near-dup graphs the loop's driver-round latency, not the joins'
data volume, is the cost):

- The previous label rides along as ``old_label`` through the round's
  plan, so the convergence probe is a scan-and-count over the already
  materialized checkpoint instead of a separate prev⋈new shuffle join.
  That makes probing every round affordable, which in turn enables:
- The pointer-jump self-join (adopt label(label(node))) only engages
  from round 2 onward. Near-dup graphs are overwhelmingly diameter ≤ 2
  cliques/stars that converge under plain propagation in ≤ 3 rounds —
  for them the jump join never runs; genuinely chainy graphs pay at
  most two plain rounds before O(log n) doubling resumes.

Deterministic: labels are min() reductions — no ordering sensitivity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_iter: int = 20) -> DataFrame:
    """(node, component) for every node in `edges`; component = min node
    id reachable. Stops early when a round changes no label.

    Set ``SPARK_GRAFT_CC_LEGACY=1`` to run the pre-r12 loop (jump join
    every round, join-based probe every 2nd round) — the A side of
    tools/ab_components.py; results are identical either way."""
    if os.environ.get("SPARK_GRAFT_CC_LEGACY") == "1":
        return _legacy_connected_components(edges, src, dst, max_iter)
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
        nb_min = (sym.join(labels.select("node", "label"),
                           sym["b"] == F.col("node"))
                  .groupBy(F.col("a").alias("node2"))
                  .agg(F.min("label").alias("nb_label")))
        stepped = (labels.select("node", "label")
                   .join(nb_min, F.col("node") == nb_min["node2"], "left")
                   .select("node",
                           F.col("label").alias("old_label"),
                           F.least(F.col("label"),
                                   F.coalesce("nb_label", F.col("label")))
                           .alias("label")))
        if it >= 2:
            # pointer jumping: also adopt label(label(node)) — collapses
            # chains in O(log n) rounds instead of O(diameter). Deferred
            # past rounds 0-1: if the graph converges by then (the
            # near-dup common case) this self-join never runs.
            parent = stepped.select(F.col("node").alias("p_node"),
                                    F.col("label").alias("p_label"))
            stepped = (stepped.join(parent,
                                    stepped["label"] == parent["p_node"],
                                    "left")
                       .select("node", "old_label",
                               F.least(F.col("label"),
                                       F.coalesce("p_label", F.col("label")))
                               .alias("label")))
        new = stepped.localCheckpoint(eager=True)
        # old_label is already materialized alongside label, so this is
        # a count over the checkpoint — no join, no extra shuffle
        changed = new.filter(F.col("label") != F.col("old_label")).count()
        labels = new.select("node", "label")
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("component"))


def _legacy_connected_components(edges: DataFrame, src: str, dst: str,
                                 max_iter: int) -> DataFrame:
    """The pre-r12 loop, kept verbatim as the A/B baseline arm: pointer
    jump every round, convergence probe as a prev⋈new join every 2nd
    round."""
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
        stepped = (labels.join(nb_min, labels["node"] == nb_min["node2"],
                               "left")
                   .select("node",
                           F.least(F.col("label"),
                                   F.coalesce("nb_label", F.col("label")))
                           .alias("label")))
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
        if it % 2 == 1 or it == max_iter - 1:
            changed = (new.alias("n")
                       .join(prev.alias("o"), "node")
                       .filter(F.col("n.label") != F.col("o.label"))
                       .count())
            if changed == 0:
                break
    return labels.select(F.col("node"), F.col("label").alias("component"))
