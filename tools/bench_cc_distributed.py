"""Micro-bench: the distributed CC loop ABOVE the 500k-edge gate.

VERDICT r12 "what's missing" #1 / next-3: every bench-scale consumer's
near-dup graph is tiny (d15: 7.5k edges), so the hybrid gate routes
them all to the driver union-find and the distributed pointer-jump
loop — the path a 100 TB corpus with billions of duplicate pairs would
actually run — had correctness pins but no performance datum. This
tool puts measured points on BOTH paths either side of the 500k
default so the gate value is data, not vibes.

Synthetic graph, deterministic, generated DISTRIBUTED (spark.range +
explode — no driver-side edge list): 80% clique edges (blocks of 5
nodes, 10 edges each — the near-dup shape: LSH+verify leaves small
dense clusters) + 20% chain edges (paths of 21 nodes — the worst case
for label propagation, what the pointer jump exists for). Component
labels are checked equal between the two paths at every size (min
node id per block/path — cheap to predict, but we compare the full
label sets of the two paths against each other).

Per size, interleaved median-of-3 per arm:
- arm UF: ``SPARK_GRAFT_CC_LOCAL_MAX_EDGES`` above the size → gate
  collects and solves driver-side;
- arm DIST: ``SPARK_GRAFT_CC_LOCAL_MAX_EDGES=0`` → forced distributed
  pointer-jump loop.

The edge-list input is localCheckpointed by connected_components
itself, so timings exclude synthesis cost only on the first touch;
we pre-materialize per size to keep arms symmetric.

Usage: python tools/bench_cc_distributed.py [edge_counts...]
Defaults: 100_000 600_000 2_400_000. Run on an otherwise-idle machine.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_edges(spark, n_edges: int):
    """~n_edges edges: 80% from 5-node cliques, 20% from 21-node
    chains, node id spaces disjoint. All generation is native
    (range/explode), deterministic."""
    from pyspark.sql import functions as F

    n_cliques = (n_edges * 8 // 10) // 10        # 10 edges per clique
    n_chains = (n_edges * 2 // 10) // 20         # 20 edges per chain
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    cliq = (spark.range(n_cliques)
            .select((F.col("id") * 5).alias("base"),
                    F.explode(F.array(*[
                        F.struct(F.lit(i).alias("i"), F.lit(j).alias("j"))
                        for i, j in pairs])).alias("p"))
            .select((F.col("base") + F.col("p.i")).alias("doc_a"),
                    (F.col("base") + F.col("p.j")).alias("doc_b")))
    chain_base = n_cliques * 5 + 1_000_000_000
    chain = (spark.range(n_chains)
             .select((F.lit(chain_base) + F.col("id") * 21).alias("base"),
                     F.explode(F.sequence(F.lit(0), F.lit(19))).alias("k"))
             .select((F.col("base") + F.col("k")).alias("doc_a"),
                     (F.col("base") + F.col("k") + 1).alias("doc_b")))
    return cliq.unionByName(chain).localCheckpoint(eager=True)


def main() -> None:
    sizes = ([int(x) for x in sys.argv[1:]]
             or [100_000, 600_000, 2_400_000])

    from ecmm428_pycart_spark.datapipe.components import (
        connected_components)
    from ecmm428_pycart_spark.session import get_spark

    spark = get_spark("bench-cc-distributed")
    spark.range(10).count()  # warm

    def run(edges, forced: str) -> float:
        os.environ["SPARK_GRAFT_CC_LOCAL_MAX_EDGES"] = (
            "0" if forced == "dist" else str(2**40))
        t = time.time()
        connected_components(edges).count()
        spark.catalog.clearCache()
        return time.time() - t

    out = {"sizes": {}}
    for n in sizes:
        edges = synth_edges(spark, n)
        real_n = edges.count()
        # same labels on both paths (the hybrid contract) at this size
        os.environ["SPARK_GRAFT_CC_LOCAL_MAX_EDGES"] = "0"
        dist_lab = connected_components(edges)
        os.environ["SPARK_GRAFT_CC_LOCAL_MAX_EDGES"] = str(2**40)
        uf_lab = connected_components(edges)
        mismatch = (dist_lab.join(uf_lab.withColumnRenamed(
            "component", "c2"), "node")
            .filter("component != c2").count())
        assert mismatch == 0, f"label mismatch at {n}: {mismatch}"

        uf_runs, dist_runs = [], []
        for _ in range(3):                        # interleave arms
            uf_runs.append(run(edges, "uf"))
            dist_runs.append(run(edges, "dist"))
        uf = statistics.median(uf_runs)
        dist = statistics.median(dist_runs)
        out["sizes"][str(real_n)] = {
            "union_find_sec": round(uf, 3),
            "distributed_sec": round(dist, 3),
            "ratio_dist_over_uf": round(dist / uf, 2),
            "union_find_runs": [round(x, 3) for x in uf_runs],
            "distributed_runs": [round(x, 3) for x in dist_runs]}
        print(f"# {real_n} edges: union-find {uf:.2f}s "
              f"distributed {dist:.2f}s ({dist / uf:.2f}x)",
              file=sys.stderr)

    os.environ.pop("SPARK_GRAFT_CC_LOCAL_MAX_EDGES", None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
