"""Interleaved A/B of the r14 graph lazy-checkpoint lever
(datapipe/graph._ckpt, also imported by components.py and the g10/g41
pagerank loops): localCheckpoint(eager=False) on every graph-loop
checkpoint — identical compiled plans; loops with a per-round
convergence count run one job per round instead of two, fixed-round
loops fold entirely into the terminal action.

Arms (the registry queries the driver benches, timed with .count()):

  eager — SPARK_GRAFT_GRAPH_LAZYCKPT_OFF=1 (the r13 per-round jobs)
  lazy  — the shipped default

Per-arm Spark job counts recorded via job groups; arm outputs asserted
identical (full sorted-row comparison).

Usage: SPARK_GRAFT_CPUS=N python tools/ab_graph_lazy.py [rounds] [sf_dir] [query ...]
Pass AB_LAZY_ENV=<off-env-var> to A/B a different lazy-ckpt switch
(e.g. SPARK_GRAFT_TEXT_LAZYCKPT_OFF for the BPE chains) over an
explicit query list.
Run on an idle host.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = {"eager": "1", "lazy": "0"}
OFF_ENV = os.environ.get("AB_LAZY_ENV", "SPARK_GRAFT_GRAPH_LAZYCKPT_OFF")
DEFAULT_QUERIES = ("g17_k_core", "g19_label_propagation",
                   "g22_personalized_pagerank", "g10_pagerank_borders",
                   "g41_host_pagerank")


def build(spark, sf_dir, which):
    from ecmm428_pycart_spark.benchmarks import get_queries
    return get_queries()[which](spark, sf_dir)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    queries = tuple(sys.argv[3:]) or DEFAULT_QUERIES
    from ecmm428_pycart_spark.session import get_spark
    spark = get_spark("ab-graph-lazy")
    sc = spark.sparkContext
    out = {"cpus": sc.defaultParallelism, "rounds": rounds}

    for which in queries:
        runs = {a: [] for a in ARMS}
        rows = {}
        jobs = {}
        for arm, off in ARMS.items():          # warmup + output capture
            os.environ[OFF_ENV] = off
            rows[arm] = sorted(tuple(r) for r in
                               build(spark, sf_dir, which).collect())
            spark.catalog.clearCache()
        for rep in range(rounds):
            for arm, off in ARMS.items():
                os.environ[OFF_ENV] = off
                tag = f"{which}-{arm}-{rep}"
                sc.setJobGroup(tag, tag)
                t0 = time.time()
                build(spark, sf_dir, which).count()
                runs[arm].append(round(time.time() - t0, 2))
                sc.setLocalProperty("spark.jobGroup.id", None)
                jobs[arm] = len(sc.statusTracker().getJobIdsForGroup(tag))
                spark.catalog.clearCache()
        os.environ.pop(OFF_ENV, None)
        med = lambda v: round(statistics.median(v), 2)
        out[which] = {
            a: {"runs": runs[a], "median": med(runs[a]),
                "spark_jobs_per_query": jobs[a]} for a in ARMS}
        out[which]["speedup_lazy"] = round(
            med(runs["eager"]) / max(med(runs["lazy"]), 1e-9), 2)
        out[which]["rows_identical"] = rows["eager"] == rows["lazy"]
        assert out[which]["rows_identical"], f"{which}: arm outputs differ!"
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
