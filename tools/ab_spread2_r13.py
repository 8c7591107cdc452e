"""A/B the second r13b spread set: the jaccard_pairs verify-stage
spread (``session.spread_cpu``) and the d35/d25 shingle-explode scan
spreads.

Arms: A = ``SPARK_GRAFT_SPREAD_OFF=1`` at build time (reproduces the
pre-change plans exactly — both spread helpers check the env when the
query is built), B = spreads live. Protocol: one warmed session, arms
interleaved per run, median-of-3, untimed per-arm warmup, ``.count()``
timed action, clearCache between runs, idle host.

Usage: python tools/ab_spread2_r13.py [sf_dir] [query ...]
       (default sf0.1; default query set = the bench-relevant
        jaccard_pairs consumers + d25/d35)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = ["d28_ngram_jaccard", "d35_bloom_decontaminate",
           "d25_decontamination", "d06_minhash_lsh_jaccard",
           "d15_dup_clusters", "d19_corpus_clean",
           "q133_crawl_pipeline", "d95_twostage_neardup"]


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or DEFAULT
    from ecmm428_pycart_spark.benchmarks import get_queries
    from ecmm428_pycart_spark.session import get_spark

    spark = get_spark("ab-spread2")
    qs = get_queries()
    qs["q01_pricing_summary"](spark, sf_dir).count()  # warm

    def build(name, off):
        if off:
            os.environ["SPARK_GRAFT_SPREAD_OFF"] = "1"
        try:
            return qs[name](spark, sf_dir)
        finally:
            os.environ.pop("SPARK_GRAFT_SPREAD_OFF", None)

    out = {}
    for name in names:
        runs = {"old": [], "new": []}
        rows = {}
        for arm, off in (("old", True), ("new", False)):
            build(name, off).count()  # untimed warmup
            spark.catalog.clearCache()
        for _ in range(3):
            for arm, off in (("old", True), ("new", False)):
                spark.sparkContext.setJobDescription(f"ab2:{name}:{arm}")
                t0 = time.time()
                rows[arm] = build(name, off).count()
                runs[arm].append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
        assert rows["old"] == rows["new"], (name, rows)
        med_o = statistics.median(runs["old"])
        med_n = statistics.median(runs["new"])
        out[name] = {"old_runs": runs["old"], "new_runs": runs["new"],
                     "old_median": med_o, "new_median": med_n,
                     "speedup": round(med_o / med_n, 2), "rows": rows["new"]}
        print(name, "old", med_o, "new", med_n,
              "speedup", out[name]["speedup"], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
