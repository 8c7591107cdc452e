"""A/B: fresh per-query LM count-table build vs the r13 lm_store.

VERDICT r12 ask 1: the two slowest non-geo registry queries re-run the
same Stupid-Backoff count-table aggregation per call —
docs/PROFILE_q95_d19_r12.json pins q95's perplexity_buckets stage at
6.1–6.4s of its 8.1s end-to-end, and d43 is the same kernel over the
full corpus. Round 13 materializes the tables once per (corpus
fingerprint, code hash, variant) in ``datapipe/lm_store``.

This harness measures what that's worth on the three LM consumers in
ONE warmed session: arm A (``SPARK_GRAFT_LM_STORE_OFF=1``) = fresh
counting (the pre-r13 plan — consumers pass their own corpus as
``fresh_ref`` so arm A reproduces it exactly), arm B = store reads.
The store is pre-built before timing so arm B never pays the one-time
build (matching steady-state: at 100 TB the count tables are built
once per corpus snapshot, read per scoring run). The band/crawl stores
are warm in BOTH arms.

Also times the isolated perplexity_buckets STAGE on the full corpus
(the profiled wall), since q95's end-to-end includes dedup/mix/split
work the store can't touch.

Median-of-3 per arm per query, arms interleaved per run so host drift
hits both equally (the tools/ab_components.py protocol). Run on an
otherwise-idle machine.

Usage: python tools/ab_lm_store.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = ["d37_bigram_lm", "d43_perplexity_buckets",
         "q95_curation_pipeline"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ecmm428_pycart_spark.benchmarks import get_queries
    from ecmm428_pycart_spark.datapipe import lm_store as ls
    from ecmm428_pycart_spark.datapipe.text import perplexity_buckets
    from ecmm428_pycart_spark.session import get_spark, load_table

    spark = get_spark("ab-lm-store")
    qs = get_queries()
    qs["q01_pricing_summary"](spark, sf_dir).count()  # warm the session

    os.environ.pop("SPARK_GRAFT_LM_STORE_OFF", None)
    for variant in ls._VARIANTS:                      # pre-build arm B
        for t in ls.count_tables(spark, sf_dir, variant):
            t.count()

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def stage_fresh(spark_, sf_dir_):
        return perplexity_buckets(docs).groupBy("bucket").count()

    def stage_store(spark_, sf_dir_):
        return perplexity_buckets(docs, counts=ls.count_tables(
            spark_, sf_dir_, "documents", fresh_ref=docs)
        ).groupBy("bucket").count()

    def run(fn, off: bool) -> float:
        if off:
            os.environ["SPARK_GRAFT_LM_STORE_OFF"] = "1"
        else:
            os.environ.pop("SPARK_GRAFT_LM_STORE_OFF", None)
        t = time.time()
        fn(spark, sf_dir).count()
        spark.catalog.clearCache()
        return time.time() - t

    out = {"sf_dir": sf_dir, "queries": {}}
    targets = [("stage_perplexity_buckets", stage_store)] + [
        (n, qs[n]) for n in NAMES]
    for name, fn in targets:
        a_fn = stage_fresh if name == "stage_perplexity_buckets" else fn
        a_runs, b_runs = [], []
        for _ in range(3):                            # interleave arms
            a_runs.append(run(a_fn, off=True))
            b_runs.append(run(fn, off=False))
        a = statistics.median(a_runs)
        b = statistics.median(b_runs)
        out["queries"][name] = {
            "fresh_sec": round(a, 3), "store_sec": round(b, 3),
            "speedup": round(a / b, 2),
            "fresh_runs": [round(x, 3) for x in a_runs],
            "store_runs": [round(x, 3) for x in b_runs]}
        print(f"# {name}: fresh {a:.2f}s store {b:.2f}s "
              f"({a / b:.2f}x)", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
