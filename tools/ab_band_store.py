"""A/B: per-query MinHash re-hashing vs the write-once band-index store.

VERDICT r10 next-4: the LSH-dedup queries each re-ran the same
corpus-linear MinHash pass (shingle explode → 8 md5-min aggregates →
banding) before their own work. Round 11 moved them onto
``datapipe/band_store`` — this harness measures what that's worth,
per query, in ONE warmed session:

- arm A (``SPARK_GRAFT_BAND_STORE_OFF=1``): the pre-round-11 shape —
  full MinHash+banding pass per run.
- arm B: the store path — a (doc_id, band, band_key) parquet scan
  (plus the consumer's own semi-join/cap/self-join) per run. The
  one-time build of each variant's index is timed separately and
  reported as ``build_sec`` (first-consumer cost, paid once per
  corpus).

The crawl store stays ON and pre-warmed in BOTH arms so the
measurement isolates the band store's contribution (q133's extraction
prefix is identical across arms).

Median-of-3 per arm per query, cache cleared between runs, A/B
interleaved per query so host drift hits both arms equally (the
tools/ab_borders_store.py protocol).

Usage: python tools/ab_band_store.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = ["d06_minhash_lsh_jaccard", "d15_dup_clusters",
         "d18_dedup_canonical", "d19_corpus_clean",
         "d70_retention_policy", "d95_twostage_neardup",
         "q133_crawl_pipeline", "q136_quality_cascade"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ecmm428_pycart_spark.benchmarks import get_queries
    from ecmm428_pycart_spark.datapipe import band_store as bs
    from ecmm428_pycart_spark.datapipe import crawl_store as cs
    from ecmm428_pycart_spark.session import get_spark

    spark = get_spark("ab-band-store")
    qs = get_queries()
    qs["q01_pricing_summary"](spark, sf_dir).count()  # warm the session

    # crawl store warm in BOTH arms (q133's extraction prefix must be
    # identical across arms so the diff is the band store alone)
    os.environ.pop("SPARK_GRAFT_CRAWL_STORE_OFF", None)
    cs.crawl_html(spark, sf_dir).count()

    # fresh band store for this measurement: build cost is observed,
    # not inherited from an earlier session
    shutil.rmtree(bs._store_root(), ignore_errors=True)
    os.environ.pop("SPARK_GRAFT_BAND_STORE_OFF", None)
    build_sec = {}
    for variant in bs._VARIANTS:
        t0 = time.time()
        bs.band_index(spark, sf_dir, variant).count()
        build_sec[variant] = round(time.time() - t0, 3)

    def run(name: str, off: bool) -> float:
        if off:
            os.environ["SPARK_GRAFT_BAND_STORE_OFF"] = "1"
        else:
            os.environ.pop("SPARK_GRAFT_BAND_STORE_OFF", None)
        t = time.time()
        qs[name](spark, sf_dir).count()
        spark.catalog.clearCache()
        return time.time() - t

    out = {"sf_dir": sf_dir, "build_sec": build_sec, "queries": {}}
    for name in NAMES:
        a_runs, b_runs = [], []
        for _ in range(3):                      # interleave arms
            a_runs.append(run(name, off=True))
            b_runs.append(run(name, off=False))
        a = statistics.median(a_runs)
        b = statistics.median(b_runs)
        out["queries"][name] = {
            "hash_sec": round(a, 3), "store_sec": round(b, 3),
            "speedup": round(a / b, 2),
            "hash_runs": [round(x, 3) for x in a_runs],
            "store_runs": [round(x, 3) for x in b_runs]}
        print(f"# {name}: hash {a:.2f}s store {b:.2f}s "
              f"({a / b:.2f}x)", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
