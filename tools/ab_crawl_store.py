"""A/B: per-query corpus re-extraction vs the write-once crawl store.

VERDICT r9 next-3: the crawl-macro queries each re-ran the same
corpus-linear Arrow extraction over ``documents`` (WARC/HTML walk for
q133/q137, href extraction for d93/d94/g41, media decode for m52).
Round 10 moved them onto ``datapipe/crawl_store`` — this harness
measures what that's worth, per query, in ONE warmed session:

- arm A (``SPARK_GRAFT_CRAWL_STORE_OFF=1``): the pre-round-10 shape —
  full extraction pass per run.
- arm B: the store path — doc_id-clustered parquet scan per run. The
  one-time build of each derived table is timed separately and
  reported as ``build_sec`` (first-consumer cost, paid once per
  corpus).

Median-of-3 per arm per query, cache cleared between runs, A/B
interleaved per query so host drift hits both arms equally (the
tools/ab_borders_store.py protocol).

Usage: python tools/ab_crawl_store.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = ["q133_crawl_pipeline", "q137_crawl_search",
         "d93_outlink_graph", "d94_crawl_frontier",
         "g41_host_pagerank", "m52_warc_media_dispatch"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ecmm428_pycart_spark.benchmarks import get_queries
    from ecmm428_pycart_spark.datapipe import crawl_store as cs
    from ecmm428_pycart_spark.session import get_spark

    spark = get_spark("ab-crawl-store")
    qs = get_queries()
    qs["q01_pricing_summary"](spark, sf_dir).count()  # warm the session

    # fresh store for this measurement: build cost is observed, not
    # inherited from an earlier session
    root = cs._store_root()
    shutil.rmtree(root, ignore_errors=True)
    os.environ.pop("SPARK_GRAFT_CRAWL_STORE_OFF", None)
    build_sec = {}
    for kind, fn in [("html", cs.crawl_html), ("links", cs.crawl_links),
                     ("media", cs.crawl_media)]:
        t0 = time.time()
        fn(spark, sf_dir).count()
        build_sec[kind] = round(time.time() - t0, 3)

    def run(name: str, off: bool) -> float:
        if off:
            os.environ["SPARK_GRAFT_CRAWL_STORE_OFF"] = "1"
        else:
            os.environ.pop("SPARK_GRAFT_CRAWL_STORE_OFF", None)
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
            "extract_sec": round(a, 3), "store_sec": round(b, 3),
            "speedup": round(a / b, 2),
            "extract_runs": [round(x, 3) for x in a_runs],
            "store_runs": [round(x, 3) for x in b_runs]}
        print(f"# {name}: extract {a:.2f}s store {b:.2f}s "
              f"({a / b:.2f}x)", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
