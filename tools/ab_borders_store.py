"""A/B: per-query geometry rebuild vs the write-once borders store.

VERDICT r8 next-4: the heaviest registry queries (g10/g17/g19/g22/
g29/g31) each rebuilt the queen-borders graph of the customer grid
before iterating. Round 9 moved them onto
``datapipe/borders_store.customer_borders`` — this harness measures
what that's worth, per query, in ONE warmed session:

- arm A (``SPARK_GRAFT_BORDERS_STORE_OFF=1``): the pre-round-9 shape —
  full geometry build (WKT→WKB, vertex explode, weight UDF) per run.
- arm B: the store path — focal-clustered parquet scan per run. The
  one-time store build is timed separately and reported as
  ``build_sec`` (it is the first-consumer cost, paid once per sf).

Median-of-3 per arm per query, cache cleared between runs, A/B
interleaved per query so host drift hits both arms equally.

Usage: python tools/ab_borders_store.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = ["g10_pagerank_borders", "g17_k_core", "g19_label_propagation",
         "g22_personalized_pagerank", "g29_hits_scores",
         "g31_lpa_modularity"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ecmm428_pycart_spark.benchmarks import get_queries
    from ecmm428_pycart_spark.datapipe import borders_store as bs
    from ecmm428_pycart_spark.session import get_spark

    spark = get_spark("ab-borders-store")
    qs = get_queries()
    qs["q01_pricing_summary"](spark, sf_dir).count()  # warm the session

    # fresh store for this measurement: build cost is observed, not
    # inherited from an earlier session
    root = bs._store_root()
    shutil.rmtree(root, ignore_errors=True)
    os.environ.pop("SPARK_GRAFT_BORDERS_STORE_OFF", None)
    t0 = time.time()
    bs.customer_borders(spark, sf_dir).count()
    build_sec = round(time.time() - t0, 3)

    def run(name: str, off: bool) -> float:
        if off:
            os.environ["SPARK_GRAFT_BORDERS_STORE_OFF"] = "1"
        else:
            os.environ.pop("SPARK_GRAFT_BORDERS_STORE_OFF", None)
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
            "rebuild_sec": round(a, 3), "store_sec": round(b, 3),
            "speedup": round(a / b, 2),
            "rebuild_runs": [round(x, 3) for x in a_runs],
            "store_runs": [round(x, 3) for x in b_runs]}
        print(f"# {name}: rebuild {a:.2f}s store {b:.2f}s "
              f"({a / b:.2f}x)", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
