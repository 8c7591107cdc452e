"""A/B the round-13b levers: map-stage spreading (m19 / m12 / d60) and
the q71 two-level-aggregation rewrite.

Arms:
- m19/m12/d60: A = `SPARK_GRAFT_SPREAD_OFF=1` semantics (reproduces the
  pre-change single-task plans exactly — the env is flipped around the
  query build, which is when spread_small runs), B = spread live.
- q71: A = the pre-change double-countDistinct aggregation built inline
  (verbatim pre-r13b shape), B = the registered two-level rewrite.

Protocol (the repo standard): one warmed session, arms interleaved
A,B,A,B,... median-of-3 per arm, `.count()` as the timed action,
clearCache between runs, idle host. Usage:

    python tools/ab_spread_q71.py [sf_dir]     (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def q71_old(spark, sf_dir):
    """Verbatim pre-r13b q71 aggregation (double countDistinct)."""
    from pyspark.sql import functions as F

    from ecmm428_pycart_spark.session import load_table as _t
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAY")
    flagged = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
               .select("l_orderkey", "l_suppkey",
                       F.when(late, F.col("l_suppkey")).alias("late_supp")))
    per_order = (flagged.groupBy("l_orderkey")
                 .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                      F.countDistinct("late_supp").alias("n_late"),
                      F.max("late_supp").alias("the_late_supp"))
                 .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1)))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (per_order.join(F.broadcast(supp),
                           F.col("the_late_supp") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait")))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from ecmm428_pycart_spark.benchmarks import get_queries
    from ecmm428_pycart_spark.session import get_spark

    spark = get_spark("ab-spread-q71")
    qs = get_queries()
    qs["q01_pricing_summary"](spark, sf_dir).count()  # warm

    def build_off(fn):
        """Build the df with spreading disabled (spread_small runs at
        BUILD time, so the env only needs to be set around the build)."""
        def thunk():
            os.environ["SPARK_GRAFT_SPREAD_OFF"] = "1"
            try:
                return fn(spark, sf_dir)
            finally:
                os.environ.pop("SPARK_GRAFT_SPREAD_OFF", None)
        return thunk

    targets = {
        "m19_mjpeg_avi_frames": (build_off(qs["m19_mjpeg_avi_frames"]),
                                 lambda: qs["m19_mjpeg_avi_frames"](spark, sf_dir)),
        "m12_resize_pixels": (build_off(qs["m12_resize_pixels"]),
                              lambda: qs["m12_resize_pixels"](spark, sf_dir)),
        "d60_winnow_dup": (build_off(qs["d60_winnow_dup"]),
                           lambda: qs["d60_winnow_dup"](spark, sf_dir)),
        "q71_lone_late_supplier": (lambda: q71_old(spark, sf_dir),
                                   lambda: qs["q71_lone_late_supplier"](spark, sf_dir)),
        # the text.py scored/ref-side spread (store-served count tables,
        # so the A arm isolates exactly the r13b spread delta)
        "d43_perplexity_buckets": (build_off(qs["d43_perplexity_buckets"]),
                                   lambda: qs["d43_perplexity_buckets"](spark, sf_dir)),
        "q95_curation_pipeline": (build_off(qs["q95_curation_pipeline"]),
                                  lambda: qs["q95_curation_pipeline"](spark, sf_dir)),
    }

    out = {}
    for name, (old_build, new_build) in targets.items():
        runs = {"old": [], "new": []}
        rows = {}
        # one untimed warmup pass per arm (codegen + python workers)
        for arm, build in (("old", old_build), ("new", new_build)):
            build().count()
            spark.catalog.clearCache()
        for _ in range(3):
            for arm, build in (("old", old_build), ("new", new_build)):
                spark.sparkContext.setJobDescription(f"ab:{name}:{arm}")
                t0 = time.time()
                rows[arm] = build().count()
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
