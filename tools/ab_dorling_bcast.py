"""Interleaved A/B of the dorling candidate-join broadcast hint
(`distance_range_self_join(..., broadcast_neighbors=small)`) on the
scalable-mode consumers g08 (15k regions) and g14 (2500 regions).

MEASURED FLAT AND REVERTED (docs/AB_DORLING_r13.md): the
`broadcast_neighbors` param is NOT in the shipped tree; re-apply the
snippet in that doc before this tool's arms differ again.

Arms toggle `SPARK_GRAFT_DORLING_BCAST_OFF` (read at plan-build time),
so both run in one warmed session, interleaved A,B,A,B,... per round;
median of the per-arm runs is reported. Each run rebuilds the full
query from the grid up (no state reuse) and forces it with .count().

Usage: python tools/ab_dorling_bcast.py [rounds] [sf_dir]
Run on an idle host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, sf_dir, which):
    from pyspark.sql import functions as F

    from ecmm428_pycart_spark.benchmarks.geo_queries import (_customer_grid,
                                                             _orders_grid)
    from ecmm428_pycart_spark.plans.cartogram import Cartogram

    grid = (_customer_grid if which == "g08" else _orders_grid)(spark, sf_dir)
    cart = Cartogram(grid, "value", "region_idx", idx_field="region_idx")
    out = cart.dorling(iterations=3, mode="scalable")
    chk = lambda c: F.sum(F.round(F.col(c) * 10000, 0).cast("long")) \
        .alias(f"{c}_chk")
    return out.agg(F.count(F.lit(1)).alias("n"),
                   chk("cx"), chk("cy"), chk("radius"))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from ecmm428_pycart_spark.session import get_spark
    spark = get_spark("ab-dorling-bcast")
    out = {}
    for which in ("g08", "g14"):
        runs = {"off": [], "on": []}
        rows = {}
        # warmup both arms once (codegen/broadcast-thread warmup)
        for arm in ("off", "on"):
            os.environ["SPARK_GRAFT_DORLING_BCAST_OFF"] = \
                "1" if arm == "off" else "0"
            build(spark, sf_dir, which).count()
        for _ in range(rounds):
            for arm in ("off", "on"):
                os.environ["SPARK_GRAFT_DORLING_BCAST_OFF"] = \
                    "1" if arm == "off" else "0"
                spark.catalog.clearCache()
                t0 = time.time()
                df = build(spark, sf_dir, which)
                rows[arm] = [tuple(r) for r in df.collect()]
                runs[arm].append(round(time.time() - t0, 2))
        med = lambda v: sorted(v)[len(v) // 2]
        out[which] = {
            "off_runs": runs["off"], "on_runs": runs["on"],
            "off_median": med(runs["off"]), "on_median": med(runs["on"]),
            "speedup": round(med(runs["off"]) / max(med(runs["on"]), 1e-9), 2),
            "rows_identical": rows["off"] == rows["on"],
        }
        assert rows["off"] == rows["on"], f"{which}: arm outputs differ!"
    os.environ.pop("SPARK_GRAFT_DORLING_BCAST_OFF", None)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
