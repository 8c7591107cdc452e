"""Interleaved A/B of the dorling-setup spread_small lever (and, as a
third arm, the candidate-join broadcast hint) on the dorling consumers.

MEASURED FLAT/NEGATIVE AND REVERTED (docs/AB_DORLING_r13.md): the
levers this tool toggles are NOT in the shipped tree — re-applying the
two snippets in that doc is required before the arms differ again; on
the shipped tree all three arms build identical plans (the env vars
are read by code that the revert removed / by spread sites the dorling
path no longer contains).

The hypothesis was the r13b finding applied everywhere EXCEPT the geo
family: the benchmark grids derive from single-file scans, so
`_dorling_setup`'s eager checkpoint pinned base at ONE partition and
every setup branch (WKB ingest UDF, vertex explode, border-weight UDF,
centroid/perimeter Arrow UDFs over all polygons) ran single-task. Arms:

  off     — SPARK_GRAFT_SPREAD_OFF=1, SPARK_GRAFT_DORLING_BCAST_OFF=1
            (the r13d tree's plans)
  spread  — setup spread on, broadcast hint off
  both    — setup spread on + candidate-join broadcast hint on

Each arm rebuilds the query from the grid up in one warmed session
(envs are read at plan-build time); rows are asserted identical across
arms per target. Median over `rounds` interleaved runs.

Usage: python tools/ab_dorling_spread.py [rounds] [sf_dir]
Run on an idle host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = {
    "off": {"SPARK_GRAFT_SPREAD_OFF": "1", "SPARK_GRAFT_DORLING_BCAST_OFF": "1"},
    "spread": {"SPARK_GRAFT_SPREAD_OFF": "0", "SPARK_GRAFT_DORLING_BCAST_OFF": "1"},
    "both": {"SPARK_GRAFT_SPREAD_OFF": "0", "SPARK_GRAFT_DORLING_BCAST_OFF": "0"},
}


def build(spark, sf_dir, which):
    from pyspark.sql import functions as F

    from ecmm428_pycart_spark.benchmarks.geo_queries import (_customer_grid,
                                                             _grid,
                                                             _orders_grid)
    from ecmm428_pycart_spark.plans.cartogram import Cartogram

    chk = lambda c: F.sum(F.round(F.col(c) * 10000, 0).cast("long")) \
        .alias(f"{c}_chk")
    if which == "g04":
        cart = Cartogram(_grid(spark, sf_dir), "value", "n_name",
                         idx_field="region_idx")
        out = cart.dorling(iterations=5, mode="reference")
        return out.select("n_name", F.round("cx", 4).alias("cx"),
                          F.round("cy", 4).alias("cy"),
                          F.round("radius", 4).alias("radius"))
    grid = (_customer_grid if which == "g08" else _orders_grid)(spark, sf_dir)
    cart = Cartogram(grid, "value", "region_idx", idx_field="region_idx")
    out = cart.dorling(iterations=3, mode="scalable")
    return out.agg(F.count(F.lit(1)).alias("n"),
                   chk("cx"), chk("cy"), chk("radius"))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from ecmm428_pycart_spark.session import get_spark
    spark = get_spark("ab-dorling-spread")
    out = {}
    for which in ("g08", "g14", "g04"):
        runs = {a: [] for a in ARMS}
        rows = {}
        # ADVICE r13: SPARK_GRAFT_SPREAD_OFF is a PROCESS-GLOBAL kill
        # switch on every spread site, not a dorling-specific lever —
        # if the arms' plans don't differ, this A/B would silently
        # measure the global toggle (or nothing). Refuse to time arms
        # whose built plans are identical; after re-applying the
        # AB_DORLING_r13.md snippets, gate them behind their own env
        # var so the off arm toggles only the dorling sites.
        plans = {}
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
            .fromString("formatted")
        for arm, env in ARMS.items():
            os.environ.update(env)
            plans[arm] = build(spark, sf_dir, which) \
                ._jdf.queryExecution().explainString(mode)
        if plans["off"] == plans["spread"] == plans["both"]:
            sys.exit(f"{which}: all three arms build IDENTICAL plans — "
                     "the dorling levers are not applied in this tree "
                     "(they were reverted; see docs/AB_DORLING_r13.md). "
                     "Re-apply the snippets before running this A/B.")
        for arm, env in ARMS.items():          # warmup each arm once
            os.environ.update(env)
            build(spark, sf_dir, which).count()
        for _ in range(rounds):
            for arm, env in ARMS.items():
                os.environ.update(env)
                spark.catalog.clearCache()
                t0 = time.time()
                df = build(spark, sf_dir, which)
                rows[arm] = sorted(tuple(r) for r in df.collect())
                runs[arm].append(round(time.time() - t0, 2))
        med = lambda v: sorted(v)[len(v) // 2]
        out[which] = {a: {"runs": runs[a], "median": med(runs[a])}
                      for a in ARMS}
        out[which]["speedup_spread"] = round(
            med(runs["off"]) / max(med(runs["spread"]), 1e-9), 2)
        out[which]["speedup_both"] = round(
            med(runs["off"]) / max(med(runs["both"]), 1e-9), 2)
        out[which]["rows_identical"] = (
            rows["off"] == rows["spread"] == rows["both"])
        assert out[which]["rows_identical"], f"{which}: arm outputs differ!"
    for k in ("SPARK_GRAFT_SPREAD_OFF", "SPARK_GRAFT_DORLING_BCAST_OFF"):
        os.environ.pop(k, None)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
