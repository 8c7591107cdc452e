"""Measure how wall time scales with data size across the 100× sf span.

Runs the scale-growing queries at sf0.001 / sf0.01 / sf0.1 (data sizes
1× / 10× / 100×) in one warmed session and reports, per query, the wall
times and the log-log slope between the two decades:

    slope ≈ 1.0  → linear in data (the target for scans/aggs/joins)
    slope ≈ 0.0  → fixed-overhead dominated (toy sizes; fine)
    slope  > 1.3 → super-linear — a pair blowup or shuffle explosion,
                   investigate before believing the 100 TB story.

Fixed-size queries (nation-derived geo toys) are excluded — their cost
is Spark constant overhead by construction. Usage:

    python tools/scale_curve.py [query ...]   # default: the scale set
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = [("0.001", 1.0), ("0.01", 10.0), ("0.1", 100.0)]
BASE = "/root/testdata/sf"

# Queries whose input grows with sf (fact tables / documents /
# embeddings / customer-derived grids).
SCALE_SET = [
    "q01_pricing_summary",
    "q22_revenue_by_nation",
    "q19_events_hourly",
    "d01_dedup_exact",
    "d06_minhash_lsh_jaccard",
    "d15_dup_clusters",
    "d19_corpus_clean",
    "d25_decontamination",
    "s01_cosine_topk",
    "s05_cosine_neardup",
    "g07_queen_borders_large",
    "g08_dorling_scalable_large",
    "g14_dorling_grid2500",
    "g10_pagerank_borders",
    "q47_kmv_sketch",
    "q48_replicated_skew_join",
    "q54_returned_items",
    "q56_large_volume_customers",
    "q59_zorder_skipping",
    "q60_bucketed_colocated_join",
    "d28_ngram_jaccard",
    "d29_segment_dup_rate",
    "g11_triangle_count",
    "m09_jpeg_pixels",
    # round-4 additions whose input grows with sf
    "q67_rollup_revenue",
    "q69_dpp_prune",
    "q71_lone_late_supplier",
    "q72_scd2_history",
    "q74_decile_stats",
    "d35_bloom_decontaminate",
    "m15_audio_frames",
    "m16_image_dhash",
    "s13_ivf_pq_topk",
    "q73_set_ops",
    "q75_observed_metrics",
    "q76_variant_json",
    "q77_schema_evolution",
    "q78_range_frame_window",
    "m17_gif_pixels",
    "m18_gif_frame_sample",
    "m19_mjpeg_avi_frames",
]


def main():
    names = sys.argv[1:] or SCALE_SET
    from ecmm428_pycart_spark.benchmarks import get_queries, queued
    from ecmm428_pycart_spark.benchmarks import queued6, queued7, queued8
    from ecmm428_pycart_spark.session import get_spark

    spark = get_spark("scale-curve")
    qs = dict(get_queries())
    qs.update(queued.QUERIES)   # round-5 queue is measurable too
    qs.update(queued6.QUERIES)  # round-6 queue likewise
    qs.update(queued7.QUERIES)  # round-7 overflow queue likewise
    qs.update(queued8.QUERIES)  # round-8 overflow queue likewise

    # warm JVM + python workers on the smallest sf so per-cell numbers
    # measure the work, not process startup
    for name in names:
        qs[name](spark, BASE + "0.001").count()

    rows = []
    for name in names:
        walls = []
        for sf, _mult in SFS:
            t0 = time.time()
            qs[name](spark, BASE + sf).count()
            walls.append(round(time.time() - t0, 3))
        # slope over the last decade (0.01 → 0.1), where data dominates
        # overhead the most; guard against sub-ms noise
        lo, hi = max(walls[1], 1e-3), max(walls[2], 1e-3)
        slope = round(math.log10(hi / lo), 3)
        rows.append({"query": name, "wall_s": dict(
            zip([s for s, _ in SFS], walls)), "decade_slope": slope})
        print(f"# {name}: {walls}  slope(0.01→0.1)={slope}",
              file=sys.stderr)

    print(json.dumps({"metric": "scale_curve", "rows": rows}))


if __name__ == "__main__":
    main()
