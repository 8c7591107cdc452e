"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set covers each engine area: fact-table aggregation, the
multi-join revenue query, range join, event windows, minhash + simhash
dedup, cosine top-k, queen borders, and the dorling loop — weighted
toward the operators that dominate a real 100 TB run.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q12_running_fill",
    "q13_price_range_join",
    "q19_events_hourly",
    "q22_revenue_by_nation",
    "d05_minhash_signature",
    "d06_minhash_lsh_jaccard",
    "d07_simhash",
    "d14_tfidf_top_terms",
    "d15_dup_clusters",
    "d17_pii_scrub",
    "d19_corpus_clean",
    "d20_doc_chunks",
    "d21_seq_packing",
    "q43_gapfill",
    "q44_trailing_window",
    "s01_cosine_topk",
    "s05_cosine_neardup",
    "s07_ann_multiprobe",
    "s09_knn_join",
    "m03_image_meta",
    "st01_stream_hourly",
    "q42_salted_agg",
    "q41_e3_pipeline",
    "g02_queen_borders",
    "g07_queen_borders_large",
    "g04_dorling_positions",
    "g08_dorling_scalable_large",
    "g10_pagerank_borders",
    "q47_kmv_sketch",
    "q48_replicated_skew_join",
    "q49_constraint_report",
    "d24_weighted_sample",
    # round-3 additions: the families added since the r2 HEADLINE froze
    "q50_orc_roundtrip",
    "q51_forecast_revenue",
    "d25_decontamination",
    "d26_repetition_ratio",
    "d27_source_mix",
    "g09_noncontiguous_large",
    "st05_stream_interval_join",
    "st06_stream_dedup_bounded",
    "m06_png_pixels",
    "m07_wav_samples",
    "s10_neardup_banded",
    "q52_shipping_priority",
    "q53_local_supplier_volume",
    "d28_ngram_jaccard",
    "d29_segment_dup_rate",
    "m08_video_meta",
    "q54_returned_items",
    "q56_large_volume_customers",
    "q57_order_count_distribution",
    "g11_triangle_count",
    "q59_zorder_skipping",
    "m09_jpeg_pixels",
    "m10_color_jpeg",
    "st07_stream_foreach_upsert",
    "q60_bucketed_colocated_join",
    "q61_batch_merge_scd1",
    "q62_compaction_roundtrip",
    "st08_stream_static_enrich",
    "d30_gopher_rules",
    "d31_unigram_lm_score",
    "g12_knn_spatial",
    "q63_bilateral_shipping",
    "q64_priority_mix",
    "q65_time_travel",
    "q66_cohort_retention",
    "d33_token_drift",
    "g13_point_in_polygon",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from ecmm428_pycart_spark.benchmarks import get_queries
    from ecmm428_pycart_spark.session import get_spark

    spark = get_spark("pycart-spark-bench")
    qs = get_queries()

    # warm the JVM/session so per-query numbers measure the queries
    qs["q01_pricing_summary"](spark, sf_dir).count()

    timings = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()     # full execution, no driver collect
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {n} rows in {dt}s", file=sys.stderr)

    print(json.dumps({
        "metric": "headline_query_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
