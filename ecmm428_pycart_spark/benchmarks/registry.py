"""Assembles the full named-query registry from the per-area modules.

The driver's correctness gate evaluates the FIRST ~50 entries of
``queries()`` (observed cap in CORRECTNESS_r01/r02), so insertion order
is load-bearing: round 2's module-concatenation order silently left the
entire geo macro family (g01-g10 — the reference-parity surface,
pycart/cartogram.py:172-414) and the dedup/similarity families outside
the gate. DRIVER_WINDOW below is an explicit curated prefix that covers
every SURVEY.md §2 operator row and at least one representative of
every LLM-data-pipeline family; tests/test_gate_coverage.py enforces
that property so a future edit can't regress it silently. Everything
not in the window still registers (after it, in module order) and stays
covered by tools/verify_oracle.py.
"""

from __future__ import annotations

from ecmm428_pycart_spark.benchmarks import relational

# Curated gate prefix — ROUND-4 ROTATION (VERDICT r3 next-3): rounds
# 1-3 left 56 registered queries never driver-oracle-checked. This
# window is drawn from exactly that set (plus this round's new
# m11/m12/g14), keeping three §2 sentinels (q01 = relational core,
# g02 = queen borders, g04 = reference-parity dorling) as canaries for
# the previously-green surface. Everything green in r1-r3 plus the
# DEFERRED_TO_NEXT_ROUND list below stays registered and
# verify_oracle-covered; tests/test_gate_coverage.py pins the rotation
# invariant (every registered query gate-checked within 2 consecutive
# rounds).
DRIVER_WINDOW = [
    # ROUND-12 ROTATION (evidence freshness): the 48 queries
    # with the OLDEST committed PASSING driver-gate rows,
    # re-gated on the current tree + two sentinels.
    # Computed by tools/apply_round12.py from CORRECTNESS_r*.
    "q01_pricing_summary",
    "g04_dorling_positions",
    "d31_unigram_lm_score",
    "d33_token_drift",
    "g02_queen_borders",
    "g11_triangle_count",
    "g12_knn_spatial",
    "g13_point_in_polygon",
    "g14_dorling_grid2500",
    "m01_multimodal_meta",
    "m02_decode_features",
    "m07_wav_samples",
    "m08_video_meta",
    "m10_color_jpeg",
    "m11_palette_png",
    "m12_resize_pixels",
    "q41_e3_pipeline",
    "q44_trailing_window",
    "q46_equidepth_hist",
    "q52_shipping_priority",
    "q60_bucketed_colocated_join",
    "q61_batch_merge_scd1",
    "q62_compaction_roundtrip",
    "q63_bilateral_shipping",
    "q65_time_travel",
    "q66_cohort_retention",
    "s03_centroid_assign",
    "s04_ivf_probe",
    "s05_cosine_neardup",
    "s07_ann_multiprobe",
    "s10_neardup_banded",
    "s11_pq_codes",
    "s12_pq_adc_rerank",
    "st07_stream_foreach_upsert",
    "st08_stream_static_enrich",
    "d10_hash_sample",
    "d16_stratified_sample",
    "d20_doc_chunks",
    "d21_seq_packing",
    "d34_window_dedup",
    "d35_bloom_decontaminate",
    "d36_window_dedup_removal",
    "g15_convex_hull",
    "g16_simplify_dp",
    "m13_wav_bitdepths",
    "m14_png16_pixels",
    "m15_audio_frames",
    "m16_image_dhash",
    "m17_gif_pixels",
    "m18_gif_frame_sample",
]

# Queries registered this round that did NOT fit the round-5 window;
# they MUST form (with the q01/g04 sentinels) round 6's window —
# exactly 48 + 2 = 50.
#
# ROUND-6 RECIPE: run `python tools/apply_round6.py` (validated in
# round 5 on the live tree: rotation + sentinel swap + gate tests
# green, then reverted). It sets
#   DRIVER_WINDOW = [q01, g04, *DEFERRED_TO_NEXT_ROUND]  # exactly 50
#   DEFERRED_TO_NEXT_ROUND = []                          # fresh list
# and SENTINELS <- {q01, g04} in tests/test_gate_coverage.py. New
# round-6 gate queries then register directly and append here while
# the 50 - |sentinels| budget lasts. GATE OUTPUTS MUST BE SCALAR —
# test_window_outputs_are_scalar_typed DESCRIBEs window + deferred.
# All entries below are verify_oracle-green at sf0.001/0.01/0.1 and
# local[7] (docs/ORACLE_FULL_r5.md); tests/test_gate_coverage.py
# fails if any registered query is neither historically checked, in
# the current window, nor in this list.
DEFERRED_TO_NEXT_ROUND = [
    # round-9 additions go here (gated round 10); budget =
    # 50 - len(NEXT_ROUND_SENTINELS) — see test_gate_coverage.
    # The queued8 drain is COMPLETE: new queries need a fresh
    # queued9 module following the queued6/7/8 contract.
]


def _collect():
    queries = {}
    oracles = {}
    for mod in _modules():
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles


def _modules():
    # hard imports: a failure here must propagate — silently dropping a
    # module would remove entire query families from the correctness gate
    from ecmm428_pycart_spark.benchmarks import (datapipe_queries, geo_queries,
                                                 queued, queued6, queued7,
                                                 queued8)
    return [relational, datapipe_queries, geo_queries, queued, queued6, queued7,
            queued8]


def _window_first(d: dict) -> dict:
    missing = [n for n in DRIVER_WINDOW if n not in d]
    if missing:  # fail loudly: a typo here would shrink the gate
        raise KeyError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: d[n] for n in DRIVER_WINDOW}
    ordered.update((n, v) for n, v in d.items() if n not in ordered)
    return ordered


def get_queries():
    return _window_first(_collect()[0])


def get_oracle_sql():
    q, o = _collect()
    # only emit oracle SQL for registered queries
    return {k: v for k, v in o.items()
            if k in q and v is not None}


QUERIES = get_queries()
