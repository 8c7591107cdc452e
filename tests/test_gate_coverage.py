"""Guard for the driver correctness gate's coverage window.

The driver evaluates only the FIRST ~50 entries of ``queries()``
(observed cap in CORRECTNESS_r01/r02). Round 2 learned the hard way
that reordering the registry silently moves families in and out of
that window: adding q42/q47-q51/st01-st04 pushed d01-d09 and s01 out,
and the geo macros g01-g10 (the reference-parity surface) never made
the window at all in either round. This test pins the invariant: the
gate prefix must exercise every SURVEY.md §2 operator row and at least
one representative of every LLM-data-pipeline family. It FAILS on
round-2's module-concatenation ordering — that is the point.

No SparkSession needed: this is a pure registry-shape test.
"""

from __future__ import annotations

GATE_CAP = 50

# family → query names that count as covering it. Mapping queries to
# SURVEY §2 rows: q01-q14 are the relational core R1-R23 (one row
# each, see benchmarks/relational.py docstrings); g01-g10 cover the
# geo macros A2/A3/A4 plus G1-G9/R13/R14/R19/R20/R24 (see
# benchmarks/geo_queries.py); the d/s/k/m/st families are the
# beyond-reference LLM-pipeline surface.
FAMILIES: dict[str, set[str]] = {
    # SURVEY §2 relational core — each query is its own row, all required
    **{name: {name} for name in [
        "q01_pricing_summary", "q02_filter_eq", "q03_filter_isin",
        "q04_cast_clean", "q05_range_filter",
        "q06_join_customer_nation_region", "q07_semi_join",
        "q08_anti_join", "q09_union", "q10_argmax_per_group",
        "q11_agg_minmax", "q12_running_fill", "q13_price_range_join",
        "q14_mapping_join",
    ]},
    # geo macros — the reference-parity surface, all ten required
    **{name: {name} for name in [
        "g01_noncontiguous_scale", "g02_queen_borders",
        "g03_dorling_radii", "g04_dorling_positions",
        "g05_dorling_scalable", "g06_distance_pairs",
        "g07_queen_borders_large", "g08_dorling_scalable_large",
        "g09_noncontiguous_large", "g10_pagerank_borders",
    ]},
    # LLM-pipeline families — at least one representative each
    "exact_dedup": {"d01_dedup_exact", "d18_dedup_canonical"},
    "minhash_lsh": {"d05_minhash_signature", "d06_minhash_lsh_jaccard"},
    "simhash": {"d07_simhash", "d08_simhash_neardup"},
    "dup_clustering": {"d15_dup_clusters"},
    "corpus_clean_macro": {"d19_corpus_clean"},
    "text_analysis": {"d02_text_stats", "d03_lang_id", "d09_quality_score",
                      "d13_bpeish_token_count"},
    "fuzzy_dedup": {"d22_fuzzy_pairs"},
    "decontamination": {"d25_decontamination"},
    "similarity_brute": {"s01_cosine_topk"},
    "similarity_ann": {"s02_ann_sign_lsh", "s04_ivf_probe",
                       "s07_ann_multiprobe"},
    "knn_join": {"s09_knn_join"},
    "kmeans": {"k01_kmeans_clusters"},
    "multimodal_meta": {"m03_image_meta", "m04_wav_meta"},
    "multimodal_pixels": {"m06_png_pixels"},
    "stream_window": {"st01_stream_hourly", "st02_stream_sessions"},
    "stream_stream_join": {"st05_stream_interval_join"},
    "stream_dedup": {"st03_stream_dedup", "st06_stream_dedup_bounded"},
    "sketches_gated": {"q38_sketch_accuracy", "q47_kmv_sketch"},
    "sink_roundtrip": {"q50_orc_roundtrip"},
    "data_layout_skipping": {"q59_zorder_skipping"},
    "multimodal_jpeg_decode": {"m09_jpeg_pixels"},
}


def _window():
    from ecmm428_pycart_spark.benchmarks.registry import get_queries
    return list(get_queries())[:GATE_CAP]


def test_gate_window_covers_every_family():
    window = set(_window())
    uncovered = {fam: names for fam, names in FAMILIES.items()
                 if not (names & window)}
    assert not uncovered, (
        f"driver gate prefix (first {GATE_CAP} queries) lost coverage of: "
        f"{sorted(uncovered)} — reorder DRIVER_WINDOW in "
        f"benchmarks/registry.py, do not drop families")


def test_gate_window_matches_declared_order():
    """The curated DRIVER_WINDOW must actually be the emitted prefix —
    a registry refactor that stops honoring it would silently revert
    to module-concatenation order (round-2's failure mode)."""
    from ecmm428_pycart_spark.benchmarks.registry import DRIVER_WINDOW
    assert _window()[:len(DRIVER_WINDOW)] == DRIVER_WINDOW
    assert len(DRIVER_WINDOW) == GATE_CAP


def test_window_names_all_have_oracles():
    """Every gated query must be hash-checkable: an oracle-less entry
    in the window burns a slot on a rows-only (weak) row."""
    from ecmm428_pycart_spark.benchmarks.registry import get_oracle_sql
    oracles = get_oracle_sql()
    missing = [n for n in _window() if n not in oracles]
    assert not missing, f"gated queries without oracle SQL: {missing}"


def test_full_registry_still_contains_everything():
    """Reordering must never drop registrations: the tail (post-window)
    queries stay registered and verify via tools/verify_oracle.py."""
    from ecmm428_pycart_spark.benchmarks.registry import get_queries
    names = list(get_queries())
    assert len(names) == len(set(names))
    for required in ("q38_sketch_accuracy", "m05_frame_sample",
                     "q41_e3_pipeline", "d27_source_mix",
                     "s08_int8_quantize"):
        assert required in names
