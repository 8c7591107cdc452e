"""Stage-level profile of q136_quality_cascade (VERDICT r11 ask 3) —
the same methodology as the d15 breakdown in docs/ROUND11_NOTES.md §9:
warmed session, store warm, each stage timed as the INCREMENTAL cost
of forcing it on top of the previous ones (localCheckpoint(eager) for
mid-pipeline stages, count() for the rest), second run reported.

Usage: python tools/profile_q136.py [sf_dir]   (default sf0.1)
Run on an otherwise-idle machine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile(spark, sf_dir):
    from pyspark.sql import functions as F

    from ecmm428_pycart_spark.benchmarks.registry import get_queries
    from ecmm428_pycart_spark.datapipe import band_store, dedup
    from ecmm428_pycart_spark.datapipe.components import (
        connected_components)
    from ecmm428_pycart_spark.datapipe.text import (classifier_scores,
                                                    lang_id,
                                                    with_text_stats)
    from ecmm428_pycart_spark.session import load_table

    t = {}

    def clock(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        return out

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text")

    # stage 1: lang-id + text stats + flag projection (fl checkpoint)
    st = with_text_stats(lang_id(docs))
    f_q = (((F.col("n_tokens") <= 100)
            & (F.col("n_unique_tokens") >= 20))
           | ((F.col("n_tokens") > 100)
              & (F.col("n_unique_tokens") * 5 >= F.col("n_tokens"))))
    fl = clock("1_lang_stats_ckpt", lambda: (
        st.select("doc_id", "text",
                  F.col("n_tokens").alias("nt"),
                  (F.col("pred_lang") == "en").alias("f_lang"),
                  ((F.col("pred_lang") == "en") & f_q).alias("f_q"))
        .localCheckpoint(eager=True)))

    # stage 2: quality survivors checkpoint
    kept = clock("2_kept_ckpt", lambda: (
        fl.filter("f_q").select("doc_id", "text", "nt")
        .localCheckpoint(eager=True)))

    # stage 3: candidate pairs from the (warm) band store
    pairs = band_store.candidate_pairs(spark, sf_dir, docs=kept)
    pairs = clock("3_store_pairs",
                  lambda: pairs.localCheckpoint(eager=True))
    n_pairs = pairs.count()

    # stage 4: exact-jaccard verify join
    edges = dedup.jaccard_pairs(kept, pairs, threshold=0.5)
    edges = clock("4_jaccard_verify",
                  lambda: edges.localCheckpoint(eager=True))
    n_edges = edges.count()

    # stage 5: connected components
    cc = clock("5_connected_components",
               lambda: connected_components(edges).localCheckpoint(
                   eager=True))
    n_nodes = cc.count()

    # stage 6: canonical filter join
    canon = clock("6_canon_ckpt", lambda: (
        kept.join(cc, kept.doc_id == cc.node, "left")
        .filter(F.col("component").isNull()
                | (F.col("component") == F.col("doc_id")))
        .select("doc_id", "nt")
        .localCheckpoint(eager=True)))

    # stage 7: classifier scores over the FULL corpus
    clf = clock("7_classifier_scores", lambda: (
        classifier_scores(docs).select(
            "doc_id", F.col("keep").alias("f_clf"))
        .localCheckpoint(eager=True)))

    # stage 8: final join + five-stage rollup + ppm
    def run_tail():
        final = (canon.join(clf, "doc_id")
                 .filter("f_clf").select("doc_id", "nt"))

        def stage(name, d):
            return (d.agg(F.count(F.lit(1)).alias("n_docs"),
                          F.sum("nt").cast("long").alias("n_tokens"))
                    .select(F.lit(name).alias("stage"), "n_docs",
                            "n_tokens"))

        out = (stage("0_all", fl)
               .unionByName(stage("1_lang", fl.filter("f_lang")))
               .unionByName(stage("2_quality", fl.filter("f_q")))
               .unionByName(stage("3_neardup", canon))
               .unionByName(stage("4_classifier", final)))
        total = fl.agg(F.count(F.lit(1)).alias("n0"))
        return (out.crossJoin(F.broadcast(total))
                .select("stage", "n_docs", "n_tokens",
                        F.expr("n_docs * 1000000 div n0")
                        .alias("retained_ppm"))).collect()

    clock("8_rollup_tail", run_tail)

    # end-to-end registered query for the same session, for the total
    qf = get_queries()["q136_quality_cascade"]
    clock("9_end_to_end_registered", lambda: qf(spark, sf_dir).collect())

    t["_n_pairs"], t["_n_edges"], t["_n_cc_nodes"] = (n_pairs, n_edges,
                                                      n_nodes)
    return t


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from ecmm428_pycart_spark.session import get_spark
    spark = get_spark("profile-q136")
    # warm the JVM + the stores with a throwaway full run
    from ecmm428_pycart_spark.benchmarks.registry import get_queries
    get_queries()["q136_quality_cascade"](spark, sf_dir).collect()
    runs = [profile(spark, sf_dir) for _ in range(2)]
    print(json.dumps({"sf_dir": sf_dir, "run1": runs[0],
                      "run2": runs[1]}, indent=2))


if __name__ == "__main__":
    main()
