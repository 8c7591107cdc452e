"""Stage-level profiles of d60_winnow_dup and d28_ngram_jaccard —
the two heaviest non-geo, non-macro registry queries after the r13
lm_store landed (seven-run bench floors 6.9s / 4.6s,
docs/BENCH_SPREAD_r13.json). Same methodology as profile_q136.py:
warmed session, each stage timed as the INCREMENTAL cost of forcing
it on top of the previous ones (localCheckpoint(eager) mid-pipeline),
second run reported (first carries codegen warmup).

Feeds the round-14 plan: d60's fingerprint pass is a pure
per-document function of text (the band-index store shape) — IF the
pass dominates, it is the next store/bucketing candidate; if the
pair join dominates, the cost is the designed MOSS matching stage.

Usage: python tools/profile_d60_d28.py [sf_dir]   (default sf0.1)
Run on an otherwise-idle machine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def clockers(t):
    def clock(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        return out
    return clock


def profile_d60(spark, sf_dir):
    from pyspark.sql import functions as F

    from ecmm428_pycart_spark.datapipe.dedup import winnow_fingerprints
    from ecmm428_pycart_spark.session import load_table

    t = {}
    clock = clockers(t)
    docs = load_table(spark, sf_dir, "documents")

    # stage 1: the map-side winnowing fingerprint pass (char-8-gram
    # hashes + window-of-4 argmin packing, array exprs, no shuffle)
    fp = clock("1_fingerprints_ckpt", lambda: (
        winnow_fingerprints(docs, k=8, w=4)
        .select(F.col("doc_id").alias("_id"), F.col("fp").alias("_fp"))
        .localCheckpoint(eager=True)))

    # stage 2: full-set per-doc sizes (denominators)
    sizes = clock("2_sizes", lambda: (
        fp.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
        .localCheckpoint(eager=True)))

    # stage 3: df-cap (inverted-index discipline) — fingerprints in
    # more than max_df docs dropped BEFORE the self-join
    kept = clock("3_df_cap_ckpt", lambda: (
        fp.join(fp.groupBy("_fp").agg(F.count(F.lit(1)).alias("_df"))
                .filter(F.col("_df") <= 16).select("_fp"), "_fp")
        .localCheckpoint(eager=True)))

    # stage 4: shared-fingerprint pair join + min_shared filter
    pairs = clock("4_pair_join", lambda: (
        kept.select("_fp", F.col("_id").alias("_a"))
        .join(kept.select("_fp", F.col("_id").alias("_b")), "_fp")
        .filter(F.col("_a") < F.col("_b"))
        .groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 2)
        .localCheckpoint(eager=True)))

    # stage 5: denominator joins + all-integer page (top-20)
    clock("5_page_top20", lambda: (
        pairs.join(sizes.select(F.col("_id").alias("_a"),
                                F.col("_sz").alias("n_a")), "_a")
        .join(sizes.select(F.col("_id").alias("_b"),
                           F.col("_sz").alias("n_b")), "_b")
        .select(F.col("_a").alias("a"), F.col("_b").alias("b"),
                "shared", "n_a", "n_b",
                F.expr("shared * 1000000 div least(n_a, n_b)")
                .alias("sim_ppm"))
        .orderBy(F.col("shared").desc(), "a", "b").limit(20).count()))

    t["n_fp"] = fp.count()
    t["n_kept"] = kept.count()
    t["n_pairs"] = pairs.count()
    return t


def profile_d28(spark, sf_dir):
    from pyspark.sql import functions as F

    from ecmm428_pycart_spark.datapipe import dedup
    from ecmm428_pycart_spark.session import load_table

    t = {}
    clock = clockers(t)
    docs = load_table(spark, sf_dir, "documents")

    # stage 1: deterministic (lang, len//100) blocking + 256-cap
    blocked = (docs.filter(F.size(F.split("text", " ")) >= 3)
               .select("doc_id", "lang",
                       (F.col("n_chars") / 100).cast("long")
                       .alias("len_bucket")))
    ok = (blocked.groupBy("lang", "len_bucket")
          .agg(F.count(F.lit(1)).alias("_n"))
          .filter(F.col("_n") <= 256).select("lang", "len_bucket"))
    blocked = clock("1_blocking_ckpt", lambda: (
        blocked.join(ok, ["lang", "len_bucket"], "left_semi")
        .localCheckpoint(eager=True)))

    # stage 2: within-block pair enumeration
    a = blocked.select(F.col("doc_id").alias("doc_a"), "lang",
                       "len_bucket")
    x = blocked.select(F.col("doc_id").alias("doc_b"), "lang",
                       "len_bucket")
    pairs = clock("2_pair_enum_ckpt", lambda: (
        a.join(x, ["lang", "len_bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)))

    # stage 3: exact jaccard verify (shingle build + 2 id joins +
    # intersect math)
    clock("3_jaccard_verify", lambda: (
        dedup.jaccard_pairs(docs, pairs, shingle_n=3, threshold=0.2,
                            hash_shingles=True)
        .select("doc_a", "doc_b", "jaccard").count()))

    t["n_blocked"] = blocked.count()
    t["n_pairs"] = pairs.count()
    return t


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from ecmm428_pycart_spark.session import get_spark
    spark = get_spark("profile-d60-d28")
    out = {}
    for rep in (1, 2):
        out[f"d60_run{rep}"] = profile_d60(spark, sf_dir)
        out[f"d28_run{rep}"] = profile_d28(spark, sf_dir)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
