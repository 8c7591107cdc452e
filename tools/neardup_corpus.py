"""Harder self-similarity decade-up: NEAR-duplicate (not exact-clone)
corpus for the pair-volume-guard queries.

ROUND9_PLAN §1b / VERDICT r8 next-7: round 8's Part-1 extrapolation
replicated documents 10× as EXACT clones — adversarial for bucket
caps, but exact copies collapse under any hash-grouping stage before
the expensive joins. The harder mix is near-duplicates: copies that no
exact/normalized hash can collapse, yet similar enough that the
verify-stage guards (d73's lossless Jaccard≥t join, d90's df-capped
span windows, d76's first-seen n-gram join) must process them as REAL
candidate mass.

Build: documents replicated 10× with remapped ids (doc_id*10+k);
copy 0 is the original, copies 1–9 mutate every ~20th word (position-,
doc- and copy-keyed, so mutations land at different offsets per copy)
into a unique noise token. At 5% word mutation a word-5-gram Jaccard
against the original is ≈ (0.95^5)/(2-0.95^5) ≈ 0.63 — ABOVE d73's
t=0.5, so copy↔original pairs survive the prefix filter AND the full
verification join (the expensive, lossless path); mutated-copy↔mutated-
copy pairs hover around the threshold and still get verified. Every
8-gram span in d90 appears ~≤10× (under the df=64 cap — no early
collapse), and d76's novelty join sees 10× gram volume with fresh
noise grams.

Embeddings copy through with remapped ids (the target queries are
text-side; Part-1 r8 already stressed the embedding path).

Usage: python tools/neardup_corpus.py [--samples 3] [names ...]
       (default names: d73_prefix_filter_join d90_dup_spans
        d76_novelty_curve)

Scratch stays in /tmp; the doc artifact is docs/SCALE_EXTRAP_r9.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_NAMES = ["d73_prefix_filter_join", "d90_dup_spans",
                 "d76_novelty_curve"]


def build_neardup(spark, base: str, out: str, copies: int = 10,
                  every: int = 20) -> None:
    from pyspark.sql import functions as F

    marker = os.path.join(out, "_BUILT_FROM")
    if os.path.isfile(marker):
        with open(marker) as f:
            if f.read().strip() == f"{base}:{copies}:{every}":
                print(f"# scratch {out} already built", file=sys.stderr)
                return
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    rep = docs.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("_k"))
    mutated = F.expr(
        f"""array_join(transform(split(text, ' '), (w, i) ->
              CASE WHEN _k > 0 AND (i + doc_id + _k) % {every} = 0
                   THEN concat('zq', doc_id, 'x', _k, 'x', i)
                   ELSE w END), ' ')""")
    (rep.select((F.col("doc_id") * copies + F.col("_k")).alias("doc_id"),
                mutated.alias("text"), "lang", "source",
                F.length(mutated).alias("n_chars"))
     .repartition(32)
     .write.mode("overwrite")
     .parquet(os.path.join(out, "documents.parquet")))
    emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    idcol = "doc_id" if "doc_id" in emb.columns else emb.columns[0]
    (emb.withColumn(idcol, F.col(idcol) * copies)
     .write.mode("overwrite")
     .parquet(os.path.join(out, "embeddings.parquet")))
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]:
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        (spark.read.parquet(src)
         .write.mode("overwrite").parquet(dst))
    with open(marker, "w") as f:
        f.write(f"{base}:{copies}:{every}")
    n = spark.read.parquet(os.path.join(out, "documents.parquet")).count()
    print(f"# built near-dup corpus: {n} docs", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--scratch", default="/tmp/pycart_neardup_sf1")
    args = ap.parse_args()
    names = args.names or DEFAULT_NAMES

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from decade_up import time_base_vs_scratch

    from ecmm428_pycart_spark.session import get_spark

    spark = get_spark("neardup-decade-up")
    build_neardup(spark, args.base, args.scratch)
    print(json.dumps(time_base_vs_scratch(
        spark, names, args.base, args.scratch, args.samples)))


if __name__ == "__main__":
    main()
