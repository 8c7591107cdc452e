"""Regenerate the golden VALUES oracles for the deterministic iterative
queries (g04_dorling_positions, g05_dorling_scalable, k01_kmeans_clusters).

These queries run driver loops (Gauss–Seidel / Jacobi / k-means) that SQL
cannot express, but their outputs are deterministic: fixed nation-derived
grid (identical at every sf), exact aggregates, documented tie-breaks.
So the oracle is a literal golden table produced by the query itself.

g04/g05 derive from `nation` (25 rows, byte-identical across sf) — one
golden serves every sf. k01 derives from `embeddings`, which differ per
sf, so its golden carries a per-sf fingerprint (count + rounded sum of
the leading dimension) that the oracle SQL joins on.

Usage: python tools/gen_goldens.py   # prints golden blocks to paste into
ecmm428_pycart_spark/benchmarks/{geo_queries,datapipe_queries}.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ("0.001", "0.01", "0.1")
BASE = "/root/testdata/sf"


def fmt(v):
    return repr(v) if not isinstance(v, str) else f"'{v}'"


def main():
    import duckdb

    from ecmm428_pycart_spark.benchmarks import get_queries
    from ecmm428_pycart_spark.session import get_spark

    spark = get_spark("gen-goldens")
    qs = get_queries()

    for name in ("g04_dorling_positions", "g05_dorling_scalable"):
        per_sf = {sf: sorted(map(tuple, qs[name](spark, BASE + sf).collect()))
                  for sf in SFS[:2]}
        assert per_sf["0.001"] == per_sf["0.01"], \
            f"{name} is not sf-independent — golden oracle invalid"
        rows = per_sf["0.001"]
        print(f"# {name} golden ({len(rows)} rows):")
        print(",\n".join(
            "(" + ",".join(fmt(v) for v in r) + ")" for r in rows))
        print()

    print("# k01_kmeans_clusters golden (n, s, cluster, n_vectors):")
    for sf in SFS:
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"'{BASE}{sf}/embeddings.parquet'")
        n, s = con.execute(
            "SELECT count(*), round(sum(embedding[1])::DOUBLE, 4) "
            "FROM embeddings").fetchone()
        rows = sorted(map(tuple, qs["k01_kmeans_clusters"](
            spark, BASE + sf).collect()))
        print(",\n".join(f"({n}, {s!r}, {c}, {nv})" for c, nv in rows) + ",")
    print()

    print("# s11_pq_codes golden (n, s, subspace, code, n_vectors):")
    for sf in SFS:
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"'{BASE}{sf}/embeddings.parquet'")
        n, s = con.execute(
            "SELECT count(*), round(sum(embedding[1])::DOUBLE, 4) "
            "FROM embeddings").fetchone()
        rows = sorted(map(tuple, qs["s11_pq_codes"](
            spark, BASE + sf).collect()))
        print(",\n".join(f"({n}, {s!r}, {sub}, {c}, {nv})"
                         for sub, c, nv in rows) + ",")
    print()

    # s14 (round-5 registration): per-cluster SemDeDup keep/prune
    # counts, fingerprint-dispatched like k01. The query body will be
    # semdedup(emb, k=4, iterations=3, threshold=0.3) -> groupBy
    # cluster agg(count, sum(keep)).
    print("# s14_semdedup golden (n, s, cluster, n_vectors, n_kept):")
    from ecmm428_pycart_spark.datapipe.similarity import semdedup
    from ecmm428_pycart_spark.session import load_table
    from pyspark.sql import functions as F
    for sf in SFS:
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"'{BASE}{sf}/embeddings.parquet'")
        n, s = con.execute(
            "SELECT count(*), round(sum(embedding[1])::DOUBLE, 4) "
            "FROM embeddings").fetchone()
        emb = load_table(spark, BASE + sf, "embeddings")
        out = (semdedup(emb, k=4, iterations=3, threshold=0.3)
               .groupBy("cluster")
               .agg(F.count(F.lit(1)).alias("n_vectors"),
                    F.sum(F.col("keep").cast("long")).alias("n_kept")))
        rows = sorted(map(tuple, out.collect()))
        print(",\n".join(f"({n}, {s!r}, {c}, {nv}, {nk})"
                         for c, nv, nk in rows) + ",")
    print()

    # g17 (round-5 registration): FIXED-k core sizes of the
    # customer-grid contiguity graph, fingerprinted by customer count.
    # Fixed k (3, 4) per the ROUND5_QUEUE plan — a full core_numbers
    # at sf0.1 needs the ~2L-round corner-erosion peel to prove the
    # 5-core empty (graph.py docstring) and exceeds any sane budget.
    print("# g17_k_core golden (n_cust, k, n_nodes):")
    from pyspark.sql import functions as F
    from ecmm428_pycart_spark.benchmarks.geo_queries import _customer_grid
    from ecmm428_pycart_spark.datapipe.graph import k_core
    from ecmm428_pycart_spark.operators.borders import get_borders
    for sf in SFS:
        con = duckdb.connect()
        n_cust, = con.execute(
            f"SELECT count(*) FROM '{BASE}{sf}/customer.parquet'").fetchone()
        grid = _customer_grid(spark, BASE + sf).drop("value")
        borders, _ = get_borders(grid, "region_idx", "geometry",
                                 idx_field="region_idx")
        e = borders.select(F.col("focal").alias("src"),
                           F.col("neighbor").alias("dst"))
        for k in (3, 4):
            print(f"({n_cust}, {k}, {k_core(e, k).count()}),")
    print()

    # d42 (round-5 registration): learn-then-encode BPE over the full
    # documents table, reduced to corpus-level totals. Dispatch
    # fingerprint is (count, total text length) — sf0.001 and sf0.01
    # both have 500 docs, so the count alone cannot disambiguate.
    print("# d42_bpe_encode golden (n_docs, total_chars, "
          "total_subtokens, n_distinct_symbols):")
    from ecmm428_pycart_spark.datapipe.text import (bpe_encode,
                                                    learn_bpe_merges)
    for sf in SFS:
        docs = load_table(spark, BASE + sf, "documents").select(
            "doc_id", "text")
        n_docs, n_chars = docs.agg(
            F.count(F.lit(1)), F.sum(F.length("text"))).first()
        merges, _ = learn_bpe_merges(docs, n_merges=12)
        enc = bpe_encode(docs, merges)
        total = enc.agg(F.sum("n_subtokens")).first()[0]
        n_sym = (enc.select(F.explode("tokens").alias("t"))
                 .agg(F.countDistinct("t")).first()[0])
        print(f"({n_docs}, {n_chars}, {total}, {n_sym}),")
    print()

    # m21 (round-5 registration): per-band corpus stats of the mel
    # energies. Per-doc energies depend only on (amp, c) — 100 joint
    # classes identical at every sf — so band max/min/n_distinct are
    # sf-invariant and only n_docs scales (the oracle cross-joins the
    # 8-row golden with count(*)). max/min/count-distinct over
    # 6-rounded energies are float-order-independent, unlike a sum.
    print("# m21_mel_energies golden (band, max_e, min_e, n_distinct) "
          "— assert sf-invariant:")
    from ecmm428_pycart_spark.datapipe.multimodal import (
        synth_wav_square_payload, wav_mel_energies)
    per_sf = {}
    for sf in SFS:
        docs = load_table(spark, BASE + sf, "documents").select("doc_id")
        mel = (docs.withColumn("payload",
                               synth_wav_square_payload(F.col("doc_id")))
               .select(wav_mel_energies(F.col("payload")).alias("mel")))
        ex = (mel.select(F.posexplode("mel").alias("band", "e"))
              .withColumn("er", F.round("e", 6)))
        out = (ex.groupBy("band")
               .agg(F.max("er").alias("max_e"), F.min("er").alias("min_e"),
                    F.countDistinct("er").alias("n_distinct"))
               .orderBy("band"))
        per_sf[sf] = [tuple(r) for r in out.collect()]
    assert per_sf["0.001"] == per_sf["0.01"] == per_sf["0.1"], \
        "m21 band stats are not sf-invariant — golden oracle invalid"
    print(",\n".join(f"({b}, {mx!r}, {mn!r}, {nd})"
                     for b, mx, mn, nd in per_sf["0.001"]) + ",")
    print()

    # s17 (round-5 registration): IVF top-k SERVED FROM a persisted
    # index (save -> load -> probe), fingerprint-dispatched like k01.
    print("# s17_index_persistence golden (n, s, vec_id, cluster, cos):")
    import shutil
    import tempfile

    from ecmm428_pycart_spark.datapipe.kmeans import kmeans
    from ecmm428_pycart_spark.datapipe.similarity import (
        ivf_topk_from_index, load_kmeans_index, query_vector,
        save_kmeans_index)
    for sf in SFS:
        con = duckdb.connect()
        n, s = con.execute(
            f"SELECT count(*), round(sum(embedding[1])::DOUBLE, 4) FROM "
            f"'{BASE}{sf}/embeddings.parquet'").fetchone()
        emb = load_table(spark, BASE + sf, "embeddings")
        assigned, cents = kmeans(emb, k=4, iterations=3)
        d = tempfile.mkdtemp(prefix="s17_gold_")
        save_kmeans_index(assigned, cents, d)
        a2, c2 = load_kmeans_index(spark, d)
        out = ivf_topk_from_index(emb, a2, c2, query_vector(emb, 0),
                                  k=5, nprobe=1)
        for r in out.collect():
            print(f"({n}, {s!r}, {r['vec_id']}, {r['cluster']}, "
                  f"{r['cos']!r}),")
        shutil.rmtree(d, ignore_errors=True)
    print()

    for gq in ("g08_dorling_scalable_large", "g14_dorling_grid2500"):
        print(f"# {gq} golden (n, cx_chk, cy_chk, radius_chk):")
        seen = set()
        for sf in SFS:
            (n, cx, cy, r), = qs[gq](spark, BASE + sf).collect()
            if n not in seen:  # g14's grid is identical at sf0.01/sf0.1
                seen.add(n)
                print(f"({n}, {cx}, {cy}, {r}),")
        print()


if __name__ == "__main__":
    main()
