"""Round-8 registration queue — overflow of benchmarks/queued7.py,
which is hard-capped at 48 entries (round 7 defers it whole into
round 8's 50-slot gate window next to the two rotation sentinels).
Entries here follow the identical contract — oracle beside the
query, the tests/test_queued8_queries.py gate replica, scalar
outputs, plan guards — and register in round 8 by the same
mechanical recipe (collect module, defer to round 9). queued7 holds
3 deliberately-spare slots for round-6/7 discoveries; prefer those
first for anything urgent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ecmm428_pycart_spark.session import load_table as _t

QUERIES = {}
ORACLES = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        ORACLES[name] = sql
        return fn
    return deco


# ---------------------------------------------------------------------------
# Sorted-neighborhood dedup blocking (dedup.sorted_neighborhood_
# pairs — Hernandez & Stolfo 1995, the third blocking family next
# to minhash-LSH banding and simhash byte-bands): simhash
# fingerprints blocked by their low byte, sorted within block, each
# doc paired with its 3 predecessors — candidates O(n * window) by
# construction, partitioned windows only. The gate rolls candidate
# and hamming<=6 verified counts up by block%16 next to the block
# populations; the oracle replays the identical lag windows over
# the ONE shared simhash SQL definition.
# ---------------------------------------------------------------------------
def _d80_sql():
    from ecmm428_pycart_spark.benchmarks.datapipe_queries import (
        _SIMHASH_SQL)
    lag_cols = ",\n         ".join(
        f"lag(doc_id, {k}) OVER w AS i{k}, "
        f"lag(simhash, {k}) OVER w AS f{k}" for k in (1, 2, 3))
    unions = "\n  UNION ALL\n".join(
        f"  SELECT blk, bit_count(xor(f{k}, simhash)) AS ham "
        f"FROM lagd WHERE i{k} IS NOT NULL" for k in (1, 2, 3))
    return f"""
WITH sim AS ({_SIMHASH_SQL}),
s2 AS (SELECT doc_id, simhash, simhash & 255 AS blk FROM sim),
lagd AS (
  SELECT doc_id, simhash, blk,
         {lag_cols}
  FROM s2 WINDOW w AS (PARTITION BY blk ORDER BY simhash, doc_id)
),
p AS (
{unions}
),
docs AS (SELECT blk % 16 AS bucket, count(*) AS n_docs
         FROM s2 GROUP BY 1),
pp AS (
  SELECT blk % 16 AS bucket, count(*) AS n_cand,
         sum(CASE WHEN ham <= 6 THEN 1 ELSE 0 END) AS n_verified,
         sum(ham) AS ham_sum
  FROM p GROUP BY 1
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(coalesce(n_cand, 0) AS BIGINT) AS n_cand,
       CAST(coalesce(n_verified, 0) AS BIGINT) AS n_verified,
       CAST(coalesce(ham_sum, 0) AS BIGINT) AS ham_sum
FROM docs LEFT JOIN pp USING (bucket) ORDER BY bucket
"""


@q("d80_sorted_neighborhood", None)
def d80_sorted_neighborhood(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe import dedup

    sim = dedup.simhash(_t(spark, sf_dir, "documents"))
    pairs = dedup.sorted_neighborhood_pairs(sim, window=3,
                                            block_bits=8)
    docs = (sim.groupBy((F.col("simhash").bitwiseAND(255) % 16)
                        .alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs")))
    pp = (pairs.groupBy((F.col("block") % 16).alias("bucket"))
          .agg(F.count(F.lit(1)).alias("n_cand"),
               F.sum((F.col("hamming") <= 6).cast("long"))
               .alias("n_verified"),
               F.sum("hamming").alias("ham_sum")))
    return (docs.join(pp, "bucket", "left")
            .select(F.col("bucket").cast("long").alias("bucket"),
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.coalesce("n_cand", F.lit(0)).cast("long")
                    .alias("n_cand"),
                    F.coalesce("n_verified", F.lit(0)).cast("long")
                    .alias("n_verified"),
                    F.coalesce("ham_sum", F.lit(0)).cast("long")
                    .alias("ham_sum"))
            .orderBy("bucket"))


ORACLES["d80_sorted_neighborhood"] = _d80_sql()
