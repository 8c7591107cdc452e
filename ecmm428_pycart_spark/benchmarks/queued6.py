"""Round-6 registration queue — the holding module for gate queries
built AFTER round 5's deferred budget filled (48 + 2 sentinels = the
whole 50-slot window). Same contract as round 4's queue
(benchmarks/queued.py, registered round 5): every entry carries its
DuckDB oracle beside it, tests/test_queued6_queries.py replays the
driver-gate compare on each at the chosen SPARK_GRAFT_TESTDATA scale,
and registration is mechanical once round 6's rotation
(tools/apply_round6.py) empties the deferred list.

Entries here must obey the same gate rules as registered queries:
scalar output columns only (the driver canonicalizer crashes on
array/struct/map), 1:1 oracle, deterministic tiebreaks, round-6
cross-engine float convention.
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
# Normalization-aware exact dedup (text.normalize_text): casefold +
# punctuation strip + whitespace collapse, then the d01-style per-source
# dup measurement on BOTH the raw and the canonical form — the curation
# step between raw exact-dedup and MinHash that catches "Same   Text!"
# vs "same text". All native expressions; the oracle replays the same
# regex pipeline (simple character classes, Java-regex/RE2-identical).
# ---------------------------------------------------------------------------
@q("d50_normalized_dedup", """
WITH n AS (
  SELECT source, text,
         trim(regexp_replace(regexp_replace(lower(text),
                                            '[^a-z0-9 ]', '', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_raw,
       CAST(count(DISTINCT md5(norm)) AS BIGINT) AS n_unique_norm
FROM n GROUP BY source
""")
def d50_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.text import normalize_text

    docs = _t(spark, sf_dir, "documents")
    return (docs.withColumn("norm", normalize_text(F.col("text")))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct(F.md5("text")).alias("n_unique_raw"),
                 F.countDistinct(F.md5("norm")).alias("n_unique_norm")))


# ---------------------------------------------------------------------------
# percentile_approx rank-error bound, PROVEN under the oracle: the repo
# repeatedly cites percentile_approx as the 100 TB path (RFM cuts,
# CCNet buckets both expose exact=False) — this query makes that claim
# gate-checkable. Spark computes each decile exactly AND via the
# sketch (accuracy=1000), then counts the sketch value's actual rank in
# one conditional-aggregate pass; within_bound asserts the rank error
# stays under n/100 + 1 (10x slack over the configured 1/1000
# guarantee, absorbing ties). The oracle recomputes the exact deciles
# (quantile_cont parity, the d43 convention) and pins every
# within_bound to TRUE — a sketch regression or a broken rank count
# reddens the hash. Plan: two passes over the single projected column
# + a 1-row broadcast; no window, no collect.
# ---------------------------------------------------------------------------
_Q101_FRACS = [i / 10 for i in range(1, 10)]


def _q101_sql():
    exacts = ",\n         ".join(
        f"round(quantile_cont(l_extendedprice, {p}), 4) AS e{i}"
        for i, p in enumerate(_Q101_FRACS, 1))
    rows = "\n  UNION ALL\n".join(
        f"  SELECT {i} AS decile, e{i} AS exact_v, TRUE AS within_bound "
        f"FROM ex" for i in range(1, 10))
    return f"""
WITH ex AS (
  SELECT {exacts}
  FROM lineitem
)
{rows}
"""


@q("q101_approx_quantile_bounds", _q101_sql())
def q101_approx_quantile_bounds(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    li = (_t(spark, sf_dir, "lineitem")
          .select(F.col("l_extendedprice").cast("double").alias("v")))
    aggs = []
    for i, p in enumerate(_Q101_FRACS, 1):
        aggs.append(F.round(F.percentile("v", F.lit(p)), 4)
                    .alias(f"e{i}"))
        aggs.append(F.percentile_approx("v", F.lit(p), F.lit(1000))
                    .alias(f"a{i}"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    stats = li.agg(*aggs)
    ranked = (li.crossJoin(F.broadcast(stats))
              .agg(*[F.sum((F.col("v") <= F.col(f"a{i}")).cast("long"))
                     .alias(f"r{i}") for i in range(1, 10)],
                   F.first("n").alias("n"),
                   *[F.first(f"e{i}").alias(f"e{i}")
                     for i in range(1, 10)]))
    rows = F.array(*[
        F.struct(
            F.lit(i).alias("decile"),
            F.col(f"e{i}").alias("exact_v"),
            (F.abs(F.col(f"r{i}") - F.lit(p) * F.col("n"))
             <= F.col("n") / 100.0 + 1.0).alias("within_bound"))
        for i, p in enumerate(_Q101_FRACS, 1)])
    return (ranked.select(F.explode(rows).alias("_r"))
            .select("_r.decile", "_r.exact_v", "_r.within_bound"))


# ---------------------------------------------------------------------------
# Differential-privacy-style noisy release (seeded Laplace via the
# repo's md5-uniform RNG): per-source document counts + epsilon=1
# Laplace noise — the privacy face of releasing corpus statistics.
# REAL DP needs cryptographic randomness; the md5-seeded draw here is
# the DETERMINISTIC-replay variant that makes the mechanism itself
# (inverse-CDF transform, sensitivity-1 count release, post-processing
# rounding) oracle-checkable — swap the uniform source for secure
# randomness in production and the plan is unchanged. Laplace
# inverse-CDF: mu - b*sign(u-.5)*ln(1-2|u-.5|), b = sensitivity/eps =
# 1. ln is the libm-parity function both engines share (d37's
# convention); the md5 uniform is text.md5_uniform's ONE definition.
# ---------------------------------------------------------------------------
@q("d51_dp_release", """
WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents
  GROUP BY source
),
u AS (
  SELECT source, n,
         (CAST(concat('0x', substr(md5('dp:' || source), 1, 8))
               AS UBIGINT) + 0.5) / 4294967296.0 AS u
  FROM c
)
SELECT source, n,
       round(n - CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END
               * ln(1 - 2 * abs(u - 0.5)), 4) AS noisy_n
FROM u
""")
def d51_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecmm428_pycart_spark.datapipe.text import md5_uniform

    docs = _t(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    u = md5_uniform(F.concat(F.lit("dp:"), F.col("source")))
    sign = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    lap = sign * F.log(F.lit(1.0) - 2.0 * F.abs(u - 0.5))
    return c.select("source", "n",
                    F.round(F.col("n") - lap, 4).alias("noisy_n"))
