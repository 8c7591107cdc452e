"""Skew-handling primitives for the 100 TB path.

AQE's skew-join handling covers sort-merge joins automatically; these
helpers cover the cases it doesn't:

- **salted aggregation** — a two-level aggregate for hot grouping keys:
  partial aggregate on (key, salt) spreads a hot key over N reducers,
  then a cheap final aggregate on key merges the partials. Identical
  results for any algebraic aggregate (sum/count/min/max).
- **salted broadcast-skew join** — replicate the small side N× with a
  salt column so a hot key on the big side fans out across tasks even
  when the join cannot be broadcast (e.g. medium dim + extreme skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_sum(df: DataFrame, group_cols: list[str], value_col: str,
               out_col: str, num_salts: int = 16) -> DataFrame:
    """groupBy(group_cols).sum(value_col) with two-level salting.

    spark_partition_id is used as the salt source: deterministic per
    task, uniform enough to spread a hot key, and free (no rand(), so
    the operator stays deterministic under retries).
    """
    salted = df.withColumn("_salt",
                           F.spark_partition_id() % F.lit(num_salts))
    partial = (salted.groupBy(*group_cols, "_salt")
               .agg(F.sum(value_col).alias("_psum")))
    return (partial.groupBy(*group_cols)
            .agg(F.sum("_psum").alias(out_col)))


def replicate_join_skewed(big: DataFrame, small: DataFrame, on: str,
                          num_salts: int = 8) -> DataFrame:
    """Inner equi-join where `big` has hot keys: salt the big side with
    a deterministic hash-derived salt, explode the small side num_salts×,
    join on (key, salt). Result == plain inner join on `on`."""
    big_s = big.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()),
                        F.lit(num_salts)))
    salts = F.array(*[F.lit(i) for i in range(num_salts)])
    small_s = (small.withColumn("_salt", F.explode(salts)))
    return (big_s.join(small_s, [on, "_salt"], "inner")
            .drop("_salt"))
