"""As-of (backward) join — an operator Spark's built-ins lack, composed
from union + ordered carry-forward window (the canonical Spark pattern).

For each left row, attach the most recent right row of the same key with
``right.ts <= left.ts``. Implementation: tag both sides, union, and run a
``last(..., ignorenulls=True)`` window ordered by (ts, side) per key —
right rows sort before left rows at equal ts so ties resolve to
"right value at exactly left.ts is visible". One shuffle on the key, no
per-row lookups; at 100 TB this is a single window over the unioned
stream, which AQE partitions by key.

Determinism requires the right side to be unique per (key, ts) — callers
aggregate duplicates first (otherwise *any* engine's as-of pick is
ambiguous).

Null semantics: a right row whose value column is NULL does not
overwrite — ``last(..., ignorenulls=True)`` skips it and the carry
falls back to the previous non-null right value (pandas ``merge_asof``
would carry the null). Callers that need null-overwrite semantics
should sentinel-encode nulls before the join and decode after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join_backward(left: DataFrame, right: DataFrame, key: str,
                       left_ts: str, right_ts: str,
                       value_cols: list[str],
                       prefix: str = "asof_") -> DataFrame:
    """Left rows + carried-forward right `value_cols` (null if no prior
    right row). Column names in the result: left columns unchanged,
    right values as `{prefix}{col}`."""
    lcols = left.columns
    l = (left.withColumn("_ts", F.col(left_ts))
         .withColumn("_side", F.lit(1)))
    for c in value_cols:
        l = l.withColumn(f"_rv_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols])
    for c in lcols:
        if c not in (key,):
            r = r.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))
    u = l.select(key, "_ts", "_side", *[c for c in lcols if c != key],
                 *[f"_rv_{c}" for c in value_cols]) \
         .unionByName(r.select(key, "_ts", "_side",
                               *[c for c in lcols if c != key],
                               *[f"_rv_{c}" for c in value_cols]))
    w = (W.partitionBy(key).orderBy("_ts", "_side")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    for c in value_cols:
        u = u.withColumn(
            f"{prefix}{c}",
            F.last(F.when(F.col("_side") == 0, F.col(f"_rv_{c}")),
                   ignorenulls=True).over(w))
    return (u.filter(F.col("_side") == 1)
            .select(*lcols, *[f"{prefix}{c}" for c in value_cols]))
