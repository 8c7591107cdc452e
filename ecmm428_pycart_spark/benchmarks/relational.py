"""Relational operator queries (SURVEY.md §2.2 R4-R23 + window/set extras).

Each entry maps a reference operator to an idiomatic Spark DataFrame plan
on the driver's star schema, with a DuckDB oracle in ORACLES. Conventions
for exact cross-engine hash parity:

- every computed column is aliased identically on both sides;
- double aggregates are rounded (round(x, 2/4)) on both sides;
- DuckDB integer SUMs are cast to BIGINT (DuckDB widens to HUGEINT);
- timestamps are reduced to DATE / epoch micros before output;
- every query with potential ties has a deterministic tiebreak column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ecmm428_pycart_spark.operators.relational import (
    anti_join,
    argmax_per_group,
    filter_isin,
    running_fill_by,
    semi_join,
    to_int_col,
)
from ecmm428_pycart_spark.session import load_table as _t
from ecmm428_pycart_spark.session import scratch_dir as _scratch


def _await_stream(spark, writer):
    """Execute a bounded streaming writer to completion with the
    shuffle/state-store partition count pinned to 8 for the run: a
    stateful streaming query fixes its state partition count from
    ``spark.sql.shuffle.partitions`` at first start, and the DRIVER's
    plain session leaves the 200 default — 200 state tasks per
    micro-batch for a bounded gate replay, ~25x task overhead for zero
    parallelism benefit. On a real cluster this value is sized to peak
    throughput instead; state partitions persist across restarts.
    Confs restore after the run (pinned_confs), so the query's RESULT
    plan is unaffected. Only for run-to-completion writers
    (availableNow); continuously-triggered streams (st11/st12) manage
    their own lifecycle."""
    from ecmm428_pycart_spark.session import pinned_confs

    with pinned_confs(spark, {"spark.sql.shuffle.partitions": "8"}):
        writer.start().awaitTermination()


QUERIES = {}
ORACLES = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        ORACLES[name] = sql
        return fn
    return deco


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (R16/R17 aggregates + filter).
# Scale notes: single scan, map-side partial aggregation, 6-group output;
# predicate and 7-column projection push into the parquet scan.
# ---------------------------------------------------------------------------
@q("q01_pricing_summary", """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 4)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
             F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
             F.round(F.sum(charge), 2).alias("sum_charge"),
             F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
             F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
             F.round(F.avg("l_discount"), 4).alias("avg_disc"),
             F.count(F.lit(1)).alias("count_order"))
    )


# R6 — equality filter (main.py:102,282-283)
@q("q02_filter_eq", """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer WHERE c_mktsegment = 'BUILDING'
""")
def q02_filter_eq(spark, sf_dir):
    return (_t(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey", "c_name",
                    F.round("c_acctbal", 2).alias("acctbal")))


# R5 — isin membership filter (main.py:57,68,248-249)
@q("q03_filter_isin", """
SELECT n_nationkey, n_name, n_regionkey
FROM nation WHERE n_name NOT IN ('FRANCE', 'GERMANY', 'RUSSIA')
""")
def q03_filter_isin(spark, sf_dir):
    return filter_isin(_t(spark, sf_dir, "nation"), "n_name",
                       ["FRANCE", "GERMANY", "RUSSIA"], negate=True) \
        .select("n_nationkey", "n_name", "n_regionkey")


# R4/R22 — to_int thousands-separator cast (main.py:79-86,91)
@q("q04_cast_clean", """
SELECT doc_id,
       format('{:,}', n_chars)                                   AS n_chars_str,
       CAST(replace(format('{:,}', n_chars), ',', '') AS BIGINT) AS n_chars_rt
FROM documents
""")
def q04_cast_clean(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (docs
            .withColumn("n_chars_str", F.format_number(F.col("n_chars"), 0))
            .withColumn("n_chars_rt", to_int_col(F.col("n_chars_str")))
            .select("doc_id", "n_chars_str", "n_chars_rt"))


# R7 — exclusive numeric range filter (pycart/cartogram.py:357)
@q("q05_range_filter", """
SELECT p_brand, count(*) AS n, round(avg(p_retailprice), 4) AS avg_price
FROM part WHERE p_retailprice > 920.0 AND p_retailprice < 960.0
GROUP BY p_brand
""")
def q05_range_filter(spark, sf_dir):
    return (_t(spark, sf_dir, "part")
            .filter((F.col("p_retailprice") > 920.0)
                    & (F.col("p_retailprice") < 960.0))
            .groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("p_retailprice"), 4).alias("avg_price")))


# R8 — inner equi-joins over the dim hierarchy; dims are broadcast
@q("q06_join_customer_nation_region", """
SELECT r_name, n_name, count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""")
def q06_join_customer_nation_region(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             .groupBy("r_name", "n_name")
             .agg(F.count(F.lit(1)).alias("n_customers"),
                  F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal")))


# R10 — semi-join (main.py:96-105 get_sub_pop)
@q("q07_semi_join", """
SELECT o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_total
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
GROUP BY o_orderpriority
""")
def q07_semi_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = (_t(spark, sf_dir, "customer")
         .filter(F.col("c_mktsegment") == "AUTOMOBILE")
         .select(F.col("c_custkey").alias("o_custkey")))
    return (semi_join(o, c, "o_custkey")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("sum_total")))


# R15 — anti-join (border_util.py:31-39 island split): customers with no
# order in the first model year.
@q("q08_anti_join", """
SELECT n_name, count(*) AS n_customers_without_orders
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
GROUP BY n_name
""")
def q08_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = (_t(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
         .select(F.col("o_custkey").alias("c_custkey")))
    n = _t(spark, sf_dir, "nation")
    return (anti_join(c, o, "c_custkey")
            .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_customers_without_orders")))


# R11 — union / concat (main.py:69; border_util.py:60,86)
@q("q09_union", """
SELECT c_mktsegment, count(*) AS n FROM (
  SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 9000.0
  UNION
  SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'MACHINERY'
) GROUP BY c_mktsegment
""")
def q09_union(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 9000.0).select("c_custkey", "c_mktsegment")
    b = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey", "c_mktsegment")
    return (a.unionByName(b).distinct()
            .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")))


# R12 — per-group argmax dedup (main.py:251)
@q("q10_argmax_per_group", """
SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
) WHERE rn = 1
""")
def q10_argmax_per_group(spark, sf_dir):
    return (argmax_per_group(_t(spark, sf_dir, "customer"),
                             "c_nationkey", "c_acctbal", "c_custkey")
            .select("c_nationkey", "c_custkey",
                    F.round("c_acctbal", 2).alias("acctbal")))


# R16/R17/R18 — sum / max / min aggregates (pycart/cartogram.py:324-341,364)
@q("q11_agg_minmax", """
SELECT c_nationkey,
       count(*) AS n,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal,
       round(sum(c_acctbal), 2) AS sum_bal,
       round(avg(c_acctbal), 4) AS avg_bal
FROM customer GROUP BY c_nationkey
""")
def q11_agg_minmax(spark, sf_dir):
    return (_t(spark, sf_dir, "customer").groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.min("c_acctbal"), 2).alias("min_bal"),
                 F.round(F.max("c_acctbal"), 2).alias("max_bal"),
                 F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
                 F.round(F.avg("c_acctbal"), 4).alias("avg_bal")))


# R21 — ordered running fill (main.py:264-271), partitioned variant
@q("q12_running_fill", """
SELECT event_id, user_id,
       round(last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
       AS last_click_value
FROM events WHERE user_id % 7 = 0
""")
def q12_running_fill(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    filled = running_fill_by(ev, "user_id", "event_id",
                             F.col("event_type") == "click", "value",
                             "last_click_value")
    return filled.select("event_id", "user_id",
                         F.round("last_click_value", 2).alias("last_click_value"))


# R13 — distance-range join, 1-D analog: same-brand price neighbourhood.
# The equi-key (brand) bounds the join; the range predicate filters after.
@q("q13_price_range_join", """
SELECT a.p_brand AS p_brand, count(*) AS n_pairs
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE abs(a.p_retailprice - b.p_retailprice) < 1.0
GROUP BY a.p_brand
""")
def q13_price_range_join(spark, sf_dir):
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_retailprice")
    a = p.alias("a")
    b = p.alias("b")
    return (a.join(b, (F.col("a.p_brand") == F.col("b.p_brand"))
                   & (F.col("a.p_partkey") < F.col("b.p_partkey")))
            .filter(F.abs(F.col("a.p_retailprice") - F.col("b.p_retailprice")) < 1.0)
            .groupBy(F.col("a.p_brand").alias("p_brand"))
            .agg(F.count(F.lit(1)).alias("n_pairs")))


# R23 — static mapping table broadcast join (main.py:208-210 clean_country)
@q("q14_mapping_join", """
SELECT n_name, coalesce(m.code, 'XX') AS code
FROM nation LEFT JOIN (
  VALUES ('UNITED STATES', 'US'), ('UNITED KINGDOM', 'GB'), ('FRANCE', 'FR'),
         ('GERMANY', 'DE'), ('CHINA', 'CN'), ('JAPAN', 'JP'), ('INDIA', 'IN'),
         ('BRAZIL', 'BR'), ('CANADA', 'CA'), ('RUSSIA', 'RU')
) AS m(name, code) ON n_name = m.name
""")
def q14_mapping_join(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    mapping = spark.createDataFrame(
        [("UNITED STATES", "US"), ("UNITED KINGDOM", "GB"), ("FRANCE", "FR"),
         ("GERMANY", "DE"), ("CHINA", "CN"), ("JAPAN", "JP"), ("INDIA", "IN"),
         ("BRAZIL", "BR"), ("CANADA", "CA"), ("RUSSIA", "RU")],
        ["name", "code"])
    return (n.join(F.broadcast(mapping), n.n_name == mapping.name, "left")
            .select("n_name", F.coalesce(F.col("code"), F.lit("XX")).alias("code")))


# Window running sum (beyond-reference window op)
@q("q15_window_running_sum", """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders WHERE o_custkey % 50 = 0
""")
def q15_window_running_sum(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = (W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    return o.select("o_custkey", "o_orderkey",
                    F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"))


# Global top-k with deterministic tiebreak (TakeOrdered physical op)
@q("q16_topk", """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
""")
def q16_topk(spark, sf_dir):
    return (_t(spark, sf_dir, "orders")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
            .limit(10)
            .select("o_orderkey", "o_custkey",
                    F.round("o_totalprice", 2).alias("total")))


# Distinct aggregate
@q("q17_distinct_agg", """
SELECT c_nationkey,
       count(DISTINCT c_mktsegment) AS n_segments,
       count(*) AS n_customers
FROM customer GROUP BY c_nationkey
""")
def q17_distinct_agg(spark, sf_dir):
    return (_t(spark, sf_dir, "customer").groupBy("c_nationkey")
            .agg(F.countDistinct("c_mktsegment").alias("n_segments"),
                 F.count(F.lit(1)).alias("n_customers")))


# Rollup (grouping-sets family; absent in reference, noted in SURVEY §2.2)
@q("q18_rollup", """
SELECT r_name, n_name, round(sum(c_acctbal), 2) AS sum_bal, count(*) AS n
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""")
def q18_rollup(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             .rollup("r_name", "n_name")
             .agg(F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
                  F.count(F.lit(1)).alias("n")))


# Time-bucketed event aggregation (batch form of the streaming pipeline)
@q("q19_events_hourly", """
SELECT CAST(ts AS DATE) AS event_date,
       CAST(EXTRACT(hour FROM ts) AS INTEGER) AS event_hour,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2, 3
""")
def q19_events_hourly(spark, sf_dir):
    return (_t(spark, sf_dir, "events")
            .groupBy(F.col("ts").cast("date").alias("event_date"),
                     F.hour("ts").alias("event_hour"),
                     "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


# q19's streaming twin, EXECUTED through Structured Streaming: file-source
# stream over the events parquet → watermarked tumbling-window agg →
# availableNow trigger draining into a memory sink — the same incremental
# path a kafka/file production stream runs, oracle-checked against the
# batch SQL (streaming/batch equivalence as a driver-gated property, not
# just a pytest one). Complete output mode so the final table includes
# windows newer than the last watermark.
@q("st01_stream_hourly", """
SELECT CAST(ts AS DATE) AS event_date,
       CAST(EXTRACT(hour FROM ts) AS INTEGER) AS event_hour,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2, 3
""")
def st01_stream_hourly(spark, sf_dir):
    import os
    import tempfile
    import uuid

    from ecmm428_pycart_spark.streaming.events import (
        hourly_event_counts, read_events_stream)

    d = _scratch("st01_events_")
    os.symlink(os.path.join(sf_dir, "events.parquet"),
               os.path.join(d, "events.parquet"))
    stream = read_events_stream(spark, d)
    name = f"st01_{uuid.uuid4().hex[:8]}"
    _await_stream(spark, hourly_event_counts(stream).writeStream
          .format("memory").queryName(name)
          .outputMode("complete").trigger(availableNow=True))
    out = spark.table(name)
    return (out.select(F.col("window_start").cast("date").alias("event_date"),
                       F.hour("window_start").alias("event_hour"),
                       "event_type", "n", "sum_value")
            .groupBy("event_date", "event_hour", "event_type")
            .agg(F.sum("n").alias("n"),
                 F.round(F.sum("sum_value"), 2).alias("sum_value")))


# Streaming sessionization EXECUTED through session_window +
# availableNow, oracle-checked against the lag-based batch definition of
# gap sessions: session_window merges events < 30 min apart, so session
# start = min(ts), end = max(ts) + gap, per (user, session). Timestamps
# reduce to epoch micros for cross-engine compare.
@q("st02_stream_sessions", """
WITH x AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) + 1800000000 AS session_end_us,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM s GROUP BY user_id, sid
""")
def st02_stream_sessions(spark, sf_dir):
    import os
    import tempfile
    import uuid

    from ecmm428_pycart_spark.streaming.events import (
        read_events_stream, sessionize_stream)

    d = _scratch("st02_events_")
    os.symlink(os.path.join(sf_dir, "events.parquet"),
               os.path.join(d, "events.parquet"))
    stream = read_events_stream(spark, d)
    name = f"st02_{uuid.uuid4().hex[:8]}"
    _await_stream(spark, sessionize_stream(stream).writeStream
          .format("memory").queryName(name)
          .outputMode("complete").trigger(availableNow=True))
    return (spark.table(name)
            .select("user_id",
                    F.unix_micros("session_start").alias("session_start_us"),
                    F.unix_micros("session_end").alias("session_end_us"),
                    "n_events", "sum_value"))


# Streaming exact-dedup through dropDuplicates over a watermarked
# stream (bounded per-key state) — projected to the key columns so the
# result is the distinct key set, deterministic and oracle-checkable.
@q("st03_stream_dedup", """
SELECT DISTINCT user_id, event_type FROM events
""")
def st03_stream_dedup(spark, sf_dir):
    import os
    import tempfile
    import uuid

    from ecmm428_pycart_spark.streaming.events import read_events_stream

    d = _scratch("st03_events_")
    os.symlink(os.path.join(sf_dir, "events.parquet"),
               os.path.join(d, "events.parquet"))
    stream = (read_events_stream(spark, d)
              .select("user_id", "event_type", "ts")
              .withWatermark("ts", "2 hours")
              .dropDuplicates(["user_id", "event_type"])
              .select("user_id", "event_type"))
    name = f"st03_{uuid.uuid4().hex[:8]}"
    _await_stream(spark, stream.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(availableNow=True))
    return spark.table(name)


# Custom stateful operator EXECUTED through applyInPandasWithState:
# per-user running (count, sum, max) accumulated in the state store
# across micro-batches, drained with availableNow. The final update per
# user equals the full-history aggregate, which IS the oracle. State is
# one tuple per user (bounded by |users|, not |events|). Robust to any
# micro-batch split: updates are monotone in n_events, so max(struct)
# picks each user's last update regardless of sink row order.
@q("st04_stream_user_stats", """
SELECT user_id, count(*) AS n_events,
       round(sum(value), 2) AS sum_value, max(value) AS max_value
FROM events GROUP BY user_id
""")
def st04_stream_user_stats(spark, sf_dir):
    import os
    import tempfile
    import uuid

    from ecmm428_pycart_spark.streaming.events import (
        read_events_stream, running_user_stats)

    d = _scratch("st04_events_")
    os.symlink(os.path.join(sf_dir, "events.parquet"),
               os.path.join(d, "events.parquet"))
    stream = read_events_stream(spark, d)
    name = f"st04_{uuid.uuid4().hex[:8]}"
    _await_stream(spark, running_user_stats(stream).writeStream
          .format("memory").queryName(name)
          .outputMode("update").trigger(availableNow=True))
    last = (spark.table(name)
            .groupBy("user_id")
            .agg(F.max(F.struct("n_events", "sum_value", "max_value"))
                 .alias("s")))
    return last.select(
        "user_id", F.col("s.n_events").alias("n_events"),
        F.round("s.sum_value", 2).alias("sum_value"),
        F.col("s.max_value").alias("max_value"))


# Skew-safe two-level salted aggregation over the hot event_type keys —
# result is identical to the plain groupBy (algebraic aggregate), which
# IS the oracle; the salted plan spreads each hot key over N reducers.
# TPC-H Q6 shape: the forecast-revenue scan-aggregate whose entire
# predicate (date range + discount band + quantity cap) pushes to the
# parquet scan — at 100 TB this query IS its I/O, so the plan must show
# all three ranges in PushedFilters and a 3-column ReadSchema
# (test_q51_all_predicates_pushed pins that).
@q("q51_forecast_revenue", """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""")
def q51_forecast_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")),
                     2).alias("revenue"),
             F.count(F.lit(1)).alias("n")))


# TPC-H Q3-shaped shipping-priority query (o_orderpriority stands in
# for the generator's missing o_shippriority): the canonical
# fact-to-fact join. Scale shape: both fact scans carry their date
# predicate into parquet; lineitem⋈orders shuffles on orderkey (SMJ at
# real scale, AQE may broadcast at toy scale); the filtered customer
# dim is broadcast. Top-10 is TakeOrderedAndProject — no global sort.
@q("q52_shipping_priority", """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(o_orderdate AS DATE) AS order_date,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, order_date ASC, l_orderkey ASC
LIMIT 10
""")
def q52_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cut = F.lit("1998-06-01 00:00:00").cast("timestamp")
    cust = (_t(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (_t(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") < cut)
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"))
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") > cut)
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    j = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")))
    return (j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .select("l_orderkey", "revenue",
                    F.col("o_orderdate").cast("date").alias("order_date"),
                    "o_orderpriority")
            .orderBy(F.col("revenue").desc(), F.col("order_date").asc(),
                     F.col("l_orderkey").asc())
            .limit(10))


# TPC-H Q5-shaped local-supplier volume: the 6-table star+fact join
# with the extra c_nationkey = s_nationkey equi-condition. Scale shape:
# region→nation→customer collapses into broadcast dims; lineitem⋈orders
# is the only fact-fact shuffle; supplier (dim) broadcasts and the
# nation-match condition rides the join, not a post-filter.
@q("q53_local_supplier_volume", """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""")
def q53_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = (_t(spark, sf_dir, "region")
              .filter(F.col("r_name") == "ASIA").select("r_regionkey"))
    nation = (_t(spark, sf_dir, "nation")
              .join(F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"))
              .select("n_nationkey", "n_name"))
    cust = (_t(spark, sf_dir, "customer")
            .join(F.broadcast(nation),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", "c_nationkey", "n_name"))
    orders = (_t(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate")
                       >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
                      & (F.col("o_orderdate")
                         < F.lit("1998-01-01 00:00:00").cast("timestamp")))
              .select("o_orderkey", "o_custkey"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    j = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
         .join(F.broadcast(supp),
               (F.col("l_suppkey") == F.col("s_suppkey"))
               & (F.col("c_nationkey") == F.col("s_nationkey"))))
    return (j.groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


# TPC-H Q10-shaped returned-item reporting, with the scale-honest plan
# REVERSED from the textbook join order: revenue is aggregated per
# custkey straight off the lineitem⋈orders fact join, the top-20 is
# taken THEN (TakeOrderedAndProject on 20 rows), and only those 20
# keys join back to customer/nation — so the wide customer table is
# never shuffled and the name/nation attach is a broadcast of 20 rows.
# custkey is the grouping key's primary key, so this is semantically
# identical to Q10's group-by-everything form (the oracle states it in
# that canonical form).
@q("q54_returned_items", """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""")
def q54_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R")
          .select("l_orderkey",
                  (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                  .alias("rev")))
    orders = (_t(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate")
                       >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
                      & (F.col("o_orderdate")
                         < F.lit("1997-07-01 00:00:00").cast("timestamp")))
              .select("o_orderkey", "o_custkey"))
    top = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
           .groupBy("o_custkey")
           .agg(F.round(F.sum("rev"), 2).alias("revenue"))
           .orderBy(F.col("revenue").desc(), F.col("o_custkey").asc())
           .limit(20))
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = (_t(spark, sf_dir, "customer")
            .join(F.broadcast(nation),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", "c_name", "n_name"))
    return (cust.join(F.broadcast(top),
                      F.col("c_custkey") == F.col("o_custkey"))
            .select("c_custkey", "c_name", "n_name", "revenue"))


# TPC-H Q4-shaped order-priority check: how many orders per priority
# had at least one line shipped >60 days after ordering. The EXISTS is
# a LEFT SEMI join whose condition mixes the orderkey equi-key with a
# cross-table range predicate (l_shipdate > o_orderdate + 60d) — the
# semi-join dedups order-side rows before the aggregate, so a multi-late
# order still counts once. Scale shape: both scans push their column
# prunes; the semi-join shuffles on orderkey only (no payload columns).
@q("q55_late_shipment_priority", """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""")
def q55_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (_t(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate")
                       >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
                      & (F.col("o_orderdate")
                         < F.lit("1997-07-01 00:00:00").cast("timestamp")))
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"))
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate")
           > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_late_orders")))


# TPC-H Q18-shaped large-volume customers: the aggregate-then-semi
# pattern. The HAVING filter runs on the lineitem aggregate ALONE
# (one shuffle on orderkey, map-side partial sums), producing a tiny
# qualifying-keys set that broadcasts into orders and customer — the
# canonical "reduce before you join" shape; at 100 TB the only wide
# shuffle is the per-orderkey partial-aggregated quantity sum.
@q("q56_large_volume_customers", """
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       round(o_totalprice, 2) AS total_price,
       round(big.qty, 2) AS total_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 175) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
""")
def q56_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (_t(spark, sf_dir, "lineitem")
           .groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("qty"))
           .filter(F.col("qty") > 175))
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (orders.join(F.broadcast(big),
                        F.col("o_orderkey") == F.col("l_orderkey"))
            .join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .select("c_custkey", "c_name", "o_orderkey",
                    F.col("o_orderdate").cast("date").alias("order_date"),
                    F.round("o_totalprice", 2).alias("total_price"),
                    F.round("qty", 2).alias("total_qty")))


# TPC-H Q13-shaped customer order-count distribution: LEFT OUTER join
# so zero-order customers survive with count 0, then a SECOND
# aggregation over the first's output (the "distribution of a
# distribution" double-shuffle shape). count(o_orderkey) — not
# count(*) — is what turns the null-padded rows into zeros. The first
# shuffle is on custkey (wide), the second groups ~dozens of distinct
# counts — map-side partials collapse it to almost nothing.
@q("q57_order_count_distribution", """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) per_cust
GROUP BY c_count
""")
def q57_order_count_distribution(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (cust.join(orders, F.col("c_custkey") == F.col("o_custkey"),
                          "left_outer")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


# TPC-H Q22-shaped dormant high-balance customers (adapted: the
# driver's schema has no c_phone, so the cohort key is the nation
# rather than the phone country code, and "dormant" means no order
# since 2000-01-01 rather than never — same plan shape, but the anti
# join has survivors at every sf). Three pieces: a scalar subquery
# (global average balance → 1-row broadcast into the filter, q35's
# pattern, no driver collect), an ANTI join against the date-filtered
# orders, and a per-nation rollup. The anti join shuffles only
# custkeys; the date predicate pushes into the orders scan.
@q("q58_dormant_high_balance", """
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_custs,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                   WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY n_name
""")
def q58_dormant_high_balance(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = (cust.filter(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("_avg_bal")))
    rich = (cust.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("_avg_bal"))
            .drop("_avg_bal"))
    orders = (_t(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate")
                      >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
              .select("o_custkey"))
    dormant = rich.join(orders, F.col("c_custkey") == F.col("o_custkey"),
                        "left_anti")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (dormant.join(F.broadcast(nation),
                         F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_custs"),
                 F.round(F.sum("c_acctbal"), 2).alias("total_bal")))


# Z-order layout + manifest data skipping EXECUTED in the gate: the
# lakehouse data-skipping pattern (sources/zorder.py) end-to-end.
# lineitem is rewritten as 32 parquet files z-ordered on
# (ship day, partkey), a per-file min/max manifest is built in one
# pass, and the read path consults ONLY the manifest to decide which
# files can contain rows in the 2-D predicate box — the multi-column
# analog of partition pruning and the biggest scan-saver for a
# 100 TB fact with box predicates. Skipping is an optimization, never
# a filter: the row-level predicate still applies, so any wrongly
# skipped file would hash-mismatch against the straight-scan oracle.
# (tests/test_sources_ops.py asserts files_read << files_total.)
@q("q59_zorder_skipping", """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
  AND l_shipdate <= TIMESTAMP '1996-08-31 00:00:00'
  AND l_partkey <= 100
GROUP BY l_returnflag
""")
def q59_zorder_skipping(spark, sf_dir):
    import tempfile

    from ecmm428_pycart_spark.sources.zorder import (
        build_manifest, read_skipping, zorder_write)

    li = (_t(spark, sf_dir, "lineitem")
          .withColumn("ship_day",
                      F.datediff(F.col("l_shipdate"),
                                 F.lit("1995-01-01").cast("date"))))
    path = _scratch("q59_zorder_")
    zorder_write(li, path, "ship_day", "l_partkey", n_files=32)
    build_manifest(spark, path, ["ship_day", "l_partkey"])
    from datetime import date
    epoch = date(1995, 1, 1)
    lo_d = (date(1996, 6, 1) - epoch).days
    hi_d = (date(1996, 8, 31) - epoch).days
    back, _, _ = read_skipping(
        spark, path, {"ship_day": (lo_d, hi_d), "l_partkey": (None, 100)})
    return (back.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


# Sink→source round trip EXECUTED in the gate: orders written as
# ORC partitioned by order month, read back with a partition filter,
# aggregated — proving the columnar sink, the hive-style partition
# layout, and source-level partition pruning end-to-end. The oracle
# computes the same aggregate straight from the parquet table, so any
# row lost/duplicated/retyped by the round trip hash-mismatches.
@q("q50_orc_roundtrip", """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
       o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
WHERE date_trunc('month', o_orderdate) >= DATE '1997-01-01'
GROUP BY 1, 2
""")
def q50_orc_roundtrip(spark, sf_dir):
    import tempfile

    from ecmm428_pycart_spark.sources.sinks import read_orc, write_orc

    orders = (_t(spark, sf_dir, "orders")
              .withColumn("order_month",
                          F.trunc("o_orderdate", "month")))
    path = _scratch("q50_orc_")
    write_orc(orders, path, partition_by=["order_month"])
    back = read_orc(spark, path).filter(
        F.col("order_month") >= F.lit("1997-01-01").cast("date"))
    return (back.groupBy("order_month", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total")))


# Data-quality constraint report (the Deequ-style gate a corpus
# pipeline runs before a training job): one row per declared constraint
# with its violation count. Per-table checks collapse into ONE scan per
# table (conditional aggregates); the FK check is a left-anti join. The
# set deliberately mixes structurally-zero constraints (integrity holds)
# with distributional ones that fire (non-vacuous value comparison).
@q("q49_constraint_report", """
SELECT * FROM (
  SELECT 'orders_custkey_fk' AS constraint_name, CAST(count(*) AS BIGINT) AS violations
  FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
  UNION ALL
  SELECT 'customer_pk_unique', CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) FROM customer
  UNION ALL
  SELECT 'lineitem_qty_le45', CAST(count(*) FILTER (l_quantity > 45) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'orders_totalprice_le400k', CAST(count(*) FILTER (o_totalprice > 400000) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'events_value_nonnull', CAST(count(*) FILTER (value IS NULL) AS BIGINT) FROM events
  UNION ALL
  SELECT 'events_value_le99', CAST(count(*) FILTER (value > 99) AS BIGINT) FROM events
  UNION ALL
  SELECT 'documents_text_ge100chars', CAST(count(*) FILTER (length(text) < 100) AS BIGINT) FROM documents
)
""")
def q49_constraint_report(spark, sf_dir):
    def row(name, df):
        return df.select(F.lit(name).alias("constraint_name"),
                         F.col("violations").cast("long"))

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    ev = _t(spark, sf_dir, "events")
    docs = _t(spark, sf_dir, "documents")
    cnt = lambda cond: F.count(F.when(cond, 1)).alias("violations")

    fk = (orders.join(cust, orders["o_custkey"] == cust["c_custkey"],
                      "left_anti")
          .agg(F.count(F.lit(1)).alias("violations")))
    pk = cust.agg((F.count(F.lit(1))
                   - F.countDistinct("c_custkey")).alias("violations"))
    qty = li.agg(cnt(F.col("l_quantity") > 45))
    tot = orders.agg(cnt(F.col("o_totalprice") > 400000))
    evn = ev.agg(cnt(F.col("value").isNull()))
    evb = ev.agg(cnt(F.col("value") > 99))
    short = docs.agg(cnt(F.length("text") < 100))

    return (row("orders_custkey_fk", fk)
            .unionByName(row("customer_pk_unique", pk))
            .unionByName(row("lineitem_qty_le45", qty))
            .unionByName(row("orders_totalprice_le400k", tot))
            .unionByName(row("events_value_nonnull", evn))
            .unionByName(row("events_value_le99", evb))
            .unionByName(row("documents_text_ge100chars", short)))


# Join-side skew safety: the replicated (salted) join — big side gets a
# deterministic salt, the dim side is exploded num_salts× and the join
# runs on (key, salt), spreading a hot key over N tasks where AQE's
# sort-merge skew split can't help (broadcast-ineligible medium dims).
# The gate checks the property that makes it usable at all: the result
# is IDENTICAL to the plain inner join, which is the oracle.
@q("q48_replicated_skew_join", """
SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
       round(sum(l_extendedprice), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""")
def q48_replicated_skew_join(spark, sf_dir):
    from ecmm428_pycart_spark.operators.skew import replicate_join_skewed
    li = (_t(spark, sf_dir, "lineitem")
          .select(F.col("l_partkey").alias("k"), "l_extendedprice"))
    dim = (_t(spark, sf_dir, "part")
           .select(F.col("p_partkey").alias("k"), "p_brand"))
    joined = replicate_join_skewed(li, dim, "k", num_salts=8)
    return (joined.groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("l_extendedprice"), 2).alias("revenue")))


@q("q42_salted_agg", """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY event_type
""")
def q42_salted_agg(spark, sf_dir):
    from ecmm428_pycart_spark.operators.skew import salted_sum
    ev = _t(spark, sf_dir, "events")
    sums = salted_sum(ev, ["event_type"], "value", "_sv")
    counts = salted_sum(ev.withColumn("_one", F.lit(1)),
                        ["event_type"], "_one", "n")
    return (sums.join(counts, "event_type")
            .select("event_type", F.col("n").cast("long").alias("n"),
                    F.round("_sv", 2).alias("sum_value")))


# Gap-based sessionization via lag window (beyond-reference)
@q("q20_sessionize", """
WITH x AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT user_id,
       CAST(sum(CASE WHEN prev_ts IS NULL
                     OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM x GROUP BY user_id
""")
def q20_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_new = (F.col("prev_ts").isNull()
               | ((F.unix_micros("ts") - F.unix_micros("prev_ts")) > 1800000000))
    return (ev.withColumn("prev_ts", F.lag("ts").over(w))
            .groupBy("user_id")
            .agg(F.sum(F.when(gap_new, 1).otherwise(0)).alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events")))


# JSON property extraction (events.props is a JSON object string)
@q("q21_json_extract", """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
FROM events GROUP BY event_type
""")
def q21_json_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(k).alias("sum_k"),
                 F.round(F.avg(k), 4).alias("avg_k")))


# Multi-table fact join: revenue by nation (R8+R16 at fact-table scale).
# lineitem⋈orders shuffles on orderkey; dims broadcast.
@q("q22_revenue_by_nation", """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
""")
def q22_revenue_by_nation(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .groupBy("n_name")
              .agg(F.round(F.sum(rev), 2).alias("revenue"),
                   F.count(F.lit(1)).alias("n_lineitems")))


# ---------------------------------------------------------------------------
# Extended SQL surface (beyond the reference — SURVEY.md §2.2 closing note:
# Spark built-ins cover these for free; exposed so the engine's coverage is
# oracle-verified, not just claimed).
# ---------------------------------------------------------------------------

# Pivot (conditional aggregation — oracle uses portable CASE WHEN form)
@q("q23_pivot", """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
FROM lineitem GROUP BY l_returnflag
""")
def q23_pivot(spark, sf_dir):
    return (_t(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .pivot("l_linestatus", ["O", "F"])
            .agg(F.round(F.sum("l_quantity"), 2)))


# Cube (full grouping-sets lattice)
@q("q24_cube", """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""")
def q24_cube(spark, sf_dir):
    return (_t(spark, sf_dir, "lineitem")
            .cube("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("l_quantity"), 2).alias("sum_qty")))


# Exact median + dispersion statistics
@q("q25_stats", """
SELECT l_returnflag,
       round(median(l_quantity), 4) AS med_qty,
       round(stddev_samp(l_discount), 6) + 0 AS sd_disc,
       round(corr(l_extendedprice, l_quantity), 6) + 0 AS corr_price_qty
FROM lineitem GROUP BY l_returnflag
""")
def q25_stats(spark, sf_dir):
    return (_t(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(F.median("l_quantity"), 4).alias("med_qty"),
                 F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
                 F.round(F.corr("l_extendedprice", "l_quantity"), 6)
                  .alias("corr_price_qty")))


# Monthly time-series rollup over order dates
@q("q26_orders_by_month", """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY 1
""")
def q26_orders_by_month(spark, sf_dir):
    return (_t(spark, sf_dir, "orders")
            .groupBy(F.date_trunc("month", "o_orderdate").cast("date")
                     .alias("order_month"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue")))


# String functions: LIKE filter, substring/concat/upper projection
@q("q27_string_ops", """
SELECT p_partkey,
       upper(substr(p_name, 1, 4)) AS name_head,
       p_brand || '/' || p_type AS brand_type,
       length(p_name) AS name_len
FROM part WHERE p_name LIKE '%re%'
""")
def q27_string_ops(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (p.filter(F.col("p_name").like("%re%"))
            .select("p_partkey",
                    F.upper(F.substring("p_name", 1, 4)).alias("name_head"),
                    F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
                    F.length("p_name").cast("long").alias("name_len")))


# HAVING: post-aggregation filter
@q("q28_having", """
SELECT c_nationkey, count(*) AS n
FROM customer GROUP BY c_nationkey HAVING count(*) > 60
""")
def q28_having(spark, sf_dir):
    return (_t(spark, sf_dir, "customer")
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 60))


# Per-group top-k (two-level agg + rank window)
@q("q29_topk_per_group", """
SELECT event_type, user_id, total_value FROM (
  SELECT event_type, user_id,
         round(sum(value), 2) AS total_value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY round(sum(value), 2) DESC, user_id ASC)
         AS rn
  FROM events GROUP BY event_type, user_id
) WHERE rn <= 3
""")
def q29_topk_per_group(spark, sf_dir):
    ev = (_t(spark, sf_dir, "events")
          .groupBy("event_type", "user_id")
          .agg(F.round(F.sum("value"), 2).alias("total_value")))
    w = W.partitionBy("event_type").orderBy(F.col("total_value").desc(),
                                            F.col("user_id").asc())
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("event_type", "user_id", "total_value"))


# lead/lag windows: per-user inter-event gap statistics
@q("q30_lead_lag", """
WITH x AS (
  SELECT user_id, event_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER
           (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us,
         lead(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT user_id,
       CAST(count(gap_us) AS BIGINT) AS n_gaps,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       CAST(sum(CASE WHEN next_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_before_error
FROM x GROUP BY user_id
""")
def q30_lead_lag(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    x = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"))
    return (x.groupBy("user_id")
            .agg(F.count("gap_us").alias("n_gaps"),
                 F.min("gap_us").alias("min_gap_us"),
                 F.max("gap_us").alias("max_gap_us"),
                 F.sum(F.when(F.col("next_type") == "error", 1).otherwise(0))
                  .alias("n_before_error")))


# As-of join (backward): for each click event, the most recent prior
# error value of the same user. Spark composes it (operators/asof.py);
# the oracle uses DuckDB's native ASOF JOIN — two independent
# implementations of the same semantics.
@q("q31_asof_join", """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
errors AS (
  SELECT user_id, ts, round(max(value), 2) AS err_value
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id, e.err_value AS asof_err_value
FROM clicks c ASOF LEFT JOIN errors e
  ON c.user_id = e.user_id AND c.ts >= e.ts
""")
def q31_asof_join(spark, sf_dir):
    from ecmm428_pycart_spark.operators.asof import asof_join_backward
    ev = _t(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts"))
    errors = (ev.filter(F.col("event_type") == "error")
              .groupBy("user_id", "ts")
              .agg(F.round(F.max("value"), 2).alias("err_value")))
    out = asof_join_backward(clicks, errors, "user_id", "ts", "ts",
                             ["err_value"])
    return out.select("event_id", "user_id", "asof_err_value")


# Interval / range-bucket join: value → named band via broadcast
# interval table + range predicate (BroadcastNestedLoop on a 4-row dim;
# at scale the equivalent arithmetic bucketing is a map-side expression).
@q("q32_range_bucket_join", """
SELECT b.band, count(*) AS n, round(sum(e.value), 2) AS sum_value
FROM events e JOIN (
  VALUES ('low', 0.0, 5.0), ('mid', 5.0, 10.0),
         ('high', 10.0, 15.0), ('top', 15.0, 1e9)
) AS b(band, lo, hi)
  ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band
""")
def q32_range_bucket_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 5.0), ("mid", 5.0, 10.0),
         ("high", 10.0, 15.0), ("top", 15.0, 1e9)],
        ["band", "lo", "hi"])
    return (ev.join(F.broadcast(bands),
                    (ev.value >= bands.lo) & (ev.value < bands.hi))
            .groupBy("band")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


# Full outer join: per-nation customer counts vs supplier counts
@q("q33_outer_join", """
WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust
           FROM customer GROUP BY c_nationkey),
s AS (SELECT s_nationkey AS nk, count(*) AS n_supp
      FROM supplier GROUP BY s_nationkey)
SELECT coalesce(c.nk, s.nk) AS nationkey,
       coalesce(n_cust, 0) AS n_cust,
       coalesce(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.nk = s.nk
""")
def q33_outer_join(spark, sf_dir):
    cust = (_t(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("nk"))
            .agg(F.count(F.lit(1)).alias("n_cust")))
    supp = (_t(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("nk_s"))
            .agg(F.count(F.lit(1)).alias("n_supp")))
    j = cust.join(supp, cust.nk == supp.nk_s, "full_outer")
    return j.select(
        F.coalesce("nk", "nk_s").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"))


# Set operations: INTERSECT and EXCEPT (distinct semantics)
@q("q34_set_ops", """
SELECT 'both' AS side, n_nationkey FROM (
  SELECT DISTINCT c_nationkey AS n_nationkey FROM customer WHERE c_acctbal > 9500.0
  INTERSECT
  SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
UNION ALL
SELECT 'only_rich' AS side, n_nationkey FROM (
  SELECT DISTINCT c_nationkey AS n_nationkey FROM customer WHERE c_acctbal > 9500.0
  EXCEPT
  SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
""")
def q34_set_ops(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    rich = (c.filter(F.col("c_acctbal") > 9500.0)
            .select(F.col("c_nationkey").alias("n_nationkey")).distinct())
    bld = (c.filter(F.col("c_mktsegment") == "BUILDING")
           .select(F.col("c_nationkey").alias("n_nationkey")).distinct())
    both = rich.intersect(bld).select(F.lit("both").alias("side"), "n_nationkey")
    only = rich.exceptAll(bld).distinct() \
        .select(F.lit("only_rich").alias("side"), "n_nationkey")
    return both.unionAll(only)


# Scalar subquery: customers above the global average balance
@q("q35_scalar_subquery", """
SELECT c_nationkey, count(*) AS n_above_avg
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
GROUP BY c_nationkey
""")
def q35_scalar_subquery(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    avg1 = c.agg(F.avg("c_acctbal").alias("_avg"))
    return (c.crossJoin(F.broadcast(avg1))
            .filter(F.col("c_acctbal") > F.col("_avg"))
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_above_avg")))


# Null-handling expressions: nullif / coalesce / count ignoring nulls
@q("q36_null_ops", """
SELECT event_type,
       count(*) AS n,
       count(nullif(value, 0.0)) AS n_nonzero,
       round(sum(coalesce(nullif(value, 0.0), -1.0)), 2) + 0 AS adjusted_sum
FROM events GROUP BY event_type
""")
def q36_null_ops(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    nz = F.nullif(F.col("value"), F.lit(0.0))
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count(nz).alias("n_nonzero"),
                 F.round(F.sum(F.coalesce(nz, F.lit(-1.0))), 2)
                  .alias("adjusted_sum")))


# Ranking-function family with deterministic ordering
@q("q37_rank_family", """
SELECT c_custkey, c_nationkey,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       CAST(ntile(4)  OVER w AS INTEGER) AS quartile,
       round(percent_rank() OVER w, 6) AS prank
FROM customer
WHERE c_nationkey < 3
WINDOW w AS (PARTITION BY c_nationkey
             ORDER BY round(c_acctbal, 2) DESC, c_custkey ASC)
""")
def q37_rank_family(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 3)
    w = W.partitionBy("c_nationkey").orderBy(
        F.round("c_acctbal", 2).desc(), F.col("c_custkey").asc())
    return c.select(
        "c_custkey", "c_nationkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"))


def q38_sketches(spark, sf_dir):
    """Approximate sketches (HLL++ distinct, t-digest-ish percentile) —
    engine-specific estimators, so no cross-engine oracle (rows-only);
    Spark's implementations are deterministic for fixed input. The
    output is self-validating: each row carries the exact answers and
    relative errors, so the rows-only check still shows the sketches
    land inside their documented bounds (HLL++ rsd 5%;
    test_sketch_queries_error_bounds asserts them too)."""
    li = _t(spark, sf_dir, "lineitem")
    out = (li.groupBy("l_returnflag")
           .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"),
                F.countDistinct("l_partkey").alias("exact_parts"),
                F.round(F.percentile_approx("l_extendedprice", 0.5), 2)
                 .alias("approx_median_price"),
                F.round(F.expr("percentile(l_extendedprice, 0.5)"), 2)
                 .alias("exact_median_price")))
    rel = lambda a, e: F.round(F.abs(F.col(a) - F.col(e))
                               / F.col(e).cast("double"), 4)
    return out.select(
        "l_returnflag", "approx_parts", "exact_parts",
        rel("approx_parts", "exact_parts").alias("distinct_rel_err"),
        "approx_median_price", "exact_median_price",
        rel("approx_median_price", "exact_median_price")
         .alias("median_rel_err"))


# q38_sketches stays available as a library helper but is DEREGISTERED
# from the gate registry (round 4): it was the only oracle-less entry —
# engine-specific estimates can't hash-match cross-engine — and its
# hash-checked face q38_sketch_accuracy below supersedes it, keeping
# len(queries()) == len(oracle_sql()).


# Hash-checkable face of q38: the exact answers ARE cross-engine
# comparable, and the sketch estimates reduce to within-bound booleans
# (measured worst error across sf0.001..sf0.1: distinct 2.7%, median
# 0.08%; bounds 10% / 1% leave generous margin, and a drifting sketch
# flips a boolean and reddens the row). The raw estimates stay in
# q38_sketches, outside the gate, per the engine-specific-estimator
# rationale documented there.
# The exact median is the DISCRETE (lower) median — the data value at
# rank (n+1)//2 — not the interpolated one: interpolation midpoints
# are computed with different float expressions in Spark's
# percentile() vs DuckDB's quantile_cont(), and at sf0.001 the 'R'
# group midpoint lands a cent apart after round(..,2). A rank-selected
# element is bit-identical in any engine.
@q("q38_sketch_accuracy", """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
),
med AS (
  SELECT l_returnflag, round(max(l_extendedprice), 2) AS exact_median_price
  FROM ranked WHERE rn = (n + 1) // 2
  GROUP BY l_returnflag
),
agg AS (
  SELECT l_returnflag,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts
  FROM lineitem GROUP BY l_returnflag
)
SELECT a.l_returnflag, exact_parts, exact_median_price,
       TRUE AS distinct_within_bound,
       TRUE AS median_within_bound
FROM agg a JOIN med m ON a.l_returnflag = m.l_returnflag
""")
def q38_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    ranked = (li.select("l_returnflag", "l_extendedprice")
              .withColumn("_rn", F.row_number().over(
                  W.partitionBy("l_returnflag").orderBy("l_extendedprice")))
              .withColumn("_n", F.count(F.lit(1)).over(
                  W.partitionBy("l_returnflag"))))
    med = (ranked.filter(F.col("_rn") == F.floor((F.col("_n") + 1) / 2))
           .groupBy("l_returnflag")
           .agg(F.round(F.max("l_extendedprice"), 2)
                .alias("exact_median_price")))
    agg = (li.groupBy("l_returnflag")
           .agg(F.approx_count_distinct("l_partkey").alias("_ap"),
                F.countDistinct("l_partkey").alias("exact_parts"),
                F.percentile_approx("l_extendedprice", 0.5).alias("_am"),
                F.expr("percentile(l_extendedprice, 0.5)").alias("_em")))
    rel = lambda a, e: (F.abs(F.col(a) - F.col(e))
                        / F.abs(F.col(e)).cast("double"))
    return (agg.join(med, "l_returnflag")
            .select(
                "l_returnflag", "exact_parts", "exact_median_price",
                (rel("_ap", "exact_parts") <= 0.10)
                .alias("distinct_within_bound"),
                (rel("_am", "_em") <= 0.01).alias("median_within_bound")))


# Deterministic distinct-count sketch: KMV (bottom-k minimum values).
# Unlike HLL (q38, engine-specific registers), KMV is exactly
# reproducible across engines: hash = first 8 md5 hex chars as a uint32,
# keep the k smallest distinct hashes, estimate = (k-1)·2^32 / h_k.
# Spark's distinct→orderBy→limit(k) compiles to TakeOrderedAndProject
# (per-partition bottom-k, merged once — no full sort shuffle), which is
# exactly how a 1000-executor KMV would run; the sketch itself is
# mergeable by unioning bottom-k sets. Estimate lands within ~6% of the
# true distinct count at k=256, asserted via rel_err in the output.
@q("q47_kmv_sketch", """
WITH h AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT AS hv
  FROM lineitem
),
bottomk AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
kth AS (SELECT CAST(max(hv) AS BIGINT) AS h_k,
               CAST(count(*) AS BIGINT) AS k
        FROM bottomk),
exact AS (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact
          FROM lineitem)
SELECT k, h_k,
       round((k - 1) * 4294967296.0 / h_k, 2) AS est_distinct,
       n_exact,
       round(abs((k - 1) * 4294967296.0 / h_k - n_exact) / n_exact, 4)
         AS rel_err
FROM kth, exact
""")
def q47_kmv_sketch(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    hv = F.conv(F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 8),
                16, 10).cast("long")
    bottomk = (li.select(hv.alias("hv")).distinct()
               .orderBy("hv").limit(256))
    kth = bottomk.agg(F.max("hv").alias("h_k"),
                      F.count(F.lit(1)).alias("k"))
    exact = li.agg(F.countDistinct("l_partkey").alias("n_exact"))
    est = (F.col("k") - 1) * F.lit(4294967296.0) / F.col("h_k")
    return (kth.crossJoin(F.broadcast(exact))
            .select("k", "h_k",
                    F.round(est, 2).alias("est_distinct"),
                    "n_exact",
                    F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4)
                     .alias("rel_err")))


# Ordered funnel analysis: users progressing view → click → purchase in
# timestamp order (conditional min-timestamps per stage, then ordering
# predicates — the set-based funnel formulation that scales as one agg).
@q("q39_funnel", """
WITH stage AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT
  count(*) AS n_users,
  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
  CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
           THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
  CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                 AND t_purchase > t_click
           THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
FROM stage
""")
def q39_funnel(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    t = F.unix_micros("ts")
    stage = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", t)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", t)).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", t)).alias("t_purchase"))
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    full = clicked & (F.col("t_purchase") > F.col("t_click"))
    return stage.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(viewed, 1).otherwise(0)).alias("n_viewed"),
        F.sum(F.when(clicked, 1).otherwise(0)).alias("n_clicked_after_view"),
        F.sum(F.when(full, 1).otherwise(0)).alias("n_full_funnel"))


# IQR outlier detection: exact interpolated quartiles (both engines use
# linear interpolation), then a self-join-free two-pass filter.
@q("q40_iqr_outliers", """
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY event_type
)
SELECT e.event_type, count(*) AS n_outliers,
       round(min(e.value), 2) AS min_outlier,
       round(max(e.value), 2) AS max_outlier
FROM events e JOIN b USING (event_type)
WHERE e.value > b.q3 + 1.5 * (b.q3 - b.q1)
   OR e.value < b.q1 - 1.5 * (b.q3 - b.q1)
GROUP BY e.event_type
""")
def q40_iqr_outliers(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    b = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"))
    iqr = F.col("q3") - F.col("q1")
    j = ev.join(F.broadcast(b), "event_type")
    return (j.filter((F.col("value") > F.col("q3") + 1.5 * iqr)
                     | (F.col("value") < F.col("q1") - 1.5 * iqr))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_outliers"),
                 F.round(F.min("value"), 2).alias("min_outlier"),
                 F.round(F.max("value"), 2).alias("max_outlier")))


# Time-series gap-fill: regularize the per-type hourly series onto a
# dense hour grid (the rollup/continuous-aggregate shape time-series
# stores ship). The grid is generated IN-PLAN per key — sequence() over
# the key's own [min,max] hour span, exploded — so grid construction is
# distributed and proportional to the output, no driver loop, no
# cross-join against a global calendar. ~40 of 720 hours per type are
# genuinely absent in the testdata, so the fill path is exercised.
@q("q43_gapfill", """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         round(sum(value), 2) AS v
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
bounds AS (
  SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM bounds
)
SELECT g.event_type, epoch_us(g.h) AS hour_us,
       coalesce(hh.v, 0.0) AS v,
       CAST(hh.v IS NULL AS INTEGER) AS was_missing
FROM grid g LEFT JOIN hourly hh
  ON g.event_type = hh.event_type AND g.h = hh.h
""")
def q43_gapfill(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("h"))
              .agg(F.round(F.sum("value"), 2).alias("v")))
    bounds = hourly.groupBy("event_type").agg(F.min("h").alias("h0"),
                                              F.max("h").alias("h1"))
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"))
    return (grid.join(hourly, ["event_type", "h"], "left")
            .select("event_type", F.unix_micros("h").alias("hour_us"),
                    F.coalesce("v", F.lit(0.0)).alias("v"),
                    F.col("v").isNull().cast("int").alias("was_missing")))


# Trailing time-RANGE window: for every event, the 24h-lookback sum and
# count within its type — the sliding-horizon feature every monitoring /
# feature-engineering pipeline computes. RANGE frame over event-time
# (epoch micros on both engines so frame bounds are identical); ties in
# ts are frame-inclusive by RANGE semantics on both engines, so the
# result is deterministic per event_id.
@q("q44_trailing_window", """
SELECT event_id,
       round(sum(value) OVER w, 2) AS trail_sum_24h,
       CAST(count(*) OVER w AS BIGINT) AS trail_n_24h
FROM (SELECT event_id, event_type, epoch_us(ts) AS ts_us, value FROM events)
WINDOW w AS (PARTITION BY event_type ORDER BY ts_us
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
""")
def q44_trailing_window(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = (W.partitionBy("event_type").orderBy("ts_us")
         .rangeBetween(-86400000000, 0))
    return ev.select(
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("trail_sum_24h"),
        F.count(F.lit(1)).over(w).alias("trail_n_24h"))


# GROUPING SETS with grouping_id — the generalized multi-level aggregate
# (rollup/cube are its special cases; q18/q24 cover those). Expressed
# through spark.sql: the declarative route IS the engine's API surface.
@q("q45_grouping_sets", """
SELECT o_orderpriority, o_orderstatus,
       CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS BIGINT)
         AS gid,
       count(*) AS n, round(sum(o_totalprice), 2) AS sum_total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), (o_orderstatus))
""")
def q45_grouping_sets(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q45_orders")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
                    AS BIGINT) AS gid,
               count(*) AS n, round(sum(o_totalprice), 2) AS sum_total
        FROM q45_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus))
    """)


# Exact equi-depth histogram via ntile: 10 equal-count bins per type
# with bin boundaries — the exact twin of the approximate percentile
# sketches in q38 (at 100 TB you ship q38's approx_percentile; this is
# the exact variant for dims / verification). Tie-break on event_id
# makes bin assignment deterministic on both engines.
@q("q46_equidepth_hist", """
WITH ranked AS (
  SELECT event_type, value,
         ntile(10) OVER (PARTITION BY event_type
                         ORDER BY value, event_id) AS bin
  FROM events
)
SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n,
       round(min(value), 2) AS lo, round(max(value), 2) AS hi
FROM ranked GROUP BY event_type, bin
""")
def q46_equidepth_hist(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return (ev.withColumn("bin", F.ntile(10).over(w).cast("long"))
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.min("value"), 2).alias("lo"),
                 F.round(F.max("value"), 2).alias("hi")))


# Stream-stream event-time interval join EXECUTED through Structured
# Streaming: clicks joined to same-user errors in the following hour,
# both sides watermarked (bounded join state — the state store holds
# only rows inside the watermark horizon). Inner-join matches emit as
# found under availableNow, so the drained result equals the batch
# join, which IS the oracle.
@q("st05_stream_interval_join", """
SELECT c.event_id AS click_id, e.event_id AS error_id,
       epoch_us(c.ts) AS click_us, epoch_us(e.ts) AS error_us
FROM events c JOIN events e
  ON c.user_id = e.user_id
 AND c.event_type = 'click' AND e.event_type = 'error'
 AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 1 HOUR
""")
def st05_stream_interval_join(spark, sf_dir):
    import os
    import tempfile
    import uuid

    from ecmm428_pycart_spark.streaming.events import read_events_stream

    d = _scratch("st05_events_")
    os.symlink(os.path.join(sf_dir, "events.parquet"),
               os.path.join(d, "events.parquet"))
    clicks = (read_events_stream(spark, d)
              .filter(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("click_ts"),
                      F.col("event_id").alias("click_id"))
              .withWatermark("click_ts", "2 hours"))
    errors = (read_events_stream(spark, d)
              .filter(F.col("event_type") == "error")
              .select(F.col("user_id").alias("user_id2"),
                      F.col("ts").alias("error_ts"),
                      F.col("event_id").alias("error_id"))
              .withWatermark("error_ts", "2 hours"))
    joined = clicks.join(
        errors,
        (F.col("user_id") == F.col("user_id2"))
        & (F.col("error_ts") >= F.col("click_ts"))
        & (F.col("error_ts") <= F.col("click_ts")
           + F.expr("INTERVAL 1 HOUR")))
    name = f"st05_{uuid.uuid4().hex[:8]}"
    _await_stream(spark, joined.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(availableNow=True))
    return (spark.table(name)
            .select("click_id", "error_id",
                    F.unix_micros("click_ts").alias("click_us"),
                    F.unix_micros("error_ts").alias("error_us")))


# Bounded-state streaming dedup: dropDuplicatesWithinWatermark keeps a
# key's state only until the watermark passes its event time (st03's
# plain dropDuplicates holds state forever — correct but unbounded).
# The events table spans less than the 30-day delay, so every duplicate
# is inside one retention horizon and the drained availableNow result
# equals batch DISTINCT, which is the oracle; on an unbounded stream
# this operator's state store stays O(keys-per-horizon) instead of
# growing without bound.
@q("st06_stream_dedup_bounded", """
SELECT user_id, event_type FROM (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
""")
def st06_stream_dedup_bounded(spark, sf_dir):
    import os
    import tempfile
    import uuid

    from ecmm428_pycart_spark.streaming.events import read_events_stream

    d = _scratch("st06_events_")
    os.symlink(os.path.join(sf_dir, "events.parquet"),
               os.path.join(d, "events.parquet"))
    stream = (read_events_stream(spark, d)
              .select("user_id", "event_type", "ts")
              .withWatermark("ts", "30 days")
              .dropDuplicatesWithinWatermark(["user_id", "event_type"])
              .select("user_id", "event_type"))
    name = f"st06_{uuid.uuid4().hex[:8]}"
    _await_stream(spark, stream.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(availableNow=True))
    return spark.table(name)


# foreachBatch incremental-upsert sink EXECUTED through Structured
# Streaming: the events table is re-laid-out as 4 time-ranged files,
# replayed one file per micro-batch (maxFilesPerTrigger=1 — a real
# multi-batch incremental run, not one availableNow gulp), aggregated
# in UPDATE mode, and upserted into an append-only parquet sink via
# the batch-id-stamped idempotent pattern (streaming/events.py:
# foreach_batch_upsert_writer). The final answer is the argmax-merged
# sink state, which must equal the plain batch aggregate — proving the
# sink converges to the batch answer across micro-batch boundaries.
# The watermark is set beyond the replayed history's span so no
# historical row is late-dropped during replay (in production the
# horizon is the real late-data bound).
@q("st07_stream_foreach_upsert", """
SELECT CAST(ts AS DATE) AS event_date, event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
""")
def st07_stream_foreach_upsert(spark, sf_dir):
    import tempfile

    from ecmm428_pycart_spark.streaming.events import (
        daily_type_totals, foreach_batch_upsert_writer, read_events_stream,
        read_upsert_state)

    src = _scratch("st07_src_")
    (_t(spark, sf_dir, "events")
     .repartitionByRange(4, "ts")
     .write.mode("overwrite").parquet(src))
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    sink = _scratch("st07_sink_")
    ckpt = _scratch("st07_ckpt_")
    _await_stream(spark, daily_type_totals(stream, watermark="36500 days")
          .writeStream.foreachBatch(foreach_batch_upsert_writer(sink))
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True))
    return (read_upsert_state(spark, sink)
            .select("event_date", "event_type", "n",
                    F.round("sum_value", 2).alias("sum_value")))


# Bucketed co-located join EXECUTED in the gate: both fact tables are
# written bucketBy(8, orderkey) + sortBy into the session catalog
# (external parquet in a temp dir, in-memory catalog — no Hive), then
# joined. Bucketing pre-shuffles ONCE at write time; every subsequent
# join/aggregation on the bucket key runs exchange-free (the pytest
# twin, test_bucketed_join_avoids_shuffle, asserts the plan property
# with broadcast disabled). At 100 TB this is the difference between
# shuffling the fact table per query and never shuffling it again.
@q("q60_bucketed_colocated_join", """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(l_quantity), 2) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
""")
def q60_bucketed_colocated_join(spark, sf_dir):
    import tempfile
    import uuid

    tag = uuid.uuid4().hex[:8]
    base = _scratch("q60_bkt_")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = (_t(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity"))
    (o.write.mode("overwrite").option("path", f"{base}/orders")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(f"q60_orders_{tag}"))
    (li.write.mode("overwrite").option("path", f"{base}/lineitem")
       .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .saveAsTable(f"q60_lineitem_{tag}"))
    ob = spark.table(f"q60_orders_{tag}")
    lb = spark.table(f"q60_lineitem_{tag}")
    return (ob.join(lb, "o_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.round(F.sum("l_quantity"), 2).alias("total_qty")))


# Batch MERGE (SCD type 1) on plain DataFrames: a deterministic changes
# feed (updates for custkey%3=0, deletes for custkey%7=0, inserts with
# shifted keys for custkey%5=0) applied to the customer base in ONE
# full-outer join — WHEN MATCHED UPDATE / WHEN MATCHED DELETE / WHEN
# NOT MATCHED INSERT, exactly the lakehouse MERGE INTO contract. The
# only shuffle is the join on the merge key; the post-merge rollup
# proves row-level semantics (updated balances, dropped deletes,
# appended inserts) against the oracle's set-based restatement.
@q("q61_batch_merge_scd1", """
WITH changes AS (
  SELECT c_custkey AS k, 'U' AS op, c_acctbal + 100.0 AS new_bal,
         c_nationkey AS nk
  FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 7 <> 0
  UNION ALL
  SELECT c_custkey, 'D', NULL, c_nationkey
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'I', 500.0, c_nationkey
  FROM customer WHERE c_custkey % 5 = 0
),
merged AS (
  SELECT coalesce(c.c_custkey, ch.k) AS k,
         coalesce(c.c_nationkey, ch.nk) AS nk,
         CASE WHEN ch.op = 'U' THEN ch.new_bal
              WHEN ch.op = 'I' THEN ch.new_bal
              ELSE c.c_acctbal END AS bal
  FROM customer c FULL OUTER JOIN changes ch ON c.c_custkey = ch.k
  WHERE ch.op IS NULL OR ch.op <> 'D'
)
SELECT nk AS c_nationkey,
       CAST(count(*) AS BIGINT) AS n_custs,
       round(sum(bal), 2) AS total_bal
FROM merged GROUP BY nk
""")
def q61_batch_merge_scd1(spark, sf_dir):
    base = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal")
    k = F.col("c_custkey")
    updates = (base.filter((k % 3 == 0) & (k % 7 != 0))
               .select(k.alias("k"), F.lit("U").alias("op"),
                       (F.col("c_acctbal") + 100.0).alias("new_bal"),
                       F.col("c_nationkey").alias("nk")))
    deletes = (base.filter(k % 7 == 0)
               .select(k.alias("k"), F.lit("D").alias("op"),
                       F.lit(None).cast("double").alias("new_bal"),
                       F.col("c_nationkey").alias("nk")))
    inserts = (base.filter(k % 5 == 0)
               .select((k + 1000000).alias("k"), F.lit("I").alias("op"),
                       F.lit(500.0).alias("new_bal"),
                       F.col("c_nationkey").alias("nk")))
    changes = updates.unionByName(deletes).unionByName(inserts)
    merged = (base.join(changes, base["c_custkey"] == changes["k"],
                        "full_outer")
              .filter(F.col("op").isNull() | (F.col("op") != "D"))
              .select(
                  F.coalesce("c_nationkey", "nk").alias("c_nationkey"),
                  F.when(F.col("op").isin("U", "I"), F.col("new_bal"))
                  .otherwise(F.col("c_acctbal")).alias("bal")))
    return (merged.groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_custs"),
                 F.round(F.sum("bal"), 2).alias("total_bal")))


# Small-file compaction EXECUTED in the gate: events is first shattered
# into 64 tiny files (a streaming ingest's pathological layout), then
# compacted with coalesce — a narrow dependency, NO shuffle — into
# byte-targeted bins, and the aggregate over the compacted copy must
# equal the straight-scan oracle (row-exact parity through the
# rewrite). The pytest twin asserts the file-count collapse.
@q("q62_compaction_roundtrip", """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY event_type
""")
def q62_compaction_roundtrip(spark, sf_dir):
    import tempfile

    from ecmm428_pycart_spark.sources.zorder import compact_parquet

    shattered = _scratch("q62_small_")
    compacted = _scratch("q62_big_")
    (_t(spark, sf_dir, "events")
     .repartition(64)
     .write.mode("overwrite").parquet(shattered))
    compact_parquet(spark, shattered, compacted,
                    target_file_bytes=4 * 1024 * 1024)
    back = spark.read.parquet(compacted)
    return (back.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


# Stream-static enrichment join EXECUTED through Structured Streaming:
# the event stream joins a STATIC customer->nation dimension (broadcast
# per micro-batch — stream-static joins are stateless, no watermark
# state at all, the canonical dimension-enrichment shape) and
# aggregates per nation in complete mode. Oracle restates it as a
# batch join-aggregate.
@q("st08_stream_static_enrich", """
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(e.value), 2) AS sum_value
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
""")
def st08_stream_static_enrich(spark, sf_dir):
    import os
    import tempfile
    import uuid

    from ecmm428_pycart_spark.streaming.events import read_events_stream

    d = _scratch("st08_events_")
    os.symlink(os.path.join(sf_dir, "events.parquet"),
               os.path.join(d, "events.parquet"))
    stream = read_events_stream(spark, d)
    dim = (_t(spark, sf_dir, "customer")
           .join(F.broadcast(_t(spark, sf_dir, "nation")
                             .select("n_nationkey", "n_name")),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .select(F.col("c_custkey").alias("user_id"), "n_name"))
    enriched = stream.join(F.broadcast(dim), "user_id")
    agg = (enriched.groupBy("n_name")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("sum_value")))
    name = f"st08_{uuid.uuid4().hex[:8]}"
    _await_stream(spark, agg.writeStream.format("memory").queryName(name)
          .outputMode("complete").trigger(availableNow=True))
    return (spark.table(name)
            .select("n_name", "n_events",
                    F.round("sum_value", 2).alias("sum_value")))


# TPC-H Q7-shaped bilateral volume shipping: the 5-way star with TWO
# independent nation attaches (supplier's and customer's), restricted
# to cross-border flows (supplier nation <> customer nation — the
# testdata's supplier set is too thin at sf0.001 for Q7's single-pair
# literal to be non-vacuous at every sf, so the predicate keeps the
# shape, not the constants). Plan shape: both nation dims and
# supplier/customer broadcast; lineitem⋈orders is the only fact-fact
# shuffle; the inequality filter applies after the broadcast attaches.
@q("q63_bilateral_shipping", """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
       round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                      AS BIGINT)) / 100.0, 2) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
""")
def q63_bilateral_shipping(spark, sf_dir):
    # per-line integer cents: with thousands of lines per (pair, year)
    # group, double sums differ across engine reduction orders by a
    # last cent at .xx5 boundaries; the per-line product is the SAME
    # double on both engines (IEEE mult is deterministic), so rounding
    # it to cents per line and summing integers is reduction-order-free
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long").alias("rev_cents"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = nation.select(F.col("n_nationkey").alias("sn_key"),
                       F.col("n_name").alias("supp_nation"))
    cn = nation.select(F.col("n_nationkey").alias("cn_key"),
                       F.col("n_name").alias("cust_nation"))
    j = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
         .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
         .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
         .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
         .filter(F.col("supp_nation") != F.col("cust_nation")))
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").alias("l_year"))
            .agg(F.round(F.sum("rev_cents") / 100.0, 2)
                 .alias("revenue")))


# TPC-H Q12-shaped priority-mix audit (adapted: the schema has no
# l_shipmode, so the "mode" axis is the line status): per returnflag,
# how many shipped lines in 1997 belong to urgent/high vs lower
# priority orders — conditional aggregates over one fact-fact join,
# the canonical CASE-inside-SUM shape with both date bounds pushed
# into the lineitem scan.
@q("q64_priority_mix", """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
""")
def q64_priority_mix(spark, sf_dir):
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate")
                   >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
                  & (F.col("l_shipdate")
                     < F.lit("1998-01-01 00:00:00").cast("timestamp")))
          .select("l_orderkey", "l_linestatus"))
    orders = _t(spark, sf_dir, "orders").select("o_orderkey",
                                                "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0))
                 .alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0))
                 .alias("low_line_count")))


# Snapshot versioning / time travel EXECUTED in the gate
# (sources/snapshots.py): v1 = the customer base, v2 = the q61-style
# MERGE result published as a SECOND immutable version; the query then
# time-travels to BOTH versions and returns their per-version
# aggregates. The oracle restates each version independently, so a v2
# write that mutated v1 (or a reader that can't reach a historical
# version) hash-mismatches.
@q("q65_time_travel", """
WITH changes AS (
  SELECT c_custkey AS k, 'U' AS op, c_acctbal + 100.0 AS new_bal,
         c_nationkey AS nk
  FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 7 <> 0
  UNION ALL
  SELECT c_custkey, 'D', NULL, c_nationkey
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'I', 500.0, c_nationkey
  FROM customer WHERE c_custkey % 5 = 0
),
v2 AS (
  SELECT coalesce(c.c_custkey, ch.k) AS k,
         CASE WHEN ch.op IN ('U', 'I') THEN ch.new_bal
              ELSE c.c_acctbal END AS bal
  FROM customer c FULL OUTER JOIN changes ch ON c.c_custkey = ch.k
  WHERE ch.op IS NULL OR ch.op <> 'D'
)
SELECT 1 AS version, CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer
UNION ALL
SELECT 2, CAST(count(*) AS BIGINT), round(sum(bal), 2) FROM v2
""")
def q65_time_travel(spark, sf_dir):
    import tempfile

    from ecmm428_pycart_spark.sources.snapshots import (
        read_snapshot, write_snapshot)

    base = _scratch("q65_snap_")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal")
    write_snapshot(cust, base)

    k = F.col("c_custkey")
    updates = (cust.filter((k % 3 == 0) & (k % 7 != 0))
               .select(k.alias("k"), F.lit("U").alias("op"),
                       (F.col("c_acctbal") + 100.0).alias("new_bal")))
    deletes = (cust.filter(k % 7 == 0)
               .select(k.alias("k"), F.lit("D").alias("op"),
                       F.lit(None).cast("double").alias("new_bal")))
    inserts = (cust.filter(k % 5 == 0)
               .select((k + 1000000).alias("k"), F.lit("I").alias("op"),
                       F.lit(500.0).alias("new_bal")))
    changes = updates.unionByName(deletes).unionByName(inserts)
    v1 = read_snapshot(spark, base, version=1)
    merged = (v1.join(changes, v1["c_custkey"] == changes["k"],
                      "full_outer")
              .filter(F.col("op").isNull() | (F.col("op") != "D"))
              .select(F.coalesce("c_custkey", "k").alias("c_custkey"),
                      F.when(F.col("op").isin("U", "I"), F.col("new_bal"))
                      .otherwise(F.col("c_acctbal")).alias("c_acctbal")))
    write_snapshot(merged, base)

    out = []
    for v in (1, 2):
        snap = read_snapshot(spark, base, version=v)
        out.append(snap.agg(
            F.lit(v).alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal")))
    return out[0].unionByName(out[1])


# Cohort retention: bucket every user by first-seen week (cohort),
# then count distinct active users per (cohort, weeks-since-first) —
# the canonical product-analytics matrix. Two shuffles: the per-user
# min(ts) argmin and the (cohort, age) distinct-count; the first-seen
# attach broadcasts (|users| << |events| at scale it stays a shuffle
# join — size-based, Spark decides).
@q("q66_cohort_retention", """
WITH first_seen AS (
  SELECT user_id,
         CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
aged AS (
  SELECT f.cohort_week,
         CAST(floor(date_diff('day', f.cohort_week,
                              CAST(e.ts AS DATE)) / 7.0) AS INTEGER)
           AS week_age,
         e.user_id
  FROM events e JOIN first_seen f USING (user_id)
)
SELECT cohort_week, week_age,
       CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
FROM aged GROUP BY cohort_week, week_age
""")
def q66_cohort_retention(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = (ev.groupBy("user_id")
                  .agg(F.date_trunc("week", F.min("ts")).cast("date")
                       .alias("cohort_week")))
    aged = (ev.join(first_seen, "user_id")
            .select("cohort_week",
                    F.floor(F.datediff(F.col("ts").cast("date"),
                                       F.col("cohort_week")) / 7.0)
                    .cast("int").alias("week_age"),
                    "user_id"))
    return (aged.groupBy("cohort_week", "week_age")
            .agg(F.countDistinct("user_id").alias("active_users")))


# ---------------------------------------------------------------------------
# Round 4 additions: multi-level aggregation (ROLLUP), pivot, TPC-H
# Q15/Q21 shapes. All big-group money sums use the q63 integer-cents
# trick (per-line round to cents, BIGINT sum) so the cross-engine hash
# is reduction-order-free.
# ---------------------------------------------------------------------------

# ROLLUP region -> nation -> grand total in ONE pass: Spark expands the
# grouping sets with a single Expand node over one scan (map-side
# partial agg still applies), identical to DuckDB's GROUP BY ROLLUP.
# NULL group keys are coalesced to 'ALL' on both sides so the subtotal
# rows hash identically.
@q("q67_rollup_revenue", """
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) / 100.0, 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY ROLLUP(r_name, n_name)
""")
def q67_rollup_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long").alias("rev_cents"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region")
    j = (li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
         .join(F.broadcast(nation),
               F.col("s_nationkey") == F.col("n_nationkey"))
         .join(F.broadcast(region),
               F.col("n_regionkey") == F.col("r_regionkey")))
    return (j.rollup("r_name", "n_name")
            .agg(F.round(F.sum("rev_cents") / 100.0, 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines"))
            .select(F.coalesce("r_name", F.lit("ALL")).alias("region"),
                    F.coalesce("n_name", F.lit("ALL")).alias("nation"),
                    "revenue", "n_lines"))


# Pivot: ship-year x returnflag revenue matrix. Spark's pivot with an
# explicit value list compiles to ONE aggregate with conditional sums
# (no extra distinct-values job, no second shuffle) — exactly the
# CASE-inside-SUM the oracle states.
@q("q68_pivot_year_flag", """
SELECT CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS ship_year,
       round(sum(CASE WHEN l_returnflag = 'A'
                      THEN CAST(round(l_extendedprice * (1 - l_discount)
                                      * 100) AS BIGINT) END) / 100.0, 2)
         AS rev_A,
       round(sum(CASE WHEN l_returnflag = 'N'
                      THEN CAST(round(l_extendedprice * (1 - l_discount)
                                      * 100) AS BIGINT) END) / 100.0, 2)
         AS rev_N,
       round(sum(CASE WHEN l_returnflag = 'R'
                      THEN CAST(round(l_extendedprice * (1 - l_discount)
                                      * 100) AS BIGINT) END) / 100.0, 2)
         AS rev_R
FROM lineitem GROUP BY 1
""")
def q68_pivot_year_flag(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").alias("ship_year"), "l_returnflag",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long").alias("rev_cents"))
    piv = (li.groupBy("ship_year")
           .pivot("l_returnflag", ["A", "N", "R"])
           .agg(F.sum("rev_cents")))
    return piv.select(
        "ship_year",
        F.round(F.col("A") / 100.0, 2).alias("rev_A"),
        F.round(F.col("N") / 100.0, 2).alias("rev_N"),
        F.round(F.col("R") / 100.0, 2).alias("rev_R"))


# TPC-H Q15 shape (top supplier): quarterly revenue per supplier, keep
# the max-revenue supplier(s) by crossJoining a broadcast 1-row max —
# unlike the naive empty-frame window (which sorts EVERY supplier's
# aggregate into one partition), the scalar join keeps the per-supplier
# rows distributed; ties kept deterministically.
@q("q70_top_supplier", """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(rev_cents / 100.0, 2) AS total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE rev_cents = (SELECT max(rev_cents) FROM rev)
""")
def q70_top_supplier(spark, sf_dir):
    li = (_t(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate")
                   >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                  & (F.col("l_shipdate")
                     < F.lit("1996-04-01 00:00:00").cast("timestamp")))
          .select("l_suppkey",
                  F.round(F.col("l_extendedprice")
                          * (1 - F.col("l_discount")) * 100)
                  .cast("long").alias("rev_cents")))
    rev = li.groupBy("l_suppkey").agg(
        F.sum("rev_cents").alias("rev_cents"))
    max_rev = rev.agg(F.max("rev_cents").alias("max_rev"))
    top = (rev.crossJoin(F.broadcast(max_rev))
           .filter(F.col("rev_cents") == F.col("max_rev")))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (top.join(F.broadcast(supp),
                     F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name",
                    F.round(F.col("rev_cents") / 100.0, 2)
                    .alias("total_revenue")))


# TPC-H Q21 shape (suppliers who kept orders waiting), adapted to this
# schema (no commit/receipt dates): a line is LATE if it shipped more
# than 60 days after the order date. For each order with >= 2 distinct
# suppliers where EXACTLY ONE supplier was late, charge that supplier.
# One per-order aggregate replaces Q21's exists/not-exists self-join
# pair — same semantics, one shuffle instead of three.
@q("q71_lone_late_supplier", """
WITH flagged AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
              THEN l.l_suppkey END AS late_supp
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT late_supp) AS n_late,
         max(late_supp) AS the_late_supp
  FROM flagged GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON s_suppkey = the_late_supp
WHERE n_supp >= 2 AND n_late = 1
GROUP BY s_name
""")
def q71_lone_late_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAY")
    flagged = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
               .select("l_orderkey", "l_suppkey",
                       F.when(late, F.col("l_suppkey")).alias("late_supp")))
    # Two-level aggregation instead of the double countDistinct: Spark
    # rewrites multi-distinct aggregates through an Expand that triples
    # the joined lineitem stream before the shuffle (r13 plan: 2 Expand
    # nodes, 1.8M expanded rows at sf0.1). Grouping by (order, supp)
    # first shuffles the stream once at its natural width, then the
    # per-order rollup is a partial-aggregatable second pass.
    # Equivalence (l_suppkey is non-null): countDistinct(l_suppkey) ==
    # count of (orderkey, suppkey) groups; countDistinct(late_supp) ==
    # number of suppliers with >=1 late line == sum(is_late);
    # max(late_supp) == max(suppkey where is_late).
    per_pair = (flagged.groupBy("l_orderkey", "l_suppkey")
                .agg(F.max(F.when(F.col("late_supp").isNotNull(), 1)
                           .otherwise(0)).alias("is_late")))
    per_order = (per_pair.groupBy("l_orderkey")
                 .agg(F.count(F.lit(1)).alias("n_supp"),
                      F.sum("is_late").alias("n_late"),
                      F.max(F.when(F.col("is_late") == 1,
                                   F.col("l_suppkey")))
                      .alias("the_late_supp"))
                 .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1)))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (per_order.join(F.broadcast(supp),
                           F.col("the_late_supp") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait")))


def _cached_derived_dir(prefix: str, sf_dir: str, source_table: str) -> str:
    """Deterministic /tmp cache dir for a derived copy of a testdata
    table, keyed by the SOURCE FILE's identity (path + mtime + size) —
    regenerated testdata at the same path changes the key, so a stale
    cache can never be silently reused (review finding r4b)."""
    import hashlib
    import os
    import tempfile

    src = os.path.join(os.path.abspath(sf_dir), f"{source_table}.parquet")
    st_ = os.stat(src)
    tag = hashlib.md5(
        f"{src}:{st_.st_mtime_ns}:{st_.st_size}".encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}")


# Dynamic partition pruning EXECUTED in the gate: the orders fact is
# written partitioned by o_orderpriority, then joined to a tiny
# routing dim filtered to the two "hot" priorities. Catalyst inserts a
# dynamicpruningexpression(SubqueryAdaptiveBroadcast) into the fact
# scan's PartitionFilters, so only 2 of 5 partition directories are
# read — the mechanism that turns a 100 TB date-partitioned fact scan
# into a few-partition read when the dim filter is selective.
# tests/test_plan_shapes.py::test_q69_plan_has_dpp pins the plan shape.
@q("q69_dpp_prune", """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
         AS total_price
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
""")
def q69_dpp_prune(spark, sf_dir):
    import os

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long")
        .alias("price_cents"))
    # deterministic per-source path, written ONCE and reused (review
    # finding r4); keyed by source mtime+size so regenerated testdata
    # invalidates the cache (review finding r4b)
    d = _cached_derived_dir("q69_dpp", sf_dir, "orders")
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        orders.write.mode("overwrite") \
            .partitionBy("o_orderpriority").parquet(d)
    fact = spark.read.parquet(d)
    dim = spark.createDataFrame(
        [("1-URGENT", 1), ("2-HIGH", 1), ("3-MEDIUM", 0),
         ("4-NOT SPECIFIED", 0), ("5-LOW", 0)],
        "prio string, is_hot int")
    return (fact.join(F.broadcast(dim),
                      (fact["o_orderpriority"] == dim["prio"])
                      & (dim["is_hot"] == 1))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("price_cents") / 100.0, 2)
                 .alias("total_price")))


# SCD-2 history merge (lakehouse versioned-dimension pattern; the
# type-2 sibling of q61's SCD-1): apply the same change feed but KEEP
# history — closed-out v1 rows for updated/deleted keys, untouched
# open rows, and new open v2 versions, via operators.relational.
# scd2_apply (two hash joins on the key + a union, one shuffle shape,
# no windows). The audit output groups the full history by validity
# interval, so a merge that drops history, fails to close a version,
# or resurrects a deleted key hash-mismatches.
@q("q72_scd2_history", """
WITH base AS (
  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
),
changes AS (
  SELECT c_custkey AS k, 'U' AS op,
         CAST(round((c_acctbal + 100.0) * 100) AS BIGINT) AS new_cents
  FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 7 <> 0
  UNION ALL
  SELECT c_custkey, 'D', NULL FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'I', 50000
  FROM customer WHERE c_custkey % 5 = 0
),
touched AS (SELECT DISTINCT k FROM changes WHERE op IN ('U', 'D')),
history AS (
  SELECT b.c_custkey, b.bal_cents, 1 AS valid_from, 2 AS valid_to,
         FALSE AS is_current
  FROM base b WHERE b.c_custkey IN (SELECT k FROM touched)
  UNION ALL
  SELECT b.c_custkey, b.bal_cents, 1, NULL, TRUE
  FROM base b WHERE b.c_custkey NOT IN (SELECT k FROM touched)
  UNION ALL
  SELECT k, new_cents, 2, NULL, TRUE FROM changes WHERE op IN ('U', 'I')
)
SELECT valid_from, coalesce(valid_to, 0) AS valid_to_c, is_current,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(bal_cents) / 100.0, 2) AS total_bal
FROM history
GROUP BY 1, 2, 3
""")
def q72_scd2_history(spark, sf_dir):
    from ecmm428_pycart_spark.operators.relational import scd2_apply

    base = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"))
    k = F.col("c_custkey")
    updates = (base.filter((k % 3 == 0) & (k % 7 != 0))
               .select(k.alias("c_custkey"), F.lit("U").alias("op"),
                       (F.col("bal_cents") + 10000).alias("bal_cents")))
    deletes = (base.filter(k % 7 == 0)
               .select(k.alias("c_custkey"), F.lit("D").alias("op"),
                       F.lit(None).cast("long").alias("bal_cents")))
    inserts = (base.filter(k % 5 == 0)
               .select((k + 1000000).alias("c_custkey"),
                       F.lit("I").alias("op"),
                       F.lit(50000).cast("long").alias("bal_cents")))
    changes = updates.unionByName(deletes).unionByName(inserts)
    hist = scd2_apply(base, changes, key="c_custkey", batch_id=2)
    return (hist.groupBy("valid_from",
                         F.coalesce("valid_to", F.lit(0))
                         .alias("valid_to_c"),
                         "is_current")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.round(F.sum("bal_cents") / 100.0, 2).alias("total_bal")))


# LEFT OUTER stream-stream interval join (st05's outer sibling —
# round 4): unmatched clicks must be EMITTED WITH NULLS once the
# watermark proves no error can still arrive in their window; that
# state-eviction-driven emission is the distinctive outer-join
# machinery (an inner join could just drop them). Replay discipline:
# the events table is sliced into 6 time-ordered files with strictly
# increasing mtimes (write_time_ordered_stream_dir — out-of-order
# listing would fast-forward the watermark and drop rows as late) plus
# a far-future sentinel pair that pushes the final watermark past
# every real click's window, so the drained availableNow result equals
# the batch LEFT JOIN the oracle states. Sentinel rows (user_id < 0)
# are filtered from the output on both sides.
@q("st09_stream_outer_join", """
SELECT c.event_id AS click_id, e.event_id AS error_id,
       epoch_us(c.ts) AS click_us, epoch_us(e.ts) AS error_us
FROM events c LEFT JOIN events e
  ON c.user_id = e.user_id
 AND e.event_type = 'error'
 AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click'
""")
def st09_stream_outer_join(spark, sf_dir):
    import datetime
    import tempfile
    import uuid

    from ecmm428_pycart_spark.streaming.events import (
        read_events_stream, write_time_ordered_stream_dir)

    ev = (_t(spark, sf_dir, "events")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel = spark.createDataFrame(
        [(10**9, max_ts + datetime.timedelta(hours=200), -1, "click",
          0.0, None),
         (10**9 + 1, max_ts + datetime.timedelta(hours=200), -1, "error",
          0.0, None)], ev.schema)
    # event_id tiebreak: equal timestamps must bucket identically in
    # every slice-write job, or a boundary event could be duplicated /
    # dropped across slices (module convention; review finding r4c);
    # localCheckpoint materializes the global sort ONCE for all writes
    ranked = ev.withColumn(
        "_b", F.ntile(6).over(W.orderBy("ts", "event_id"))) \
        .localCheckpoint(eager=True)
    slices = [ranked.filter(F.col("_b") == i).drop("_b")
              for i in range(1, 7)] + [sentinel]
    d = _scratch("st09_events_")
    write_time_ordered_stream_dir(slices, d)

    clicks = (read_events_stream(spark, d, max_files_per_trigger=1)
              .filter(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("click_ts"),
                      F.col("event_id").alias("click_id"))
              .withWatermark("click_ts", "2 hours"))
    errors = (read_events_stream(spark, d, max_files_per_trigger=1)
              .filter(F.col("event_type") == "error")
              .select(F.col("user_id").alias("user_id2"),
                      F.col("ts").alias("error_ts"),
                      F.col("event_id").alias("error_id"))
              .withWatermark("error_ts", "2 hours"))
    joined = clicks.join(
        errors,
        (F.col("user_id") == F.col("user_id2"))
        & (F.col("error_ts") >= F.col("click_ts"))
        & (F.col("error_ts") <= F.col("click_ts")
           + F.expr("INTERVAL 1 HOUR")),
        "left_outer")
    name = f"st09_{uuid.uuid4().hex[:8]}"
    _await_stream(spark, joined.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(availableNow=True))
    return (spark.table(name)
            .filter(F.col("user_id") >= 0)
            .select("click_id", "error_id",
                    F.unix_micros("click_ts").alias("click_us"),
                    F.unix_micros("error_ts").alias("error_us")))


# Set operators beyond UNION (q09): INTERSECT and EXCEPT compile to
# aggregate-backed semi/anti joins on the full row — one shuffle each,
# duplicate-eliminating per ANSI semantics. Cohorts: nations having
# BUILDING-segment customers vs nations having 5000+ acctbal
# customers; the two distinct-nation sets are intersected and
# differenced, and both results are labeled and unioned so one gate
# row covers both operators.
@q("q73_set_ops", """
WITH building AS (
  SELECT DISTINCT c_nationkey FROM customer
  WHERE c_mktsegment = 'BUILDING'
),
rich AS (
  SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal > 5000
)
SELECT 'both' AS cohort, c_nationkey
FROM (SELECT c_nationkey FROM building
      INTERSECT SELECT c_nationkey FROM rich)
UNION ALL
SELECT 'building_only', c_nationkey
FROM (SELECT c_nationkey FROM building
      EXCEPT SELECT c_nationkey FROM rich)
""")
def q73_set_ops(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    building = (cust.filter(F.col("c_mktsegment") == "BUILDING")
                .select("c_nationkey").distinct())
    rich = (cust.filter(F.col("c_acctbal") > 5000)
            .select("c_nationkey").distinct())
    both = (building.intersect(rich)
            .select(F.lit("both").alias("cohort"), "c_nationkey"))
    only = (building.exceptAll(rich)
            .select(F.lit("building_only").alias("cohort"), "c_nationkey"))
    return both.unionByName(only)


# CHAINED stateful streaming aggregation (round 4; Spark >= 3.4 —
# multiple stateful operators in one streaming query): stage 1
# aggregates events into per-(hour, user) counts, stage 2 re-windows
# stage 1's window column into per-hour rollups (distinct users, max
# per-user count, total events). Two stateful operators back-to-back
# used to be rejected outright; the chained-window form is the
# Spark-native replacement for a two-job pipeline with an intermediate
# sink. Replay: single time-ordered slice + a far-future sentinel
# (user_id < 0, filtered AFTER the watermark node so it advances the
# watermark without entering the aggregates) so both stages flush and
# the drained result equals the batch rollup the oracle states.
@q("st10_stream_chained_agg", """
WITH per_user AS (
  SELECT date_trunc('hour', ts) AS h, user_id,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT epoch_us(h) AS hour_us,
       CAST(count(*) AS BIGINT) AS n_users,
       max(cnt) AS max_user_events,
       CAST(sum(cnt) AS BIGINT) AS total_events
FROM per_user GROUP BY h
""")
def st10_stream_chained_agg(spark, sf_dir):
    import datetime
    import tempfile
    import uuid

    from ecmm428_pycart_spark.streaming.events import (
        read_events_stream, write_time_ordered_stream_dir)

    ev = (_t(spark, sf_dir, "events")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    max_ts = ev.agg(F.max("ts")).first()[0]
    def sent(i, hours):
        return spark.createDataFrame(
            [(10**9 + i, max_ts + datetime.timedelta(hours=hours), -1,
              "click", 0.0, None)], ev.schema)
    d = _scratch("st10_events_")
    # THREE sentinel batches: the watermark used during batch N is the
    # one computed at the END of batch N-1, and each stateful stage
    # adds one batch of latency before its finalized windows reach the
    # next stage — one batch to advance the watermark, one for stage 1
    # to emit its final windows into stage 2, one for stage 2 to
    # finalize them.
    write_time_ordered_stream_dir(
        [ev, sent(0, 200), sent(1, 201), sent(2, 202)], d)

    # NO sentinel filter: a user_id predicate gets pushed BELOW the
    # EventTimeWatermark operator, so the sentinels would be dropped
    # before they can advance the watermark (observed: the last two
    # real hours then never finalize). The sentinels instead
    # self-exclude from append output — their far-future windows never
    # pass the final watermark, so they stay in state and are never
    # emitted.
    stream = (read_events_stream(spark, d, max_files_per_trigger=1)
              .withWatermark("ts", "1 hour"))
    per_user = (stream
                .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
                .agg(F.count(F.lit(1)).alias("cnt")))
    rolled = (per_user
              .groupBy(F.window(F.col("w"), "1 hour").alias("hw"))
              .agg(F.count(F.lit(1)).alias("n_users"),
                   F.max("cnt").alias("max_user_events"),
                   F.sum("cnt").alias("total_events")))
    name = f"st10_{uuid.uuid4().hex[:8]}"
    _await_stream(spark, rolled.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(availableNow=True))
    # drop any sentinel hour that finalized (the earliest sentinel's
    # window end can equal the final watermark exactly) — this is a
    # batch filter on the drained memory sink, so no pushdown issue
    return (spark.table(name)
            .filter(F.col("hw.start") <= F.lit(max_ts))
            .select(F.unix_micros(F.col("hw.start")).alias("hour_us"),
                    "n_users", "max_user_events", "total_events"))


# Decile distribution via ntile: rank every customer into 10
# equal-count balance buckets and report each decile's population and
# bounds — the quantile-table shape every feature-engineering pass
# needs. ntile is ONE unpartitioned window sort; at 100 TB replace
# with approx_percentile bounds + a bucket join (q46's equi-depth
# path) — this query pins the exact-window semantics, q46 pins the
# scalable path. Tiebreak on c_custkey makes bucket assignment
# deterministic across engines and parallelism.
@q("q74_decile_stats", """
WITH ranked AS (
  SELECT c_acctbal,
         CAST(ntile(10) OVER (ORDER BY c_acctbal, c_custkey)
              AS INTEGER) AS decile
  FROM customer
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(min(c_acctbal), 2) AS lo,
       round(max(c_acctbal), 2) AS hi,
       round(avg(c_acctbal), 4) AS mean_bal
FROM ranked GROUP BY decile
""")
def q74_decile_stats(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked = cust.withColumn(
        "decile", F.ntile(10).over(W.orderBy("c_acctbal", "c_custkey")))
    return (ranked.groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.min("c_acctbal"), 2).alias("lo"),
                 F.round(F.max("c_acctbal"), 2).alias("hi"),
                 F.round(F.avg("c_acctbal"), 4).alias("mean_bal")))


# Observation metrics (round 4): production pipelines attach QA
# counters to a job WITHOUT a second scan via df.observe — the metrics
# ride the same pass as the real action (here a count()), and the
# driver reads them after completion. The observed aggregates use the
# integer-cents trick so they are reduction-order-free, and the oracle
# restates them as plain SQL — a wrong/missing observation
# hash-mismatches. The returned 1-row table is built from the observed
# values (driver-side by design: observations ARE driver values).
@q("q75_observed_metrics", """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 2)
         AS sum_qty,
       round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) / 100.0, 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
""")
def q75_observed_metrics(spark, sf_dir):
    from pyspark.sql import Observation

    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate")
                  >= F.lit("1997-01-01 00:00:00").cast("timestamp")))
    obs = Observation("q75")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
        .alias("qty_cents"),
        F.sum(F.round(F.col("l_extendedprice")
                      * (1 - F.col("l_discount")) * 100).cast("long"))
        .alias("rev_cents"))
    observed.count()                      # the job the metrics ride on
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], round(m["qty_cents"] / 100.0, 2),
          round(m["rev_cents"] / 100.0, 2))],
        "n_rows bigint, sum_qty double, revenue double")


# VARIANT semi-structured type (round 4; Spark 4.0+): props JSON is
# parsed ONCE into the binary VARIANT encoding and fields are
# extracted with variant_get — the modern engine path that replaces
# per-access get_json_object string re-parsing (one parse per row per
# query instead of per extraction, and the open-format binary layout
# shreds into columnar storage). Null-safety: rows with no props stay
# in the aggregate with a null k.
@q("q76_variant_json", """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS n_with_k,
       CAST(sum(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(max(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
""")
def q76_variant_json(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_type", "props")
    v = ev.withColumn("v", F.parse_json(F.col("props")))
    k = F.try_variant_get(F.col("v"), "$.k", "bigint")
    return (v.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.count(k).alias("n_with_k"),
                 F.sum(k).alias("sum_k"),
                 F.max(k).alias("max_k")))


# Schema evolution on plain parquet (round 4): v1 files lack a column
# that later v2 files carry; mergeSchema=true unions the file schemas
# at read time and back-fills nulls for v1 rows — the lakehouse
# add-a-column migration executed in the gate, without a table format.
# The oracle restates the evolved read as a CASE on the writing batch.
@q("q77_schema_evolution", """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(CASE WHEN c_custkey % 2 = 1 THEN c_custkey END)
            AS BIGINT) AS n_with_tier,
       CAST(sum(CASE WHEN c_custkey % 2 = 1
                     THEN c_custkey % 5 END) AS BIGINT) AS sum_tier
FROM customer GROUP BY c_mktsegment
""")
def q77_schema_evolution(spark, sf_dir):
    import os

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")
    d = _cached_derived_dir("q77_evo", sf_dir, "customer")
    if not os.path.exists(os.path.join(d, "v2", "_SUCCESS")):
        # v1 batch: even keys, original schema
        (cust.filter(F.col("c_custkey") % 2 == 0)
         .write.mode("overwrite").parquet(os.path.join(d, "v1")))
        # v2 batch: odd keys, schema evolved with a tier column
        (cust.filter(F.col("c_custkey") % 2 == 1)
         .withColumn("tier", (F.col("c_custkey") % 5).cast("long"))
         .write.mode("overwrite").parquet(os.path.join(d, "v2")))
    evolved = (spark.read.option("mergeSchema", "true")
               .parquet(os.path.join(d, "v1"), os.path.join(d, "v2")))
    return (evolved.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.count("tier").alias("n_with_tier"),
                 F.sum("tier").alias("sum_tier")))


# RANGE-frame window (round 4): per customer, each order's trailing
# 30-DAY revenue — a frame defined by VALUE distance on the ordering
# column, not row counts (q44's ROWS frame can't express "last 30
# days" under irregular order spacing). One shuffle on the partition
# key; the frame scan is a per-partition sorted sweep.
@q("q78_range_frame_window", """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
         AS BIGINT) AS trailing_cents
FROM orders
""")
def q78_range_frame_window(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long")
        .alias("cents"))
    # RANGE frames need a numeric ordering col in the DataFrame API:
    # order by epoch days, frame = [-30 days, 0]
    days = F.datediff(F.col("o_orderdate").cast("date"),
                      F.lit("1970-01-01").cast("date"))
    w = (W.partitionBy("o_custkey").orderBy(days.cast("long"))
         .rangeBetween(-30, 0))
    return (orders.select(
        "o_custkey", "o_orderkey",
        F.sum("cents").over(w).alias("trailing_cents")))


# Custom PYTHON data source (round 4; Spark 4 DataSource API) read in
# the gate: a partitioned deterministic generator registered from pure
# Python (sources/pysource.py), with Spark 4.1 filter pushdown INTO
# the Python reader — the EqualTo on grp prunes 6 of 8 input
# partitions before any task launches (pinned by
# test_python_datasource_prunes_partitions). The oracle replicates the
# generator's partition arithmetic.
@q("q79_python_datasource", """
WITH g AS (
  SELECT i, 'g' || ((i // 125) % 4) AS grp,
         ((i * 37) % 1000) / 10.0 AS value
  FROM (SELECT unnest(range(0, 1000)) AS i)
)
SELECT grp, CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       CAST(min(i) AS BIGINT) AS min_id, CAST(max(i) AS BIGINT) AS max_id
FROM g WHERE grp = 'g1' GROUP BY grp
""")
def q79_python_datasource(spark, sf_dir):
    from ecmm428_pycart_spark.sources.pysource import RangeDocsDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(RangeDocsDataSource)
    except Exception:
        pass                      # already registered in this session
    df = (spark.read.format("range_docs")
          .option("n_rows", 1000).option("n_parts", 8).load())
    return (df.filter(F.col("grp") == "g1")
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"),
                 F.min("id").alias("min_id"),
                 F.max("id").alias("max_id")))


# PYTHON streaming data source EXECUTED through Structured Streaming
# (round 4; Spark 4 SimpleDataSourceStreamReader): micro-batches come
# from a pure-Python offset-tracked reader (sources/pysource.py) whose
# offsets are row indices — readBetweenOffsets can replay any batch
# exactly, the contract checkpoint recovery relies on. The stream
# drains 1000 rows in 128-row micro-batches into a complete-mode
# aggregation; the oracle replicates the generator arithmetic.
@q("st11_python_stream_source", """
WITH g AS (
  SELECT i, 'g' || ((i // 125) % 4) AS grp,
         ((i * 37) % 1000) / 10.0 AS value
  FROM (SELECT unnest(range(0, 1000)) AS i)
)
SELECT grp, CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM g GROUP BY grp
""")
def st11_python_stream_source(spark, sf_dir):
    import time
    import uuid

    from ecmm428_pycart_spark.sources.pysource import RangeStreamDataSource

    try:
        spark.dataSource.register(RangeStreamDataSource)
    except Exception:
        pass
    stream = (spark.readStream.format("range_docs_stream")
              .option("n_rows", 1000).option("batch_rows", 128).load())
    agg = (stream.groupBy("grp")
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("sum_value")))
    name = f"st11_{uuid.uuid4().hex[:8]}"
    q_ = (agg.writeStream.format("memory").queryName(name)
          .outputMode("complete").trigger(processingTime="0 seconds")
          .start())
    deadline = time.time() + 120
    while True:
        if q_.exception() is not None:
            raise q_.exception()
        rows = spark.table(name).collect()
        if rows and sum(r["n"] for r in rows) >= 1000:
            break
        if time.time() > deadline:
            q_.stop()
            raise TimeoutError(
                "st11: stream drained only "
                f"{sum(r['n'] for r in rows)}/1000 rows in 120s")
        time.sleep(0.5)
    q_.stop()
    return spark.table(name)


# PYTHON streaming SINK (round 4; Spark 4 DataSourceStreamWriter):
# the write side of the Python extension point, executed end-to-end —
# the st11 Python source streams into a Python sink whose tasks write
# part files and whose DRIVER commit publishes a per-batch manifest;
# the read-back resolves content through manifests only, so orphan
# files from failed/retried tasks are invisible (effectively-once
# without a table format). The oracle restates the generator closed
# form — any lost/duplicated micro-batch changes counts or sums.
@q("st12_python_stream_sink", """
WITH g AS (
  SELECT i, 'g' || ((i // 125) % 4) AS grp,
         ((i * 37) % 1000) / 10.0 AS value
  FROM (SELECT unnest(range(0, 1000)) AS i)
)
SELECT grp, CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM g GROUP BY grp
""")
def st12_python_stream_sink(spark, sf_dir):
    import tempfile
    import time

    from ecmm428_pycart_spark.sources.pysource import (
        JsonDirSinkDataSource, RangeStreamDataSource, read_json_sink)

    for src in (RangeStreamDataSource, JsonDirSinkDataSource):
        try:
            spark.dataSource.register(src)
        except Exception:
            pass
    out = _scratch("st12_out_")
    ckpt = _scratch("st12_ckpt_")
    stream = (spark.readStream.format("range_docs_stream")
              .option("n_rows", 1000).option("batch_rows", 128).load())
    q_ = (stream.writeStream.format("range_docs_sink")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(processingTime="0 seconds")
          .start())
    def committed_rows() -> int:
        # progress from the manifests' own row counts — plain-Python
        # file reads, not a Spark job per poll (review finding r4b)
        import glob
        import json as _json

        total = 0
        for mp in glob.glob(f"{out}/_manifest-*.json"):
            with open(mp) as f:
                total += _json.load(f)["rows"]
        return total

    deadline = time.time() + 120
    while True:
        if q_.exception() is not None:
            raise q_.exception()
        if committed_rows() >= 1000:
            break
        if time.time() > deadline:
            q_.stop()
            raise TimeoutError(
                f"st12: sink committed only {committed_rows()}/1000 "
                "rows in 120s")
        time.sleep(0.5)
    q_.stop()
    return (read_json_sink(spark, out)
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


# Checkpoint recovery EXECUTED under the oracle (round 4): phase 1
# drains the first half of a time-sliced events backlog into an
# append-mode parquet sink and STOPS; phase 2 appends the remaining
# slices and restarts a NEW query from the SAME checkpoint — the file
# source's committed offsets make it process only the unseen files, so
# the recovered sink holds every event exactly once. The aggregate
# over the sink must equal the straight batch scan; a replayed or
# dropped micro-batch changes counts/sums and hash-mismatches.
@q("st13_stream_restart_resume", """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY event_type
""")
def st13_stream_restart_resume(spark, sf_dir):
    import tempfile

    from ecmm428_pycart_spark.streaming.events import (
        read_events_stream, write_time_ordered_stream_dir)

    ev = (_t(spark, sf_dir, "events")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    # same tiebreak + one-shot materialization discipline as st09
    ranked = ev.withColumn(
        "_b", F.ntile(6).over(W.orderBy("ts", "event_id"))) \
        .localCheckpoint(eager=True)
    slices = [ranked.filter(F.col("_b") == i).drop("_b")
              for i in range(1, 7)]
    src = _scratch("st13_events_")
    sink = _scratch("st13_sink_")
    ckpt = _scratch("st13_ckpt_")

    def run_to_completion():
        stream = read_events_stream(spark, src, max_files_per_trigger=1)
        _await_stream(spark, stream.select("event_id", "event_type", "value")
              .writeStream.format("parquet")
              .option("path", sink).option("checkpointLocation", ckpt)
              .outputMode("append").trigger(availableNow=True))

    # phase 1: only the first half of the backlog exists
    write_time_ordered_stream_dir(slices[:3], src)
    run_to_completion()
    # phase 2: later files appear; a FRESH query on the SAME
    # checkpoint resumes from the committed offsets
    write_time_ordered_stream_dir(slices[3:], src, start_seq=3)
    run_to_completion()

    recovered = spark.read.parquet(sink)
    return (recovered.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


# Custom stateful sessionization with EVENT-TIME TIMEOUTS executed in
# the gate (round 4; the machinery session_window hides): open
# sessions live in the state store with a timeout at last_event + gap,
# in-batch gaps close inline, and each key's FINAL session is closed
# by the watermark firing its timeout (state.hasTimedOut) — exercised
# through a time-ordered multi-batch replay with trailing sentinel
# batches (one to advance the watermark, one for the timeouts to
# fire; sentinel user -1's own session never times out and is
# filtered from the batch result). Oracle: the lag-based batch gap
# sessionization, so a lost timeout (missing final sessions) or a
# premature close hash-mismatches.
@q("st14_stream_timeout_sessions", """
WITH x AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) AS session_last_us,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM s GROUP BY user_id, sid
""")
def st14_stream_timeout_sessions(spark, sf_dir):
    import datetime
    import tempfile
    import uuid

    from ecmm428_pycart_spark.streaming.events import (
        read_events_stream, timeout_sessionize,
        write_time_ordered_stream_dir)

    ev = (_t(spark, sf_dir, "events")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    max_ts = ev.agg(F.max("ts")).first()[0]

    def sent(i, hours):
        return spark.createDataFrame(
            [(10**9 + i, max_ts + datetime.timedelta(hours=hours), -1,
              "click", 0.0, None)], ev.schema)

    ranked = ev.withColumn(
        "_b", F.ntile(4).over(W.orderBy("ts", "event_id"))) \
        .localCheckpoint(eager=True)
    slices = [ranked.filter(F.col("_b") == i).drop("_b")
              for i in range(1, 5)] + [sent(0, 200), sent(1, 201)]
    d = _scratch("st14_events_")
    write_time_ordered_stream_dir(slices, d)

    stream = (read_events_stream(spark, d, max_files_per_trigger=1)
              .withWatermark("ts", "1 hour")
              .select("user_id", "ts", "value"))
    sessions = timeout_sessionize(stream, gap_minutes=30)
    name = f"st14_{uuid.uuid4().hex[:8]}"
    _await_stream(spark, sessions.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(availableNow=True))
    return (spark.table(name)
            .filter(F.col("user_id") >= 0)
            .select("user_id", "session_start_us", "session_last_us",
                    "n_events", F.round("sum_value", 2).alias("sum_value")))


# ---------------------------------------------------------------------------
# TPC-H Q17 shape (small-quantity-order revenue): the correlated scalar
# subquery `l_quantity < 0.5 * (SELECT avg(l_quantity) ... same part)`
# decorrelated the way a 100 TB plan wants it: the brand filter is
# applied BEFORE the avg (broadcast part-key join into the fact scan),
# then the per-part average comes from a WINDOW over l_partkey — the
# same rows the filter consumes, so one scan and one exchange replace
# the aggregate-plus-self-join form. No per-row subquery. Money stays
# in BIGINT cents until the final division so both engines hash
# identically.
# ---------------------------------------------------------------------------
@q("q80_small_qty_revenue", """
WITH pl AS (
  SELECT l_partkey, l_quantity,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand IN ('Brand#13', 'Brand#42')
),
pavg AS (
  SELECT l_partkey AS a_partkey, avg(l_quantity) AS avg_qty
  FROM pl GROUP BY l_partkey
)
SELECT round(CAST(sum(cents) AS BIGINT) / 700.0, 2) AS avg_yearly
FROM pl JOIN pavg ON l_partkey = a_partkey
WHERE l_quantity < 0.5 * avg_qty
""")
def q80_small_qty_revenue(spark, sf_dir):
    # The decorrelation is a WINDOW avg over l_partkey, not an
    # aggregate-plus-self-join: the correlated rows are exactly the
    # rows being filtered, so a partitioned window computes the
    # per-part average in the SAME single pass/shuffle that already
    # co-locates them — one brand-filtered fact scan and one exchange,
    # vs the join form's two scans + SortMergeJoin (verified via
    # tools/explain_plans.py: 10 exchanges -> 6, SortMergeJoins 2 -> 0).
    part = (_t(spark, sf_dir, "part")
            .filter(F.col("p_brand").isin("Brand#13", "Brand#42"))
            .select("p_partkey"))
    pl = (_t(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_quantity",
                  F.round(F.col("l_extendedprice") * 100)
                  .cast("long").alias("cents"))
          .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
          .select("l_partkey", "l_quantity", "cents"))
    avg_qty = F.avg("l_quantity").over(W.partitionBy("l_partkey"))
    small = (pl.withColumn("avg_qty", avg_qty)
             .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty")))
    return small.agg(
        F.round(F.sum("cents") / 700.0, 2).alias("avg_yearly"))


# ---------------------------------------------------------------------------
# TPC-H Q8 shape (national market share): share of NATION_7-supplied
# revenue within the ASIA customer market, per order year. The market
# filter (customer -> nation -> region = ASIA) reduces customers to one
# region BEFORE the orders join; supplier nation is a broadcast dim
# lookup; the share is a conditional-sum / sum over one groupBy — no
# second pass, no self-join. Revenue in BIGINT cents; the final share
# divides two BIGINTs in double, identical across engines.
# ---------------------------------------------------------------------------
@q("q81_market_share", """
WITH mkt_cust AS (
  SELECT c_custkey
  FROM customer
  JOIN nation ON n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'ASIA'
),
vol AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS cents,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN mkt_cust ON c_custkey = o_custkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  JOIN part     ON p_partkey = l_partkey
  WHERE p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN cents
                           ELSE 0 END) AS BIGINT)
             / CAST(sum(cents) AS BIGINT)::DOUBLE, 6) AS mkt_share
FROM vol GROUP BY o_year
""")
def q81_market_share(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name",
                                                "n_regionkey")
    region = (_t(spark, sf_dir, "region")
              .filter(F.col("r_name") == "ASIA").select("r_regionkey"))
    mkt_cust = (_t(spark, sf_dir, "customer")
                .select("c_custkey", "c_nationkey")
                .join(F.broadcast(nation.select("n_nationkey",
                                                "n_regionkey")),
                      F.col("c_nationkey") == F.col("n_nationkey"))
                .join(F.broadcast(region),
                      F.col("n_regionkey") == F.col("r_regionkey"))
                .select("c_custkey"))
    orders = (_t(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate")
                       >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
                      & (F.col("o_orderdate")
                         < F.lit("1997-01-01 00:00:00").cast("timestamp")))
              .select("o_orderkey", "o_custkey",
                      F.year("o_orderdate").alias("o_year")))
    # customer set is region-filtered (1/5 of an already-small dim);
    # unhinted so AQE keeps it broadcast while it fits.
    orders = (orders.join(mkt_cust,
                          F.col("o_custkey") == F.col("c_custkey"))
              .select("o_orderkey", "o_year"))
    part = (_t(spark, sf_dir, "part")
            .filter(F.col("p_type") == "PROMO").select("p_partkey"))
    supp = (_t(spark, sf_dir, "supplier")
            .select("s_suppkey", "s_nationkey")
            .join(F.broadcast(nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"))),
                F.col("s_nationkey") == F.col("sn_key"))
            .select("s_suppkey", "supp_nation"))
    li = (_t(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey",
                  F.round(F.col("l_extendedprice")
                          * (1 - F.col("l_discount")) * 100)
                  .cast("long").alias("cents")))
    vol = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
           .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
           .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")))
    share = (F.sum(F.when(F.col("supp_nation") == "NATION_7",
                          F.col("cents")).otherwise(F.lit(0)))
             / F.sum("cents"))
    return (vol.groupBy("o_year")
            .agg(F.round(share, 6).alias("mkt_share")))


# ---------------------------------------------------------------------------
# TPC-H Q19 shape (disjunctive predicate revenue): OR-of-AND branches
# spanning both join sides. The Spark plan applies the classic Q19
# rewrite by hand: the UNION of the part-side branch predicates
# (brand IN (...) AND size <= 15) goes INTO the part scan — so the
# build side is pre-shrunk and the parquet scan reads only matching
# row groups — while the exact cross-table disjunction runs once after
# the join. At 100 TB the difference is scanning 3 brands' parts
# instead of all parts.
# ---------------------------------------------------------------------------
@q("q82_disjunctive_revenue", """
SELECT round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT)) AS BIGINT) / 100.0, 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""")
def q82_disjunctive_revenue(spark, sf_dir):
    part = (_t(spark, sf_dir, "part")
            # union of the branch part-predicates, pushed to the scan
            .filter(F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
                    & (F.col("p_size") >= 1) & (F.col("p_size") <= 15))
            .select("p_partkey", "p_brand", "p_size"))
    li = (_t(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_quantity",
                  F.round(F.col("l_extendedprice")
                          * (1 - F.col("l_discount")) * 100)
                  .cast("long").alias("cents")))
    b = F.col("p_brand")
    s = F.col("p_size")
    qt = F.col("l_quantity")
    branch = (
        ((b == "Brand#12") & s.between(1, 5) & qt.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & qt.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & qt.between(20, 30)))
    return (li.join(F.broadcast(part),
                    F.col("l_partkey") == F.col("p_partkey"))
            .filter(branch)
            .agg(F.round(F.sum("cents") / 100.0, 2).alias("revenue")))


# ---------------------------------------------------------------------------
# TPC-H Q4 shape (order priority checking): COUNT of orders per
# priority where EXISTS a matching lineitem — adapted to this schema
# (no commit/receipt dates): the existence predicate is "some line of
# the order was returned" (l_returnflag = 'R'). The EXISTS compiles to
# a LEFT SEMI join on the order key: the lineitem side is reduced to
# DISTINCT matching keys map-side, never materializing the multi-match
# blowup a plain inner join + distinct would shuffle.
# ---------------------------------------------------------------------------
@q("q83_exists_priority", """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""")
def q83_exists_priority(spark, sf_dir):
    orders = (_t(spark, sf_dir, "orders")
              .filter((F.col("o_orderdate")
                       >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                      & (F.col("o_orderdate")
                         < F.lit("1996-10-01 00:00:00").cast("timestamp")))
              .select("o_orderkey", "o_orderpriority"))
    returned = (_t(spark, sf_dir, "lineitem")
                .filter(F.col("l_returnflag") == "R")
                .select(F.col("l_orderkey").alias("o_orderkey")))
    return (semi_join(orders, returned, "o_orderkey")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))
