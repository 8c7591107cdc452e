"""Skew-handling and bucketing: result parity + plan-shape assertions."""

import pytest
from pyspark.sql import functions as F

from ecmm428_pycart_spark.operators.skew import replicate_join_skewed, salted_sum
from ecmm428_pycart_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_salted_sum_matches_plain(spark):
    li = load_table(spark, SF, "lineitem")
    got = {r["l_returnflag"]: round(r["s"], 2)
           for r in salted_sum(li, ["l_returnflag"], "l_quantity", "s").collect()}
    want = {r["l_returnflag"]: round(r["s"], 2)
            for r in li.groupBy("l_returnflag")
                       .agg(F.sum("l_quantity").alias("s")).collect()}
    assert got == want


def test_replicate_join_matches_plain(spark):
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    c = (load_table(spark, SF, "customer")
         .select(F.col("c_custkey").alias("o_custkey"), "c_nationkey"))
    got = replicate_join_skewed(o, c, "o_custkey").count()
    want = o.join(c, "o_custkey").count()
    assert got == want > 0


def test_bucketed_join_avoids_shuffle(spark):
    """bucketBy co-locates join keys: the sort-merge join on two tables
    bucketed on the same key shows no Exchange above the scans.

    Uses the default warehouse dir (gitignored); tables dropped after.
    """
    spark.sql("CREATE DATABASE IF NOT EXISTS bktdb")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey",
                                               "o_totalprice")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("bktdb.orders_b"))
    (li.withColumnRenamed("l_orderkey", "o_orderkey")
       .write.mode("overwrite").bucketBy(8, "o_orderkey")
       .sortBy("o_orderkey").saveAsTable("bktdb.lineitem_b"))

    ob = spark.table("bktdb.orders_b")
    lb = spark.table("bktdb.lineitem_b")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (at real scale neither side broadcasts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = ob.join(lb, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bktdb.orders_b")
        spark.sql("DROP TABLE IF EXISTS bktdb.lineitem_b")


def test_partitioned_write_prunes(spark, tmp_path):
    """Date-partitioned parquet layout: a date filter becomes a
    PartitionFilter (directory pruning), not a data filter."""
    ev = load_table(spark, SF, "events").withColumn(
        "event_date", F.col("ts").cast("date"))
    out = str(tmp_path / "events_by_date")
    ev.write.partitionBy("event_date").mode("overwrite").parquet(out)
    back = spark.read.parquet(out).filter(
        F.col("event_date") == "2024-01-02")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan
    n = back.count()
    want = ev.filter(F.col("event_date") == "2024-01-02").count()
    assert n == want > 0


def test_aqe_splits_skewed_join(spark):
    """AQE's skew-join handling must actually engage on a pathological
    key distribution (one key owning ~half the fact rows): after
    execution the adaptive plan shows the skew=true sort-merge join,
    and results equal the non-adaptive run. This is the runtime half of
    the skew story (salting/replication are the manual half)."""
    from pyspark.sql import functions as F

    n = 200_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(7))
         .otherwise(F.col("id") % 1000).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"))
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w"))

    conf = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        # NOTE: no groupBy on the join key afterwards — a same-key
        # aggregate re-requires hash distribution, which forbids the
        # skew split (AQE would have to re-shuffle the split partitions)
        joined = (fact.join(dim, "k")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.round(F.sum(F.col("v") + F.col("w")), 2)
                       .alias("sv")))
        rows_aqe = sorted(map(tuple, joined.collect()))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        rows_plain = sorted(map(tuple, joined.collect()))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
    assert rows_aqe == rows_plain
