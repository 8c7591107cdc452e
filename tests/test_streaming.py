"""Structured Streaming tests: drive the event pipeline with
trigger(availableNow) into a memory sink and cross-check against the
equivalent batch aggregation."""

import os

import pytest
from pyspark.sql import functions as F

from ecmm428_pycart_spark.session import load_table
from ecmm428_pycart_spark.streaming import events as se

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """File stream source needs a directory; stage the events parquet."""
    d = tmp_path_factory.mktemp("events_stream")
    os.symlink(f"{SF_DIR}/events.parquet", d / "events.parquet")
    return str(d)


def _run_to_memory(spark, sdf, name):
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name)


def test_hourly_stream_matches_batch(spark, events_dir):
    stream = se.read_events_stream(spark, events_dir)
    assert stream.isStreaming
    out = _run_to_memory(spark, se.hourly_event_counts(stream), "hourly_t")

    batch = (load_table(spark, SF_DIR, "events")
             .groupBy(F.date_trunc("hour", "ts").alias("window_start"),
                      "event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("value"), 2).alias("sum_value")))
    got = {(r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
           for r in out.collect()}
    want = {(r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in batch.collect()}
    assert got == want and len(got) > 0


def test_sessionize_stream_counts(spark, events_dir):
    stream = se.read_events_stream(spark, events_dir)
    out = _run_to_memory(spark, se.sessionize_stream(stream), "sessions_t")
    rows = out.collect()
    assert len(rows) > 0
    # every session respects the gap: end >= start, events counted
    total = sum(r["n_events"] for r in rows)
    assert total == load_table(spark, SF_DIR, "events").count()
    # session count per user matches the batch lag-based q20 logic
    from ecmm428_pycart_spark.benchmarks.relational import q20_sessionize
    batch = {r["user_id"]: r["n_sessions"]
             for r in q20_sessionize(spark, SF_DIR).collect()}
    stream_counts = {}
    for r in rows:
        stream_counts[r["user_id"]] = stream_counts.get(r["user_id"], 0) + 1
    assert stream_counts == batch


def test_running_user_stats_stateful(spark, events_dir):
    stream = se.read_events_stream(spark, events_dir)
    sdf = se.running_user_stats(stream)
    q = (sdf.writeStream.format("memory").queryName("ustats_t")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # last update per user == full-history aggregate
    got = {r["user_id"]: (r["n_events"], r["sum_value"])
           for r in spark.table("ustats_t").collect()}
    batch = (load_table(spark, SF_DIR, "events").groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("value"), 2).alias("s")))
    want = {r["user_id"]: (r["n"], r["s"]) for r in batch.collect()}
    assert got == want and len(got) > 0
