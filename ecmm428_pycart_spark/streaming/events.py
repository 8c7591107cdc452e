"""Structured Streaming variants of the event pipeline.

The reference is batch-only (SURVEY.md §2.2: "no streaming of any
kind"), so this is beyond-reference surface: the q19 hourly aggregation
re-expressed as an incremental stream with watermarked event time, plus a
custom stateful sessionizer — the streaming twin of q20.

Batch-testable: ``read_events_stream`` uses the parquet *file* source
over a testdata dir, and the tests drive it with trigger(availableNow)
into a memory sink, which exercises the same incremental execution path
a production kafka/file stream would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Fixture layout for tests that synthesize their own event files with
# pandas datetime64[ns] (read as raw nanos under legacy.parquet.nanosAsLong).
# The testdata reader below does NOT assume this: it adapts to whatever
# physical type the generator used.
EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),        # raw nanos
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_events_stream(spark: SparkSession, events_dir: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a DIRECTORY of events parquet files (the
    source requires a directory; new files appended to it become
    micro-batches — availableNow drains the backlog).

    The file source needs an explicit schema, and the testdata
    generator's timestamp physical type has varied across rounds (INT64
    nanos vs TIMESTAMP(MICROS) NTZ — see session.load_table), so take
    the schema from a batch read of the same directory (one footer read
    on the driver) and apply the same ts normalization as the batch path.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(events_dir)
    ts_type = dict((f.name, f.dataType.simpleString()) for f in schema)["ts"]
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    elif ts_type == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def hourly_event_counts(events: DataFrame,
                        watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event_type with late-data watermark —
    the streaming twin of q19_events_hourly. State size is bounded by
    (#open windows × #event types); the watermark closes windows."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("win.start").alias("window_start"), "event_type",
                    "n", "sum_value"))


def dedupe_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact-dedup on event_id: dropDuplicates over a
    watermarked stream keeps per-key state only until the watermark
    passes — the streaming twin of datapipe.dedup.exact_dup_groups,
    bounded state at any throughput."""
    return (events
            .withWatermark("ts", watermark)
            .dropDuplicates(["event_id"]))


_USER_STATS_OUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
    T.StructField("max_value", T.DoubleType()),
])
_USER_STATS_STATE = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("s", T.DoubleType()),
    T.StructField("m", T.DoubleType()),
])


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, sum, max) across micro-batches — the pattern for any
    accumulator the built-in windowed aggs can't express. State is one
    tiny tuple per user, so the store scales with |users|, not |events|."""
    def update(key, pdfs, state):
        import pandas as pd
        n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            if len(pdf):
                m = max(m, float(pdf["value"].max()))
        state.update((n, s, m))
        # raw sum — rounding happens downstream with F.round (HALF_UP);
        # Python round() is banker's and diverges from SQL engines
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "sum_value": [s], "max_value": [m]})

    return (events.groupBy("user_id").applyInPandasWithState(
        update, _USER_STATS_OUT, _USER_STATS_STATE,
        "update", "NoTimeout"))


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user via session_window — the streaming
    twin of q20_sessionize. applyInPandasWithState would be the fully
    custom route; session_window is the built-in that covers this
    semantics (keep the custom-state escape hatch for logic the built-in
    can't express)."""
    return (events
            .withWatermark("ts", "2 hours")
            .groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("win"),
                     "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select("user_id", F.col("win.start").alias("session_start"),
                    F.col("win.end").alias("session_end"), "n_events",
                    "sum_value"))


def daily_type_totals(events: DataFrame,
                      watermark: str = "2 days") -> DataFrame:
    """Daily per-type totals in UPDATE mode — each micro-batch emits
    only the (day, type) rows it changed, the shape a foreachBatch
    upsert sink consumes. Watermark bounds the aggregation state to the
    late-data horizon."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("win.start").cast("date").alias("event_date"),
                    "event_type", "n", "sum_value"))


def foreach_batch_upsert_writer(path: str):
    """foreachBatch sink implementing the idempotent-upsert pattern on
    plain parquet (what MERGE INTO does on a lakehouse table): each
    micro-batch's changed rows are appended stamped with the batch id;
    readers reconstruct current state by taking each key's row from the
    LATEST batch (argmax merge, see read_upsert_state). A retried batch
    re-appends identical (key, batch_id) rows, which the argmax
    collapses — giving effectively-once results over an append-only
    sink with no table format required."""
    def write(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.withColumn("_batch_id", F.lit(batch_id))
         .write.mode("append").parquet(path))
    return write


def read_upsert_state(spark: SparkSession, path: str) -> DataFrame:
    """Current state of a foreach_batch_upsert_writer sink: per
    (event_date, event_type) the row with the highest batch id — one
    shuffle on the key, exactly the merge a lakehouse MERGE INTO
    performs at read-optimization time."""
    from pyspark.sql import Window as W
    df = spark.read.parquet(path)
    w = W.partitionBy("event_date", "event_type").orderBy(
        F.col("_batch_id").desc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_batch_id"))


def write_time_ordered_stream_dir(parts, out_dir: str,
                                  start_seq: int = 0) -> None:
    """Materialize DataFrame slices as one parquet file each in
    ``out_dir``, with STRICTLY INCREASING modification times in slice
    order.

    The file stream source orders its backlog by modification time, so
    replaying a time-sliced table through availableNow only simulates
    an in-order stream if mtimes follow event time — parallel writes
    get arbitrary mtimes, the late slices can be listed first, the
    watermark jumps ahead, and earlier events are dropped as late.
    os.utime pins the order deterministically (no sleeps)."""
    import glob
    import os
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="stream_slices_")
    base = 1_600_000_000          # any fixed epoch; only ORDER matters
    for i, part in enumerate(parts, start=start_seq):
        pdir = os.path.join(scratch, f"p{i}")
        part.coalesce(1).write.mode("overwrite").parquet(pdir)
        src = glob.glob(os.path.join(pdir, "part-*.parquet"))[0]
        dst = os.path.join(out_dir, f"{i:05d}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (base + 10 * i, base + 10 * i))
    shutil.rmtree(scratch, ignore_errors=True)


_TIMEOUT_SESS_OUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start_us", T.LongType()),
    T.StructField("session_last_us", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])

_TIMEOUT_SESS_STATE = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("s", T.DoubleType()),
])


def timeout_sessionize(events: DataFrame,
                       gap_minutes: int = 30) -> DataFrame:
    """Gap sessionization as a CUSTOM stateful operator with
    EVENT-TIME TIMEOUTS (applyInPandasWithState + EventTimeTimeout) —
    the machinery session_window hides: the open session lives in the
    state store with a timeout registered at last_event + gap, in-batch
    gaps close sessions inline, and the final session of a key is
    closed by the WATERMARK firing the timeout (state.hasTimedOut with
    no new rows). This is the template for stateful logic the built-in
    windows can't express (e.g. value-dependent gaps). State is one
    tuple per open session; emitted rows are closed sessions only."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        import pandas as pd
        closed = []
        if state.hasTimedOut:
            closed.append(tuple(state.get))
            state.remove()
        else:
            ts = []
            vals = []
            for pdf in pdfs:
                t = pdf["ts"].astype("datetime64[us]").astype("int64")
                ts.extend(int(x) for x in t)
                vals.extend(float(v) for v in pdf["value"].fillna(0.0))
            order = sorted(range(len(ts)), key=lambda i: ts[i])
            cur = list(state.get) if state.exists else None
            for i in order:
                t, v = ts[i], vals[i]
                if cur is None:
                    cur = [t, t, 1, v]
                elif t - cur[1] <= gap_us:
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
                    cur[3] += v
                else:
                    closed.append(tuple(cur))
                    cur = [t, t, 1, v]
            if cur is not None:
                state.update(tuple(cur))
                # last_event + gap, clamped above the current watermark:
                # a session fed by an admitted-but-late event can have
                # last_event + gap <= watermark, and registering a
                # timeout at or below the watermark is an error that
                # kills the query. Clamping fires the timeout on the
                # next batch instead — same emission, no crash.
                timeout_ms = cur[1] // 1000 + gap_minutes * 60 * 1000
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))
        yield pd.DataFrame(
            [(key[0], c[0], c[1], c[2], c[3]) for c in closed],
            columns=["user_id", "session_start_us", "session_last_us",
                     "n_events", "sum_value"])

    return (events.groupBy("user_id").applyInPandasWithState(
        fn, _TIMEOUT_SESS_OUT, _TIMEOUT_SESS_STATE,
        "append", "EventTimeTimeout"))


_FUNNEL_OUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("depth", T.IntegerType()),
])
_FUNNEL_STATE = T.StructType([
    T.StructField("matched", T.IntegerType()),
    T.StructField("last_us", T.LongType()),
])


def funnel_stream(events: DataFrame, steps: list[str]) -> DataFrame:
    """STREAMING funnel: per-user ordered-step matching as a custom
    stateful operator (applyInPandasWithState, NoTimeout) — the
    real-time counterpart of ``datapipe.funnel.funnel`` with identical
    earliest-match strict-ordering semantics. State is two numbers per
    user (steps matched, last matched event-time in micros); depth is
    MONOTONE, so each batch emits the user's current depth in update
    mode and the latest value per user is simply the max.

    Parity contract: equal to the batch fold when each user's events
    ARRIVE in event-time order (the replay harness's
    write_time_ordered_stream_dir guarantees it; in production,
    in-order per-key delivery is the usual log-compaction guarantee).
    Late out-of-order events are matched in arrival order — the honest
    streaming semantics; replaying the log through the batch operator
    is the reconciliation path, exactly how production funnel engines
    handle it.

    ``events`` needs (user_id, ts, event_id, event_type). Emits
    (user_id, depth) updates; aggregate downstream.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)

    def fn(key, pdfs, state):
        import pandas as pd
        rows = []
        for pdf in pdfs:
            t = pdf["ts"].astype("datetime64[us]").astype("int64")
            for ts_us, oid, typ, ok in zip(
                    t, pdf["event_id"], pdf["event_type"],
                    pdf["ts"].notna()):
                if ok:
                    # null event_id arrives as NaN (pandas widens to
                    # float64); -1 sorts it before real ids, mirroring
                    # the batch fold's nulls-first struct sort
                    o = -1 if pd.isna(oid) else int(oid)
                    rows.append((int(ts_us), o, str(typ)))
        rows.sort()
        matched, last_us = (tuple(state.get) if state.exists
                            else (0, -1))
        for ts_us, _oid, typ in rows:
            if (matched < k and typ == steps[matched]
                    and (matched == 0 or ts_us > last_us)):
                matched += 1
                last_us = ts_us
        state.update((matched, last_us))
        yield pd.DataFrame([(key[0], matched)],
                           columns=["user_id", "depth"])

    return (events.groupBy("user_id").applyInPandasWithState(
        fn, _FUNNEL_OUT, _FUNNEL_STATE, "update", "NoTimeout"))


def _tws_available() -> bool:
    """transformWithStateInPandas speaks a protobuf-based state-server
    protocol; this container ships no python google.protobuf, so the
    operator below is environment-gated (same convention as the
    PIL-less multimodal decoders: real implementation, gated test)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def tws_running_stats(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, sum_value) through Spark 4's NEW
    arbitrary-stateful API (``transformWithStateInPandas`` +
    ``StatefulProcessor`` with a typed ValueState) — the successor of
    applyInPandasWithState that ``running_user_stats`` uses; both
    operators compute the same thing so their parity is checkable
    where the protocol's protobuf dependency exists
    (tests/test_streaming.py skips cleanly here). Requires the RocksDB
    state store provider (set by the caller or session conf)."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    if not _tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs python protobuf, which "
            "this environment does not provide")

    out = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ])
    state_schema = T.StructType([T.StructField("n", T.LongType()),
                                 T.StructField("s", T.DoubleType())])

    class RunningStats(StatefulProcessor):
        def init(self, handle):
            self.state = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, s = (self.state.get() if self.state.exists()
                    else (0, 0.0))
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].fillna(0.0).sum())
            self.state.update((n, s))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "sum_value": [s]})

        def close(self):
            pass

    return (events.select("user_id", "value")
            .groupBy("user_id").transformWithStateInPandas(
                RunningStats(), outputStructType=out,
                outputMode="Update", timeMode="None"))


_KMV_OUT = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("n_in_sketch", T.LongType()),
    T.StructField("kth", T.LongType()),
    T.StructField("est", T.LongType()),
])
_KMV_STATE = T.StructType([
    T.StructField("hs", T.ArrayType(T.LongType())),
])


def stream_kmv_distinct(events: DataFrame, k: int = 64) -> DataFrame:
    """STREAMING bottom-k (KMV) distinct sketch per event_type as a
    custom stateful operator (applyInPandasWithState, NoTimeout) —
    the exact-merge counterpart of st16's HLL: state is the k
    smallest 40-bit md5 hashes of the user ids seen, <= k longs per
    key (bounded, where exact streaming COUNT(DISTINCT) is
    unbounded), and bottom-k union is commutative / associative /
    IDEMPOTENT, so the final sketch — and therefore the estimate —
    is independent of micro-batch slicing and replays exactly in a
    batch SQL oracle (st16 could only bound its HLL error; this
    sketch is value-deterministic).

    Emissions are update-mode per batch; n_in_sketch and est are
    monotone non-decreasing and kth (once the sketch fills) monotone
    non-increasing, so the final state per key aggregates as
    max / max / min-over-nonzero downstream. Null user_ids are
    dropped (the batch convention)."""
    def update(key, pdfs, state):
        import hashlib

        import pandas as pd
        s = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            for u in pdf["user_id"].dropna():
                s.add(int(hashlib.md5(str(int(u)).encode())
                          .hexdigest()[:10], 16))
        hs = sorted(s)[:k]
        state.update((hs,))
        n = len(hs)
        kth = hs[-1] if n == k else 0
        est = n if n < k else (k - 1) * (1 << 40) // kth
        yield pd.DataFrame([(key[0], n, kth, est)],
                           columns=["event_type", "n_in_sketch",
                                    "kth", "est"])

    return (events.groupBy("event_type").applyInPandasWithState(
        update, _KMV_OUT, _KMV_STATE, "update", "NoTimeout"))


_RA_OUT = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("n_hours", T.LongType()),
    T.StructField("n_scored", T.LongType()),
    T.StructField("n_outliers", T.LongType()),
    T.StructField("max_excess", T.LongType()),
])

_RA_STATE = T.StructType([
    T.StructField("hrs", T.ArrayType(T.LongType())),
    T.StructField("cnts", T.ArrayType(T.LongType())),
    T.StructField("n_ev", T.LongType()),
])


def stream_rolling_anomaly(events: DataFrame, window: int = 24,
                           z: int = 3) -> DataFrame:
    """STREAMING rolling z-score volume anomalies per event_type —
    the stateful twin of funnel.rolling_zscore_outliers
    (applyInPandasWithState, NoTimeout). State per key is the
    hour -> count map of everything seen (epoch-hour keyed; bounded
    by the monitoring horizon's distinct hours, ~720 per month —
    production would evict hours older than watermark - window).
    Count accumulation is a commutative/associative SUM, so the
    FINAL emission's map — and therefore the full rescoring it
    triggers — is independent of micro-batch slicing and replays
    exactly in the batch SQL oracle (the st18 determinism
    discipline). Each emission rescores its complete map with the
    division-free integer test (x*n - s)^2 > z^2*(n*q - s^2) over
    the ``window`` preceding observed hours, full windows only.

    n_events strictly increases on every emission for a key (a key
    only fires when its batch has rows), so downstream takes the
    per-key argmax of n_events as the final answer."""
    z2 = z * z

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd
        if state.exists:
            hrs, cnts, n_ev = state.get
            acc = dict(zip(hrs, cnts))
        else:
            acc, n_ev = {}, 0
        for pdf in pdfs:
            ts = pdf["ts"].dropna()
            n_ev += len(ts)
            hours = (ts.astype("int64") // (3600 * 10 ** 9))
            for h, c in hours.value_counts().items():
                acc[int(h)] = acc.get(int(h), 0) + int(c)
        hrs = sorted(acc)
        cnts = [acc[h] for h in hrs]
        state.update((hrs, cnts, n_ev))
        x = np.asarray(cnts, dtype=np.int64)
        n_scored = n_outliers = 0
        max_excess = 0
        for i in range(window, len(x)):
            w = x[i - window:i]
            s, q = int(w.sum()), int((w * w).sum())
            lhs = (int(x[i]) * window - s) ** 2
            excess = lhs - z2 * (window * q - s * s)
            n_scored += 1
            if excess > 0:
                n_outliers += 1
                max_excess = max(max_excess, excess)
        yield pd.DataFrame(
            [(key[0], n_ev, len(hrs), n_scored, n_outliers,
              max_excess)],
            columns=["event_type", "n_events", "n_hours", "n_scored",
                     "n_outliers", "max_excess"])

    return (events.groupBy("event_type").applyInPandasWithState(
        update, _RA_OUT, _RA_STATE, "update", "NoTimeout"))


_VD_OUT = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("n_buckets", T.LongType()),
    T.StructField("n_even_days", T.LongType()),
    T.StructField("n_odd_days", T.LongType()),
    T.StructField("chi2_ppm", T.LongType()),
    T.StructField("worst_bucket_ppm", T.LongType()),
])

_VD_STATE = T.StructType([
    T.StructField("bks", T.ArrayType(T.LongType())),
    T.StructField("evens", T.ArrayType(T.LongType())),
    T.StructField("odds", T.ArrayType(T.LongType())),
    T.StructField("n_ev", T.LongType()),
])


def stream_value_drift(events: DataFrame,
                       band_cents: int = 2000) -> DataFrame:
    """STREAMING value-distribution drift per event_type — the
    stateful twin of q114: amounts bucketed to ``band_cents`` bands,
    cohorts split by epoch-day parity, and the integer chi-square
    drift score rescored on every emission. State per key is the
    bucket -> (even-day count, odd-day count) map (bounded by the
    value range over the band width — price-shaped columns stay in
    the tens of buckets; production would clamp the tails). Count
    accumulation is a commutative/associative SUM, so the final
    emission — per-key argmax of the strictly-increasing n_events —
    is micro-batch-slicing invariant and replays exactly in the
    batch SQL oracle (the st21 discipline). The chi-square uses the
    q114 squared-numerator form: (a-c)^2 * 1e6 // (a+c), every term
    nonnegative."""

    def update(key, pdfs, state):
        import pandas as pd
        acc, n_ev = {}, 0
        if state.exists:
            bks, evens, odds, n_ev = state.get
            acc = {int(b): [int(e), int(o)]
                   for b, e, o in zip(bks, evens, odds)}
        for pdf in pdfs:
            sub = pdf.dropna(subset=["ts", "value"])
            n_ev += len(sub)
            if not len(sub):
                continue
            days = sub["ts"].astype("int64") // (86400 * 10 ** 9)
            half = (days % 2).astype("int64")
            import numpy as np
            bucket = (np.floor(sub["value"] * 100)
                      .astype("int64") // band_cents)
            for b, h in zip(bucket, half):
                slot = acc.setdefault(int(b), [0, 0])
                slot[int(h)] += 1
        bks = sorted(acc)
        state.update((bks, [acc[b][0] for b in bks],
                      [acc[b][1] for b in bks], n_ev))
        chi2 = worst = 0
        n_even = n_odd = 0
        for b in bks:
            a, c = acc[b]
            n_even += a
            n_odd += c
            contrib = (a - c) * (a - c) * 1000000 // (a + c)
            chi2 += contrib
            worst = max(worst, contrib)
        yield pd.DataFrame(
            [(key[0], n_ev, len(bks), n_even, n_odd, chi2, worst)],
            columns=["event_type", "n_events", "n_buckets",
                     "n_even_days", "n_odd_days", "chi2_ppm",
                     "worst_bucket_ppm"])

    return (events.groupBy("event_type").applyInPandasWithState(
        update, _VD_OUT, _VD_STATE, "update", "NoTimeout"))


def read_cdc_state(spark: SparkSession, path: str, key_cols,
                   op_col: str = "op",
                   delete_value: str = "delete") -> DataFrame:
    """Current state of a CDC append sink that carries TOMBSTONES:
    per key the row from the LATEST batch (the upsert argmax of
    read_upsert_state), then keys whose latest row is a delete drop
    out entirely — the read-side of MERGE ... WHEN MATCHED AND
    op = 'delete' THEN DELETE. Retried batches re-append identical
    (key, batch) rows and collapse in the argmax, so deletes are as
    idempotent as upserts."""
    from pyspark.sql import Window as W
    df = spark.read.parquet(path)
    w = W.partitionBy(*key_cols).orderBy(F.col("_batch_id").desc())
    latest = (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .drop("_rn", "_batch_id"))
    return latest.filter(F.col(op_col) != delete_value)
