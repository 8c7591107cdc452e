"""Funnel analysis over an event stream — ordered-step completion
counts (view -> click -> purchase), the workhorse query of every
product-analytics engine (Amplitude/Mixpanel-class).

Semantics: a user completes step i if an event of step i's type occurs
STRICTLY after the (greedily earliest) completion time of step i-1 —
the standard earliest-match subsequence rule, which is provably optimal
(matching the earliest occurrence never forecloses a later step) and
has a clean SQL mirror (per-step min-ts CTE chain), so the whole
operator is oracle-checkable.

Plan shape: one shuffle groups each user's (ts, event_id, type) events;
``array_sort`` orders them chronologically (event_id tiebreak — same-ts
events resolve identically in both engines because the STRICT ts
comparison makes order among equal timestamps irrelevant); a native
``F.aggregate`` fold walks the array advancing a (matched, last_ts)
accumulator. No Python, no per-step join. Per-user state is the user's
event array — fine while per-user history fits a row (the common case;
for power-law users at 100 TB, pre-filter to the funnel's event types
first — done below — and/or window the time range, the same mitigations
every funnel engine applies). A k-step funnel over a trillion-event
table can instead run the k-join form (one min-ts aggregate per step);
this fold form reads the events once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _funnel_fold(events: DataFrame, steps: list[str], id_col: str,
                 ts_col: str, type_col: str, order_col: str) -> DataFrame:
    """Shared matching pipeline (type prune -> per-key sorted event
    array -> earliest-match strict-ordering fold). ONE definition of
    the load-bearing semantics, used by ``funnel`` and
    ``funnel_conversion_stats`` — a fix applied here fixes both.
    Returns one row per key with (matched, first_ts, last_ts)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    # scan only the funnel's event types — the first and biggest prune
    ev = (events.filter(F.col(type_col).isin(list(steps)))
          .select(id_col,
                  F.struct(F.col(ts_col).alias("ts"),
                           F.col(order_col).alias("oid"),
                           F.col(type_col).alias("t")).alias("e")))
    arr = (ev.groupBy(id_col)
           .agg(F.array_sort(F.collect_list("e")).alias("es")))
    step_arr = F.array(*[F.lit(s) for s in steps])
    init = F.struct(F.lit(0).alias("matched"),
                    F.lit(None).cast("timestamp").alias("first_ts"),
                    F.lit(None).cast("timestamp").alias("last_ts"))
    fold = F.aggregate(
        "es", init,
        lambda acc, e: F.when(
            (acc["matched"] < len(steps))
            & e["ts"].isNotNull()   # a null-ts event can never match:
            # it would void the strict-ordering constraint for every
            # later event and diverge from the min-ts SQL semantics
            & (e["t"] == F.element_at(step_arr, acc["matched"] + 1))
            & (acc["last_ts"].isNull() | (e["ts"] > acc["last_ts"])),
            F.struct((acc["matched"] + 1).alias("matched"),
                     F.coalesce(acc["first_ts"], e["ts"])
                     .alias("first_ts"),
                     e["ts"].alias("last_ts"))
        ).otherwise(acc))
    return arr.select(F.col(id_col), fold.alias("f"))         .select(id_col, "f.matched", "f.first_ts", "f.last_ts")


def step_counts(depth: DataFrame, steps: list[str],
                depth_col: str = "depth") -> DataFrame:
    """(step_idx 1-based, step, n_users) from a per-key depth frame:
    ONE aggregation row holds every step's count (sum of depth >= i
    indicators), exploded — a per-step union would replicate the
    upstream pipeline k times. Shared by the batch and streaming
    funnels so their output conventions cannot drift."""
    counts = depth.agg(*[
        F.coalesce(F.sum((F.col(depth_col) >= i).cast("long")), F.lit(0))
        .alias(f"_n{i}") for i in range(1, len(steps) + 1)])
    rows = F.array(*[
        F.struct(F.lit(i).alias("step_idx"), F.lit(s).alias("step"),
                 F.col(f"_n{i}").alias("n_users"))
        for i, s in enumerate(steps, start=1)])
    return (counts.select(F.explode(rows).alias("_r"))
            .select("_r.step_idx", "_r.step", "_r.n_users"))


def funnel(events: DataFrame, steps: list[str],
           id_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           order_col: str = "event_id") -> DataFrame:
    """Completion counts per funnel step: (step_idx 1-based, step,
    n_users) where n_users = users whose event stream contains the
    steps in order (strictly increasing timestamps)."""
    folded = _funnel_fold(events, steps, id_col, ts_col, type_col,
                          order_col)
    return step_counts(folded.select(F.col("matched").alias("depth")),
                       steps)


def rfm_segments(events: DataFrame, quartiles: int = 4,
                 id_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type", value_col: str = "value",
                 purchase_type: str = "purchase",
                 exact: bool = True,
                 approx_accuracy: int = 10000) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary), the classic
    user-value grid: days since last activity, event count, and
    purchase value per user, each scored into ``quartiles`` buckets
    (1 = best: most recent / most frequent / highest spend).

    One groupBy collapses events to per-user rows; the anchor "now" is
    the corpus max(ts) (1-row broadcast). Scoring is the
    perplexity_buckets pattern (VERDICT r4 #6 — no global window
    anywhere in the plan): ONE 1-row percentile aggregate over the
    reduced user table computes the quartile cut points per dimension,
    broadcasts back, and classification is a map-side comparison
    against the (6-rounded, engine-stable) cuts. Unlike ntile, ties
    never straddle a boundary: users with identical metric values
    always share a bucket, so populations are equal only up to ties —
    the deterministic semantics a segmentation should have. At
    billions-of-users scale pass ``exact=False`` for
    percentile_approx (same plan shape, bounded sketch state; bucket
    edges move by the sketch's rank error only). Returns
    (user_id, recency_days, frequency, monetary, r, f, m).
    """
    if quartiles < 2:
        raise ValueError("quartiles must be >= 2")
    anchor = events.agg(F.max(ts_col).alias("_mx"))
    rfm = (events.join(F.broadcast(anchor))
           .groupBy(id_col)
           .agg(F.datediff(F.first("_mx"), F.max(ts_col))
                .cast("long").alias("recency_days"),
                F.count(F.lit(1)).alias("frequency"),
                F.round(F.sum(F.when(F.col(type_col) == purchase_type,
                                     F.col(value_col)).otherwise(0.0)), 2)
                .alias("monetary")))
    # per-dimension "badness" keys: ascending = better, so bucket =
    # 1 + (# cut points strictly below the key) for every dimension
    dims = (("r", F.col("recency_days")),
            ("f", -F.col("frequency")),
            ("m", -F.col("monetary")))
    fracs = [i / quartiles for i in range(1, quartiles)]
    aggs = []
    for name, key in dims:
        for j, fr in enumerate(fracs):
            pct = (F.percentile(key, F.lit(fr)) if exact
                   else F.percentile_approx(key, F.lit(fr),
                                            F.lit(approx_accuracy)))
            aggs.append(F.round(pct, 6).alias(f"_c_{name}{j}"))
    cuts = rfm.agg(*aggs)
    out = rfm.join(F.broadcast(cuts))
    for name, key in dims:
        score = F.lit(1)
        for j in range(len(fracs)):
            score = score + F.when(key > F.col(f"_c_{name}{j}"), 1) \
                             .otherwise(0)
        out = out.withColumn(name, score.cast("int"))
    return out.drop(*[f"_c_{name}{j}" for name, _ in dims
                      for j in range(len(fracs))])


def rolling_active_users(events: DataFrame, window_days: int = 7,
                         id_col: str = "user_id",
                         ts_col: str = "ts") -> DataFrame:
    """DAU / rolling-WAU / stickiness per day — the engagement triple
    every events dashboard leads with: for each day, distinct daily
    actives, distinct actives over the trailing ``window_days``, and
    their ratio.

    Scale shape: the corpus collapses to DISTINCT (day, user) first
    (the big reduction); each such row then EXPLODES into its
    ``window_days`` trailing window memberships map-side — a constant
    fan-out that replaces the day-range join entirely (no BNLJ, no
    replicated day grid), and the rolling distinct is a plain
    groupBy(window_day) count-distinct. Days with no events at all are
    absent (a semi-join against observed days also drops the phantom
    trailing windows past the corpus end); leading days carry partial
    windows, as dashboards report them. Ratio rounds to 6.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    du = (events.select(F.col(ts_col).cast("date").alias("day"),
                        F.col(id_col).alias("u")).distinct())
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    exploded = (du.select(
        F.explode(F.sequence(
            F.col("day"),
            F.date_add(F.col("day"), window_days - 1))).alias("day"),
        "u")
        .join(days, "day", "left_semi"))
    wau = (exploded.groupBy("day")
           .agg(F.countDistinct("u").alias("wau")))
    return (dau.join(wau, "day")
            .select("day", "dau", "wau",
                    F.round(F.col("dau") / F.col("wau"), 6)
                    .alias("stickiness")))


def funnel_conversion_stats(events: DataFrame, steps: list[str],
                            id_col: str = "user_id", ts_col: str = "ts",
                            type_col: str = "event_type",
                            order_col: str = "event_id") -> DataFrame:
    """Time-to-convert for funnel completers: for users who finish all
    ``steps`` (same earliest-match strict-ordering semantics as
    ``funnel``), the seconds between their step-1 match and their final
    step's match, reduced to (n_converted, avg_seconds, min_seconds,
    max_seconds) — the latency half of every funnel dashboard.

    Same single-pass plan as ``funnel`` with one more accumulator
    field (the first match's timestamp). Durations are exact integer
    seconds (timestamp difference), so the aggregate hashes identically
    cross-engine.
    """
    folded = _funnel_fold(events, steps, id_col, ts_col, type_col,
                          order_col)
    done = (folded.filter(F.col("matched") >= len(steps))
            .select((F.unix_timestamp("last_ts")
                     - F.unix_timestamp("first_ts"))
                    .alias("seconds")))
    return done.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.avg("seconds"), 2).alias("avg_seconds"),
        F.min("seconds").alias("min_seconds"),
        F.max("seconds").alias("max_seconds"))


def sessionize(events: DataFrame, gap_minutes: int = 30,
               id_col: str = "user_id", ts_col: str = "ts",
               order_col: str = "event_id") -> DataFrame:
    """Gap-based sessionization — the standard event-to-session
    assignment every product-analytics engine runs before computing
    session metrics: a new session starts at a user's first event and
    at every event more than ``gap_minutes`` after the previous one.

    Relationship to the rest of the session family: q20_sessionize
    (benchmarks/relational.py) is the inline COUNT-only form (how many
    sessions per user, no ids, microsecond-precision gap); this
    operator ASSIGNS the session id to every event so durations,
    per-session rollups, and downstream joins are possible — and
    streaming twins exist as `sessionize_stream` (session_window) and
    `timeout_sessionize` (custom state) in streaming/events.py. Gap
    precision here is whole epoch seconds (the SQL date_diff
    contract), vs q20's microseconds — an event landing inside the
    same second as the threshold continues the session here.

    Plan shape: one window partitioned BY USER (the shuffle key — no
    global window anywhere), ordered (ts, order_col); the session id is
    the running sum of new-session flags over the same window, so the
    whole operator is two window expressions in one pass. Scales by
    key: a user's events must fit one partition's window state, the
    same per-entity bound as the funnel fold (pre-filter the time range
    for power-law users). Null-ts events are excluded (the shared
    null-ts contract: a timestamp-less event belongs to no session).

    Gap comparison is on whole epoch seconds (``floor`` semantics,
    identical to SQL ``date_diff('second', ...)``), strict ``>``:
    an event exactly ``gap_minutes`` later continues the session.
    Returns the input rows + ``session_id`` (1-based per user).
    """
    from pyspark.sql import Window

    if gap_minutes <= 0:
        raise ValueError("gap_minutes must be positive")
    w = Window.partitionBy(id_col).orderBy(ts_col, order_col)
    prev = F.lag(F.col(ts_col)).over(w)
    new_s = F.when(
        prev.isNull()
        | (F.col(ts_col).cast("long") - prev.cast("long")
           > gap_minutes * 60), 1).otherwise(0)
    return (events.filter(F.col(ts_col).isNotNull())
            .withColumn("session_id", F.sum(new_s).over(w)))


def session_stats(events: DataFrame, gap_minutes: int = 30,
                  id_col: str = "user_id", ts_col: str = "ts",
                  order_col: str = "event_id") -> DataFrame:
    """Per-user session summary over ``sessionize``: session count,
    event count, the largest session, and the mean session duration in
    seconds (rounded to 2; single-event sessions last 0 s). Two
    aggregations after the sessionize window — (user, session) then
    user — both shuffles on the user key the window already
    established."""
    s = sessionize(events, gap_minutes, id_col, ts_col, order_col)
    per_session = (s.groupBy(id_col, "session_id")
                   .agg(F.count(F.lit(1)).alias("_n"),
                        (F.max(F.col(ts_col).cast("long"))
                         - F.min(F.col(ts_col).cast("long")))
                        .alias("_dur")))
    return (per_session.groupBy(id_col)
            .agg(F.max("session_id").cast("long").alias("n_sessions"),
                 F.sum("_n").alias("n_events"),
                 F.max("_n").alias("max_session_events"),
                 F.round(F.avg("_dur"), 2).alias("avg_session_seconds")))


def rolling_zscore_outliers(events: DataFrame, window: int = 24,
                            z: int = 3, ts_col: str = "ts",
                            key_col: str = "event_type") -> DataFrame:
    """Rolling z-score anomaly scoring of hourly event volumes — the
    volume-spike monitor ops dashboards run over a pipeline's event
    stream, in EXACT integer arithmetic. Hours are epoch-seconds div
    3600; per key, each hour's count x is scored against the
    ``window`` PRECEDING observed hours (rows, not calendar hours —
    silent hours produce no row, so the baseline is "the last N hours
    with traffic", the documented contract; only FULL windows are
    scored). The float-free test: z-squared = (x*n - s)^2 / (n*q -
    s^2) with s/q the window's sum and sum-of-squares, so "z > 3"
    becomes the pure BIGINT predicate (x*n - s)^2 > 9*(n*q - s^2) —
    strictly-greater, so a point at EXACTLY 3 sigma is not flagged,
    and a zero-variance baseline flags any deviation (the division-
    free form needs no epsilon). Overflow: safe while hourly counts
    stay under ~2e7 at window 24 (x*n squared < 2^63).

    Plan: one (key, hour) count aggregate, then one bounded rows
    window per key — never global, never bigger than ``window``
    rows of state. Returns one row per scored hour: (key, hr, x, n,
    s, q, is_outlier, excess) with excess = lhs - rhs (positive ==
    flagged magnitude)."""
    from pyspark.sql import Window as W

    z2 = z * z
    hc = (events.filter(F.col(ts_col).isNotNull())
          .groupBy(F.col(key_col).alias("key"),
                   F.floor(F.unix_timestamp(
                       F.col(ts_col).cast("timestamp")) / 3600)
                   .cast("long").alias("hr"))
          .agg(F.count(F.lit(1)).alias("x")))
    w = (W.partitionBy("key").orderBy("hr")
         .rowsBetween(-window, -1))
    scored = (hc.withColumn("n", F.count(F.lit(1)).over(w))
              .withColumn("s", F.sum("x").over(w))
              .withColumn("q", F.sum(F.col("x") * F.col("x")).over(w))
              .filter(F.col("n") == window))
    excess = (F.expr("(x * n - s) * (x * n - s)")
              - F.lit(z2) * F.expr("n * q - s * s"))
    return (scored.withColumn("excess", excess)
            .withColumn("is_outlier", (F.col("excess") > 0).cast("int")))


def clamped_balance(events: DataFrame, credit_types=("signup",
                                                     "purchase"),
                    id_col: str = "user_id", ts_col: str = "ts",
                    order_col: str = "event_id",
                    type_col: str = "event_type",
                    value_col: str = "value") -> DataFrame:
    """Per-user CLAMPED running balance — the wallet/credit model
    where spending can never take the balance below zero (each
    overdraw is truncated at 0 and counted). Genuinely outside
    window algebra: max(0, .) inside the recurrence makes every
    prefix depend on every clamp before it, so this is the module's
    funnel-fold discipline — one shuffle groups the user's ledger,
    ``array_sort`` orders it by (epoch-micros, event_id), and a
    native ``F.aggregate`` fold walks it with the accumulator PACKED
    into one BIGINT: balance * 65536 + clamp_count (balance stays
    nonnegative by construction, clamps bounded by the user's event
    count — re-widen the pack for users beyond 65k events). Credits
    (``credit_types``) add value-cents; everything else subtracts.
    An engine-independent integer recurrence, so a SQL oracle
    replays it with an ordered list aggregate + list_reduce.
    Returns (id, n_events, net_cents, final_cents, n_clamps)."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    d = F.when(F.col(type_col).isin(*credit_types), cents) \
        .otherwise(-cents)
    ev = (events.filter(F.col(ts_col).isNotNull())
          .select(F.col(id_col),
                  F.unix_micros(F.col(ts_col).cast("timestamp"))
                  .alias("_us"),
                  F.col(order_col).alias("_oid"), d.alias("_d")))
    arr = (ev.groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum("_d").alias("net_cents"),
                F.array_sort(F.collect_list(
                    F.struct("_us", "_oid", "_d"))).alias("_a")))
    packed = F.expr("""
        aggregate(_a, cast(0 as bigint), (acc, x) ->
          greatest(acc div 65536 + x._d, cast(0 as bigint)) * 65536
          + acc % 65536
          + (case when acc div 65536 + x._d < 0 then 1 else 0 end))
    """)
    return (arr.withColumn("_p", packed)
            .select(id_col, "n_events", "net_cents",
                    F.expr("_p div 65536").alias("final_cents"),
                    F.expr("_p % 65536").alias("n_clamps")))


def interval_islands(df: DataFrame, key_col: str, start_col: str,
                     end_col: str, merge_gap: int = 0) -> DataFrame:
    """Gaps-and-islands interval coalescing — merge a key's
    overlapping integer intervals into maximal covered "islands"
    (the classic warranty-coverage / machine-uptime / promo-window
    rollup). An interval joins the current island iff its start is
    <= the running max of all previous ends + ``merge_gap``; with
    the default gap 0 touching intervals ([1,5],[5,9]) merge but
    merely adjacent ones ([1,5],[6,7]) do not (ends inclusive).

    Plan shape: one shuffle partitions by key; a per-key ordered
    window (start, end — exact ties are order-invariant: only the
    first of an identical run can open an island and all of them
    land in it) takes the running max-end over ROWS UNBOUNDED
    PRECEDING..1 PRECEDING, a prefix sum of the break flags numbers
    the islands, and two hash aggregates roll islands then keys up.
    No unpartitioned window, nothing quadratic; per-key cost is the
    key's interval count — the same per-entity-history contract as
    ``sessionize``. Returns per key: n_intervals, n_islands,
    covered_units (sum over islands of end - start + 1),
    max_island_units."""
    from pyspark.sql import Window as W

    k, s, e = F.col(key_col), F.col(start_col), F.col(end_col)
    wo = W.partitionBy(key_col).orderBy(start_col, end_col)
    pme = F.max(e).over(wo.rowsBetween(W.unboundedPreceding, -1))
    brk = (pme.isNull() | (s > pme + F.lit(merge_gap))).cast("long")
    isl = (df.select(k, s.cast("long").alias(start_col),
                     e.cast("long").alias(end_col))
           .withColumn("_brk", brk)
           .withColumn("_island", F.sum("_brk").over(
               wo.rowsBetween(W.unboundedPreceding, 0))))
    per_island = (isl.groupBy(key_col, "_island")
                  .agg(F.min(start_col).alias("_is"),
                       F.max(end_col).alias("_ie"),
                       F.count(F.lit(1)).alias("_n")))
    span = F.col("_ie") - F.col("_is") + 1
    return (per_island.groupBy(key_col)
            .agg(F.sum("_n").alias("n_intervals"),
                 F.count(F.lit(1)).alias("n_islands"),
                 F.sum(span).alias("covered_units"),
                 F.max(span).alias("max_island_units")))


def distributed_prefix_sum(df: DataFrame, order_col: str,
                           value_col: str, out_col: str = "running",
                           bucket: int = 86400) -> DataFrame:
    """Global running sum over ``order_col`` WITHOUT a single-reducer
    window — the two-phase distributed prefix sum (round 8, extracted
    from the q112 concurrency sweep so every sweep-line consumer
    shares one pinned implementation):

    1. bucket rows by ``floor(order_col / bucket)`` and take the
       within-bucket running sum over a bucket-PARTITIONED ordered
       window (parallel across buckets);
    2. add each bucket's opening balance — the prefix sum of per-bucket
       totals, computed on the BUCKETS-sized frame (one row per bucket;
       the only unpartitioned window, over dimension-sized data) and
       broadcast back.

    Integer/decimal sums are exact, so the result is bit-identical to
    ``sum(value) OVER (ORDER BY order_col)`` — the property test pins
    this against the single-window form on arbitrary inputs. Rows with
    equal ``order_col`` land in the same bucket, so any within-ties
    ordering nondeterminism matches the global window's (sum over a
    tie group is order-free).

    At 100 TB: shuffle on the bucket key, |buckets| rows through the
    driver-adjacent second phase — pick ``bucket`` so that holds
    (seconds-per-day for event sweeps, id ranges for key ranks)."""
    from pyspark.sql import Window as W

    b = df.withColumn("_pb", F.floor(F.col(order_col) / bucket))
    within = b.withColumn(
        "_in", F.sum(value_col).over(
            W.partitionBy("_pb").orderBy(order_col)))
    opening = (b.groupBy("_pb").agg(F.sum(value_col).alias("_bt"))
               .withColumn(
                   "_open",
                   F.coalesce(
                       F.sum("_bt").over(
                           W.orderBy("_pb")
                           .rowsBetween(W.unboundedPreceding, -1)),
                       F.lit(0))))
    return (within.join(F.broadcast(opening.select("_pb", "_open")),
                        "_pb")
            .withColumn(out_col, F.col("_in") + F.col("_open"))
            .drop("_pb", "_in", "_open"))
