"""Property-based tests (hypothesis) for the continuation-session
data-pipeline kernels — invariants that must hold for ARBITRARY
corpora/event streams, not just the fixtures. Few examples per test
(each example is a Spark job), but each example is adversarial in
shape: empty docs, repeated words, overlapping merges, out-of-order
events."""

from hypothesis import given, settings
from hypothesis import strategies as st

words = st.text(alphabet="ab", min_size=1, max_size=4)
docs_strategy = st.lists(
    st.lists(words, min_size=0, max_size=8).map(" ".join),
    min_size=1, max_size=8)


@given(docs=docs_strategy,
       merges=st.lists(st.tuples(st.sampled_from("ab"),
                                 st.sampled_from(["a", "b", "</w>"])),
                       max_size=4))
@settings(max_examples=8, deadline=None)
def test_bpe_encode_reconstructs_input(spark, docs, merges):
    """For ANY corpus and ANY merge list, splitting each doc's encoded
    token stream at '</w>' boundaries reconstructs exactly the doc's
    words — BPE must never lose or reorder characters."""
    from ecmm428_pycart_spark.datapipe.text import bpe_encode

    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = {r["doc_id"]: list(r["tokens"])
           for r in bpe_encode(df, merges, checkpoint_every=2).collect()}
    for i, text in enumerate(docs):
        stream = "".join(got[i])
        rebuilt = [w for w in stream.split("</w>") if w != ""]
        assert rebuilt == [w for w in text.split(" ") if w], (
            docs, merges, got[i])


events_strategy = st.lists(
    st.tuples(st.integers(0, 3),                      # user
              st.integers(0, 120),                    # seconds offset
              st.sampled_from(["view", "click", "purchase", "other"])),
    min_size=0, max_size=30)


@given(evs=events_strategy)
@settings(max_examples=8, deadline=None)
def test_funnel_counts_never_increase(spark, evs):
    """For ANY event stream, step counts are non-increasing in step
    index (completing step i+1 implies completing step i), bounded by
    the user count, and conversion stats count == the last step's
    count."""
    from ecmm428_pycart_spark.datapipe.funnel import (
        funnel, funnel_conversion_stats)

    rows = [(i, f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}", u, t)
            for i, (u, s, t) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).selectExpr("event_id", "CAST(ts AS timestamp) ts", "user_id",
                 "event_type")
    steps = ["view", "click", "purchase"]
    got = {r["step_idx"]: r["n_users"] for r in funnel(df, steps).collect()}
    n_users = len({u for u, _, _ in evs})
    assert got[1] >= got[2] >= got[3] >= 0
    assert got[1] <= n_users
    conv = funnel_conversion_stats(df, steps).first()
    assert conv["n_converted"] == got[3]


@given(docs=st.lists(st.tuples(st.lists(words, min_size=1, max_size=6)
                               .map(" ".join),
                               st.sampled_from(["s0", "s1", "s2"])),
                     min_size=1, max_size=12),
       budget=st.integers(1, 500))
@settings(max_examples=8, deadline=None)
def test_temperature_mix_invariants(spark, docs, budget):
    """For ANY corpus and budget: rates lie in [0, 1] (rounded), every
    input row survives with a keep flag (totality), and keep decisions
    are a pure function of (doc_id, rate)."""
    from ecmm428_pycart_spark.datapipe.text import temperature_mix

    df = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(docs)],
        "doc_id long, text string, source string")
    out = temperature_mix(df, budget).collect()
    assert len(out) == len(docs)
    for r in out:
        assert 0.0 <= r["rate"] <= 1.0
    again = temperature_mix(df, budget).collect()
    assert sorted((r["doc_id"], r["keep"]) for r in out) == \
        sorted((r["doc_id"], r["keep"]) for r in again)


sess_events = st.lists(
    st.tuples(st.integers(0, 2),                 # user
              st.integers(0, 7200),              # offset seconds
              ),
    min_size=1, max_size=16)


@given(evs=sess_events, gap_min=st.sampled_from([1, 5, 30]))
@settings(max_examples=8, deadline=None)
def test_sessionize_matches_python_replay(spark, evs, gap_min):
    """For ANY event stream and gap, session ids match a brute-force
    per-user replay (sort by (ts, event_id), split on gap > threshold),
    and the per-user session-stats roll-up agrees with recomputing it
    from those ids — including duplicate timestamps, out-of-order
    input, and multi-user interleaving."""
    import datetime

    from pyspark.sql import functions as F

    from ecmm428_pycart_spark.datapipe.funnel import (session_stats,
                                                      sessionize)
    base = datetime.datetime(2024, 1, 1)
    rows = [(u, base + datetime.timedelta(seconds=off), i)
            for i, (u, off) in enumerate(evs)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                     "event_id long")
    got = {(r["user_id"], r["event_id"]): r["session_id"]
           for r in sessionize(df, gap_minutes=gap_min).collect()}

    # brute-force replay
    exp = {}
    per_user_sessions = {}
    for u in {u for u, _ in evs}:
        mine = sorted([(ts, eid) for (uu, ts, eid) in rows if uu == u])
        sid = 0
        prev = None
        sessions = []
        for ts, eid in mine:
            if prev is None or (int(ts.timestamp())
                                - int(prev.timestamp())) > gap_min * 60:
                sid += 1
                sessions.append([])
            sessions[-1].append(ts)
            exp[(u, eid)] = sid
            prev = ts
        per_user_sessions[u] = sessions
    assert got == exp, (evs, gap_min)

    stats = {r["user_id"]: r for r in
             session_stats(df, gap_minutes=gap_min).collect()}
    for u, sessions in per_user_sessions.items():
        durs = [int(s[-1].timestamp()) - int(s[0].timestamp())
                for s in sessions]
        assert stats[u]["n_sessions"] == len(sessions)
        assert stats[u]["n_events"] == sum(len(s) for s in sessions)
        assert stats[u]["max_session_events"] == max(len(s)
                                                     for s in sessions)
        # Spark's F.round is HALF_UP, Python round() is banker's —
        # they disagree on .xx5 averages (hypothesis found one). Any
        # correct 2-decimal rounding sits within half a cent of the
        # true average, so pin that bound instead of a tie rule.
        avg = sum(durs) / len(durs)
        assert abs(stats[u]["avg_session_seconds"] - avg) <= 0.005 + 1e-9


@given(vecs=st.lists(
    st.lists(st.integers(-5, 5).map(float), min_size=3, max_size=3),
    min_size=1, max_size=6))
@settings(max_examples=8, deadline=None)
def test_normalize_embeddings_properties(spark, vecs):
    """For ANY corpus: z-scored dimensions have (near-)zero mean; a
    zero-variance dimension maps to exactly 0 everywhere; output
    preserves ids and dimensionality."""
    import numpy as np

    from ecmm428_pycart_spark.datapipe.similarity import (
        normalize_embeddings)
    df = spark.createDataFrame(list(enumerate(vecs)),
                               "vec_id long, embedding array<double>")
    got = {r["vec_id"]: list(r["zvec"])
           for r in normalize_embeddings(df).collect()}
    assert set(got) == set(range(len(vecs)))
    a = np.array(vecs)
    s6 = np.round(a.std(axis=0), 6)
    z = np.array([got[i] for i in range(len(vecs))])
    assert z.shape == a.shape
    for d in range(a.shape[1]):
        if s6[d] == 0:
            assert (z[:, d] == 0.0).all(), (vecs, d)
        else:
            # mean of z is bounded by the 6-rounding of m/s, not exact 0
            assert abs(z[:, d].mean()) < 1e-3, (vecs, d)


intervals_strategy = st.lists(
    st.tuples(st.integers(0, 2),                      # key
              st.integers(0, 40),                     # start
              st.integers(0, 13)),                    # length
    min_size=0, max_size=30)


@given(ivs=intervals_strategy,
       parts=st.sampled_from([2, 7, 32]))
@settings(max_examples=8, deadline=None)
def test_interval_islands_matches_bruteforce(spark, ivs, parts):
    """For ANY interval multiset (duplicates, ties, containment,
    zero-length) and ANY shuffle-partition count, interval_islands
    equals a brute-force sweep — the determinism + correctness
    property behind q115 (added after a one-off sweep mismatch under
    host contention proved worth pinning forever)."""
    from ecmm428_pycart_spark.datapipe.funnel import interval_islands

    rows = [(k, s, s + ln) for k, s, ln in ivs]
    expected = {}
    bykey = {}
    for k, s, e in rows:
        bykey.setdefault(k, []).append((s, e))
    for k, items in bykey.items():
        items.sort()
        islands = []
        for s, e in items:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        expected[k] = (len(items), len(islands),
                       sum(e - s + 1 for s, e in islands),
                       max(e - s + 1 for s, e in islands))

    if not rows:
        return
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        df = spark.createDataFrame(rows, "k long, s long, e long")
        got = {r["k"]: (r["n_intervals"], r["n_islands"],
                        r["covered_units"], r["max_island_units"])
               for r in interval_islands(df, "k", "s", "e").collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert got == expected, (rows, got, expected)


robots_paths = st.lists(
    st.text(alphabet="/abx", min_size=1, max_size=8)
    .map(lambda p: "/" + p.lstrip("/")),
    min_size=1, max_size=12)
robots_rules = st.lists(
    st.tuples(st.sampled_from(["allow", "disallow"]),
              st.text(alphabet="/abx", min_size=1, max_size=6)
              .map(lambda p: "/" + p.lstrip("/"))),
    min_size=0, max_size=6)


@given(paths=robots_paths, rules=robots_rules)
@settings(max_examples=8, deadline=None)
def test_robots_filter_matches_rep_bruteforce(spark, paths, rules):
    """For ANY path set and ANY ruleset, robots_filter equals the
    RFC 9309 longest-match reference: longest matching prefix wins,
    exact-length ties go to allow, no match means allowed."""
    from pyspark.sql import Row

    from ecmm428_pycart_spark.datapipe.text import robots_filter

    def ref(path):
        best = None  # (plen, is_allow, rule_id)
        for rid, (rtype, prefix) in enumerate(rules, start=1):
            if path.startswith(prefix):
                key = (len(prefix), rtype == "allow", -rid)
                if best is None or key > best[0]:
                    best = (key, rtype == "allow")
        return True if best is None else best[1]

    rdf = spark.createDataFrame(
        [Row(rule_id=i, rtype=t, prefix=p)
         for i, (t, p) in enumerate(rules, start=1)],
        "rule_id long, rtype string, prefix string") if rules else \
        spark.createDataFrame([], "rule_id long, rtype string, prefix string")
    df = spark.createDataFrame([Row(pid=i, path=p)
                                for i, p in enumerate(paths)])
    got = {r["pid"]: r["allowed"]
           for r in robots_filter(df, rdf).collect()}
    want = {i: ref(p) for i, p in enumerate(paths)}
    assert got == want, (paths, rules, got, want)


@given(doc_id=st.integers(0, 10**6),
       n_tokens=st.integers(1, 140))
@settings(max_examples=8, deadline=None)
def test_outlink_extraction_closed_form_property(doc_id, n_tokens):
    """For ANY doc id and token count, the REAL href extractor over
    the synthetic outlink page returns exactly the closed-form host
    list (the d93/d94 oracle contract) — both quote styles, decoys
    and paragraph-boundary edge cases included. Pure Python: no Spark
    job per example."""
    from ecmm428_pycart_spark.datapipe.text import (
        extract_outlink_hosts, synth_html_outlinks)

    text = " ".join(f"w{i}" for i in range(n_tokens))
    np_ = (n_tokens + 9) // 10
    want = [f"h{(doc_id * 7 + pid) % 13}"
            for pid in range(np_) if pid % 4 == 1 and pid < np_ - 1]
    got = extract_outlink_hosts(synth_html_outlinks(doc_id, text))
    assert got == want, (doc_id, n_tokens, got, want)


# ---------------------------------------------------------------------------
# Round-8 properties: WARC framing and sequence packing
# ---------------------------------------------------------------------------

_payload_bytes = st.binary(min_size=0, max_size=120)


@given(recs=st.lists(
    st.tuples(st.sampled_from(["request", "response", "metadata"]),
              st.integers(0, 99), _payload_bytes),
    min_size=1, max_size=6))
@settings(max_examples=40, deadline=None)
def test_warc_framing_roundtrips_arbitrary_payloads(recs):
    """ISO 28500 framing is Content-Length driven, so ANY payload bytes
    must round-trip exactly — including payloads that CONTAIN the
    record separator (\\r\\n\\r\\n), a fake 'WARC/1.1' version line, or
    fake headers. A reader that scans payload bytes for markers
    instead of honoring Content-Length fails exactly these."""
    from ecmm428_pycart_spark.datapipe.multimodal import (
        decode_warc_records, warc_bytes)

    triples = [(t, f"http://h{u % 13}.example/p{u}",
                b"\r\n\r\nWARC/1.1\r\nContent-Length: 0\r\n" + p
                if u % 2 else p)
               for t, u, p in recs]
    out = decode_warc_records(warc_bytes(triples))
    assert [(r["warc_type"], r["target_uri"], r["payload"])
            for r in out] == triples


@given(docs=st.lists(st.integers(0, 60), min_size=1, max_size=24),
       budget=st.sampled_from([8, 64, 2048]),
       shards=st.sampled_from([1, 4, 16]))
@settings(max_examples=10, deadline=None)
def test_pack_sequences_invariants(spark, docs, budget, shards):
    """For ANY corpus and any (budget, shards): every doc appears
    exactly once; within a shard, ordering by (md5(id), id) makes
    pack_offset the exact running sum of preceding token counts and
    pack_id == floor(offset / budget) — the greedy-binning contract
    d21's oracle states, replayed here in pure Python."""
    import hashlib

    from ecmm428_pycart_spark.datapipe.text import pack_sequences

    rows = [(i, " ".join(f"w{j}" for j in range(nt)))
            for i, nt in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           pack_sequences(df, budget=budget, shards=shards).collect()}
    assert set(got) == {i for i, _ in rows}
    # python replay of the shard/order/offset algebra; token count from
    # the text itself — "" splits to [""], so an empty doc counts 1
    # token in BOTH engines (the string_split convention)
    meta = []
    for i, (_, text) in enumerate(rows):
        nt = len(text.split(" "))
        h = hashlib.md5(str(i).encode()).hexdigest()
        meta.append((int(h[:2], 16) % shards, h, i, nt))
    for shard in {m[0] for m in meta}:
        run = 0
        for _, h, i, nt in sorted(m for m in meta if m[0] == shard):
            r = got[i]
            assert r["shard"] == shard
            assert r["n_tokens"] == nt, (i, nt, r)
            assert r["pack_offset"] == run
            assert r["pack_id"] == run // budget
            run += nt


@given(rows=st.lists(
    st.tuples(st.integers(-200000, 200000),      # order key (any sign,
                                                 # spans bucket edges)
              st.integers(-5, 5)),               # delta
    min_size=1, max_size=40),
    bucket=st.sampled_from([1, 7, 86400]))
@settings(max_examples=12, deadline=None)
def test_distributed_prefix_sum_matches_global_window(spark, rows,
                                                      bucket):
    """funnel.distributed_prefix_sum must equal
    sum(value) OVER (ORDER BY key) for ANY inputs — negative keys and
    values, duplicate keys, bucket-boundary keys, bucket sizes from
    degenerate (1) to the q112 day — replayed in pure Python."""
    from collections import defaultdict

    from ecmm428_pycart_spark.datapipe.funnel import (
        distributed_prefix_sum)

    # collapse duplicate keys first (the q112 shape: one row per t);
    # within-key ordering of a running sum is undefined otherwise
    agg = defaultdict(int)
    for t, d in rows:
        agg[t] += d
    df = spark.createDataFrame(sorted(agg.items()), "t long, nd long")
    got = {r["t"]: r["running"] for r in
           distributed_prefix_sum(df, "t", "nd",
                                  bucket=bucket).collect()}
    run = 0
    for t in sorted(agg):
        run += agg[t]
        assert got[t] == run, (t, got[t], run, bucket)
