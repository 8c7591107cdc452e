"""Hand-case and independent-replay tests for the round-8 additions
(the test_round{6,7}_ops discipline): the WARC media capture/extract
pair behind m52, the factored mixed-media algebra it shares with m34,
and a pure-Python third-engine replay of g41's exact-integer host
PageRank (the Spark query and the DuckDB oracle already agree at
three scales; this pins the CLOSED FORM itself against first
principles, independent of both engines)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F


# ---------------------------------------------------------------------------
# m52 plumbing: synth_warc_media_payload / warc_media_extract
# ---------------------------------------------------------------------------

def _mixed_bytes(i: int) -> bytes:
    from ecmm428_pycart_spark.datapipe.multimodal import _mixed_media_bytes
    return _mixed_media_bytes(i)


def test_warc_media_payload_framing_and_response_bytes():
    """The capture is a real 2-record WARC: request decoy first,
    response second, response payload byte-identical to the bare
    mixed-media column (the factored-algebra identity m52's oracle
    depends on)."""
    import pandas as pd

    from ecmm428_pycart_spark.datapipe.multimodal import (
        decode_warc_records, synth_warc_media_payload)

    gen = synth_warc_media_payload.func
    ids = [0, 1, 2, 3, 7, 26]   # one per media kind + repeats
    payloads = gen(pd.Series(ids))
    for i, buf in zip(ids, payloads):
        recs = decode_warc_records(bytes(buf))
        assert [r["warc_type"] for r in recs] == ["request", "response"]
        assert recs[0]["payload"] == f"GET /m{i}".encode()
        assert recs[1]["payload"] == _mixed_bytes(i)
        assert recs[1]["target_uri"] == f"http://h{i % 13}.example/m{i}"


def test_warc_media_extract_matches_bare_dispatch(spark):
    """End-to-end through Spark: wrapping the media bytes in WARC and
    extracting must reproduce the bare mixed_media_stats numbers
    exactly, plus the framing audit (2 records, 1 response)."""
    from ecmm428_pycart_spark.datapipe import multimodal

    df = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    via_warc = (df.withColumn(
                    "p", multimodal.synth_warc_media_payload("doc_id"))
                .withColumn("s", multimodal.warc_media_extract("p"))
                .select("doc_id", "s.media_type", "s.n_units",
                        "s.sum_val", "s.n_records", "s.n_responses"))
    bare = (df.withColumn("p", multimodal.synth_mixed_payload("doc_id"))
            .withColumn("s", multimodal.mixed_media_stats("p"))
            .select("doc_id", F.col("s.media_type").alias("bmt"),
                    F.col("s.n_units").alias("bu"),
                    F.col("s.sum_val").alias("bv")))
    rows = {r["doc_id"]: r for r in via_warc.collect()}
    for b in bare.collect():
        r = rows[b["doc_id"]]
        assert (r["media_type"], r["n_units"], r["sum_val"]) == \
            (b["bmt"], b["bu"], b["bv"])
        assert (r["n_records"], r["n_responses"]) == (2, 1)
    kinds = {i % 4: rows[i]["media_type"] for i in range(12)}
    assert kinds == {0: "qoi", 1: "bmp", 2: "wav", 3: "tiff"}


def test_warc_media_extract_multi_response_sums_and_null():
    """Hand-built archives: two responses sum their unit/value totals
    (media_type = first response's); request-only archives yield zero
    responses; a None payload row stays all-NULL."""
    import pandas as pd

    from ecmm428_pycart_spark.datapipe.multimodal import (
        _media_stats_row, warc_bytes, warc_media_extract)

    two = warc_bytes([
        ("request", "http://h0.example/a", b"GET /a"),
        ("response", "http://h0.example/a", _mixed_bytes(2)),   # wav
        ("response", "http://h0.example/b", _mixed_bytes(6)),   # wav
    ])
    reqonly = warc_bytes([("request", "http://h1.example/c", b"GET /c")])
    out = warc_media_extract.func(pd.Series([two, reqonly, None]))
    r0 = out.iloc[0]
    t2, u2, v2 = _media_stats_row(_mixed_bytes(2))
    t6, u6, v6 = _media_stats_row(_mixed_bytes(6))
    assert r0["media_type"] == t2 == "wav" and t6 == "wav"
    assert r0["n_units"] == u2 + u6
    assert r0["sum_val"] == v2 + v6
    assert (r0["n_records"], r0["n_responses"]) == (3, 2)
    r1 = out.iloc[1]
    assert r1["media_type"] is None and r1["n_responses"] == 0 \
        and r1["n_records"] == 1 and r1["n_units"] == 0
    assert out.iloc[2].isna().all()


def test_mixed_payload_udf_is_factored_algebra():
    """synth_mixed_payload (m34) must emit exactly _mixed_media_bytes —
    the refactor that let the WARC capture share the algebra must not
    have drifted the bare column."""
    import pandas as pd

    from ecmm428_pycart_spark.datapipe.multimodal import (
        synth_mixed_payload)

    out = synth_mixed_payload.func(pd.Series([0, 1, 2, 3, 5, 11]))
    for i, buf in zip([0, 1, 2, 3, 5, 11], out):
        assert bytes(buf) == _mixed_bytes(i)


# ---------------------------------------------------------------------------
# g41: pure-Python replay of the exact-integer host PageRank
# ---------------------------------------------------------------------------

def _expected_host_pagerank(token_counts: dict[int, int]):
    """First-principles replay of g41's closed form + integer loop:
    doc i on host h{i % 13} links to h{(i*7 + p) % 13} at paragraph
    ids p with p % 4 == 1 and p < np - 1, np = ceil(nt / 10); ranks
    iterate 3 rounds of r' = 15e12 // (100 n) + 85 * c // 100 with
    per-edge floor shares c = sum((r_src * w) // ow_src)."""
    from collections import Counter

    edges = Counter()
    for i, nt in token_counts.items():
        np_ = (nt + 9) // 10
        for p in range(np_):
            if p % 4 == 1 and p < np_ - 1:
                edges[(f"h{i % 13}", f"h{(i * 7 + p) % 13}")] += 1
    ow = Counter()
    inw = Counter()
    for (s, t), w in edges.items():
        ow[s] += w
        inw[t] += w
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    scale = 10 ** 12
    r = {h: scale // n for h in nodes}
    for _ in range(3):
        c = Counter()
        for (s, t), w in edges.items():
            c[t] += (r[s] * w) // ow[s]
        r = {h: 15 * scale // (100 * n) + 85 * c[h] // 100
             for h in nodes}
    return {h: (r[h], inw[h], ow[h]) for h in nodes}


def test_g41_host_pagerank_matches_python_replay(spark, tmp_path):
    """Third-engine check: a hand fixture with token counts straddling
    the link threshold (nt >= 21 mints links; below doesn't), Spark's
    full chain (real href extraction -> edge agg -> integer loop) vs
    the pure-Python replay above."""
    from ecmm428_pycart_spark.benchmarks.queued8 import g41_host_pagerank

    token_counts = {i: 5 + 7 * i for i in range(40)}   # 5..278 tokens
    rows = [Row(doc_id=i, text=" ".join(f"w{j}" for j in range(nt)),
                lang="en", source=f"src{i % 3}", n_chars=0)
            for i, nt in token_counts.items()]
    d = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows).write.parquet(d)
    got = {r["host"]: (r["rank_e12"], r["in_links"], r["out_links"])
           for r in g41_host_pagerank(spark, str(tmp_path)).collect()}
    exp = _expected_host_pagerank(token_counts)
    assert got == exp
    # the fixture must actually exercise rank transfer: multiple hosts,
    # non-uniform ranks
    assert len(exp) >= 10
    assert len({v[0] for v in exp.values()}) > 1


def test_g41_rank_mass_conservation_bound():
    """Exact-integer PageRank sanity on the replay itself: total rank
    stays within n floor-losses of the ideal 1e12 mass each round
    (floor division only ever loses mass, never invents it)."""
    token_counts = {i: 30 + 11 * i for i in range(26)}
    exp = _expected_host_pagerank(token_counts)
    total = sum(v[0] for v in exp.values())
    n = len(exp)
    scale = 10 ** 12
    assert total <= scale
    # every host keeps at least the damping floor
    assert all(v[0] >= 15 * scale // (100 * n) for v in exp.values())
