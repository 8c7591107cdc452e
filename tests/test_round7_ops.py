"""Hand-case tests for the round-7 library additions: the WARC->HTML
ingestion UDFs behind q133_crawl_pipeline — edge shapes the macro's
2-record archives never exercise (multi-response concatenation,
request-only archives, null payloads, malformed framing)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F


def test_warc_html_payload_roundtrip_identity(spark):
    """decode(synth(id, t)) recovers t exactly (the closed-form
    identity q133's oracle rests on), skips the request decoy, and
    counts records/responses correctly."""
    from ecmm428_pycart_spark.datapipe import multimodal

    text = " ".join(f"t{i}" for i in range(53))  # 6 paragraphs, 1 link
    df = (spark.createDataFrame([Row(doc_id=7, text=text)])
          .withColumn("payload", multimodal.synth_warc_html_payload(
              F.col("doc_id"), F.col("text")))
          .withColumn("x", multimodal.warc_html_extract("payload")))
    r = df.select("x.*").head()
    assert r["ext_text"] == text
    assert r["n_records"] == 2 and r["n_responses"] == 1
    assert (r["n_links"], r["link_tokens"]) == (1, 2)


def test_warc_html_extract_edge_shapes(spark):
    """Multi-response concatenation (space-joined, in record order),
    request-only archives (empty text, 0 responses), and null
    payloads (all-null struct)."""
    from ecmm428_pycart_spark.datapipe.multimodal import (warc_bytes,
                                                          warc_html_extract)

    multi = warc_bytes([
        ("response", "http://a.example/1", b"<p>alpha beta</p>"),
        ("request", "http://a.example/2", b"GET /2"),
        ("response", "http://a.example/2", b"<p>gamma</p>"),
    ])
    req_only = warc_bytes([("request", "http://a.example/3", b"GET /3")])
    df = spark.createDataFrame(
        [Row(i=0, payload=bytearray(multi)),
         Row(i=1, payload=bytearray(req_only)),
         Row(i=2, payload=None)])
    rows = {r["i"]: r for r in
            df.withColumn("x", warc_html_extract("payload"))
            .select("i", "x.*").collect()}
    assert rows[0]["ext_text"] == "alpha beta gamma"
    assert rows[0]["n_records"] == 3 and rows[0]["n_responses"] == 2
    assert rows[1]["ext_text"] == "" and rows[1]["n_responses"] == 0
    assert rows[1]["n_records"] == 1
    assert all(rows[2][c] is None for c in
               ("ext_text", "n_links", "link_tokens", "n_records",
                "n_responses"))


def test_warc_html_extract_malformed_raises(spark):
    """A payload that is not WARC-framed must fail loudly (the repo's
    honest-decoder contract), not silently yield empty text."""
    from ecmm428_pycart_spark.datapipe.multimodal import warc_html_extract
    from pyspark.errors import PythonException

    df = spark.createDataFrame([Row(payload=bytearray(b"not a warc"))])
    with pytest.raises(PythonException, match="WARC"):
        df.withColumn("x", warc_html_extract("payload")).collect()
