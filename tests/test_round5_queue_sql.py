"""docs/ROUND5_QUEUE.md carries pre-validated DuckDB SQL blocks that
round 5 will register VERBATIM as oracles (d37/d38/d39/d41/s15). A
library change that drifts any of those semantics would otherwise go
unnoticed until the driver gate fails a round later — so this test
parses the SQL out of the doc and replays the gate compare against the
live implementations on every pytest run."""

from __future__ import annotations

import math
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"   # the scale the doc's claims cite


def _doc_sql(name: str) -> str:
    text = open(os.path.join(REPO, "docs/ROUND5_QUEUE.md")).read()
    m = re.search(rf"## {name} oracle SQL.*?```sql\n(.*?)```", text, re.S)
    assert m, f"no SQL block for {name} in ROUND5_QUEUE.md"
    return m.group(1)


@pytest.fixture(scope="module")
def duck():
    import duckdb
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(round(v, 9))
    return v


def _cmp(df, rel):
    sp = sorted(tuple(_norm(x) for x in r) for r in
                (tuple(r) for r in df.collect()))
    du = sorted(tuple(_norm(x) for x in r) for r in rel.fetchall())
    assert list(df.columns) == list(rel.columns) or \
        sorted(df.columns) == sorted(rel.columns)
    assert sp == du, (sp[:3], du[:3])


def test_d37_bigram_lm_sql_still_matches(spark, duck):
    from ecmm428_pycart_spark.datapipe.text import bigram_lm_score
    from ecmm428_pycart_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    _cmp(bigram_lm_score(docs), duck.sql(_doc_sql("d37")))


def test_d38_bm25_sql_still_matches(spark, duck):
    from ecmm428_pycart_spark.datapipe.text import bm25_topk
    from ecmm428_pycart_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    _cmp(bm25_topk(docs, "table scan join", k=20),
         duck.sql(_doc_sql("d38")))


def test_d39_heavy_hitters_sql_still_matches(spark, duck):
    from ecmm428_pycart_spark.datapipe.text import heavy_hitter_tokens
    from ecmm428_pycart_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    _cmp(heavy_hitter_tokens(docs, support=0.01),
         duck.sql(_doc_sql("d39")))


def test_d41_hashing_tf_sql_still_matches(spark, duck):
    from pyspark.sql import functions as F

    from ecmm428_pycart_spark.datapipe.text import hashing_tf
    from ecmm428_pycart_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    vecs = hashing_tf(docs, dim=64)
    stats = vecs.select(
        "doc_id",
        F.size(F.filter("embedding", lambda x: x != 0.0))
        .alias("nnz"),
        F.round(F.aggregate("embedding", F.lit(0.0),
                            lambda a, x: a + x), 4).alias("total"),
        F.round(F.sqrt(F.aggregate("embedding", F.lit(0.0),
                                   lambda a, x: a + x * x)), 4)
        .alias("l2"))
    _cmp(stats, duck.sql(_doc_sql("d41")))


def test_s15_truncated_rerank_sql_still_matches(spark, duck):
    from ecmm428_pycart_spark.datapipe.similarity import (
        query_vector, truncated_rerank_topk)
    from ecmm428_pycart_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    out = truncated_rerank_topk(emb, query_vector(emb, 0), k=10,
                                coarse_dims=8, shortlist=100)
    _cmp(out.select("vec_id", "cos"), duck.sql(_doc_sql("s15")))
