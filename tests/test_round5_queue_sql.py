"""docs/ROUND5_QUEUE.md carries pre-validated DuckDB SQL blocks that
round 5 will register VERBATIM as oracles (d37/d38/d39/d41/s15). A
library change that drifts any of those semantics would otherwise go
unnoticed until the driver gate fails a round later — so this test
parses the SQL out of the doc and replays the gate compare against the
live implementations on every pytest run."""

from __future__ import annotations

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# the scale the doc's claims cite; overridable like the sibling file
SF_DIR = os.environ.get("SPARK_GRAFT_QUEUE_SQL_SF",
                        "/root/testdata/sf0.01")


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


def _cmp(df, rel):
    # the gate canonicalization, shared with the queued-oracle tests
    # (column-sorted, row-sorted, None-safe, 9-digit floats)
    from tests.test_queued_queries import _canon
    sp_cols, du_cols = df.columns, list(rel.columns)
    assert sorted(sp_cols) == sorted(du_cols), (sp_cols, du_cols)
    sp = _canon([tuple(r) for r in df.collect()], sp_cols)
    du = _canon(rel.fetchall(), du_cols)
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
