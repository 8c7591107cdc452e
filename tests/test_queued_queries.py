"""Hard-signal pre-validation for the round-5 registration queue
(benchmarks/queued.py): every queued query runs on Spark AND its DuckDB
oracle at sf0.001 with the driver-gate canonicalization (column-sorted,
row-sorted, 9-digit float normalization) — the same compare
tools/verify_oracle.py replicates. A queued entry that fails here would
fail the driver gate the round it registers, so this keeps the queue
honest before it ever reaches the window.
"""

from __future__ import annotations

import math
import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).hex()
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


@pytest.fixture(scope="module")
def duck():
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{path}')")
    yield con
    con.close()


def _queued_names():
    from ecmm428_pycart_spark.benchmarks import queued
    return sorted(queued.QUERIES)


@pytest.mark.parametrize("name", _queued_names())
def test_queued_query_matches_oracle(spark, duck, name):
    from ecmm428_pycart_spark.benchmarks import queued
    df = queued.QUERIES[name](spark, SF_DIR)
    sql = queued.ORACLES[name]
    assert sql is not None, f"{name} queued without an oracle"
    sp_cols = df.columns
    sp_rows = [tuple(r) for r in df.collect()]
    rel = duck.sql(sql)
    du_cols = list(rel.columns)
    du_rows = rel.fetchall()
    assert sorted(sp_cols) == sorted(du_cols)
    assert len(sp_rows) == len(du_rows), \
        f"{name}: spark {len(sp_rows)} rows vs oracle {len(du_rows)}"
    assert len(sp_rows) > 0, f"{name}: empty result proves nothing"
    assert _canon(sp_rows, sp_cols) == _canon(du_rows, du_cols)


def test_queue_is_fully_registered():
    """Since round 5 the queue IS registered (it forms the round-6
    deferred backlog): every queued.py entry must appear in the
    registry, or it would silently fall outside the 2-round gate
    rotation that tests/test_gate_coverage.py pins. (Rounds <5 asserted
    the inverse — the queue stayed OUT until the window had budget.)"""
    from ecmm428_pycart_spark.benchmarks import queued
    from ecmm428_pycart_spark.benchmarks.registry import get_queries
    missing = set(queued.QUERIES) - set(get_queries())
    assert not missing, f"queued queries not registered: {missing}"


# queued queries with a legitimate O(1)-row identity-broadcast build
# side (same contract as test_plan_shapes._BNLJ_OK; fold these into
# that allowlist when the queue registers)
_QUEUED_BNLJ_OK = {
    "q86_important_stock",      # 1-row mean-value threshold
    "d43_perplexity_buckets",   # 1-row percentile cut pair
    "g18_clustering_coeff",     # 1-row grid side length (_customer_grid,
                                # same build side as g11/g12/g13)
    "s20_hard_negatives",       # broadcast 20-row anchor batch (same
                                # contract as s09_knn_join)
    "d45_temperature_mix",      # 1-row pow-sum total broadcast into the
                                # per-source rate computation
    "d42_bpe_encode",           # three 1-row aggregates (totals +
                                # fingerprint) zipped into one row
    "q91_rfm_segments",         # 1-row max-ts anchor broadcast
    "q95_curation_pipeline",    # inherits d43's percentile-cut and
                                # d45's pow-sum 1-row broadcasts
    "d48_lm_reference_scoring",  # 1-row ref-corpus token total (the
                                 # d31/d14 IDF-denominator pattern)
    "s22_embedding_normalize",   # 1-row per-dimension stats arrays
                                 # (see test_plan_shapes._BNLJ_OK)
}


@pytest.mark.slow
def test_queued_plan_guards(spark):
    """Queued queries meet the same physical-plan bar as registered
    ones BEFORE they reach the gate: no CartesianProduct, no
    row-at-a-time Python (BatchEvalPython), BNLJ only on the
    documented 1-row build sides."""
    from ecmm428_pycart_spark.benchmarks import queued
    offenders = {}
    for name, fn in sorted(queued.QUERIES.items()):
        plan = fn(spark, SF_DIR)._jdf.queryExecution() \
            .executedPlan().toString()
        bad = [p for p in ("CartesianProduct", "BatchEvalPython")
               if p in plan]
        if ("BroadcastNestedLoopJoin" in plan
                and name not in _QUEUED_BNLJ_OK):
            bad.append("BroadcastNestedLoopJoin")
        if bad:
            offenders[name] = bad
    assert not offenders, f"scale anti-patterns found: {offenders}"


def test_queued_tpch_plan_properties(spark):
    """The specific physical properties the new TPC-H shapes claim in
    their docstrings, asserted from the executed plan: q87's month
    filter reaches the lineitem scan, q84/q85 broadcast every
    dimension (no fact-fact SortMergeJoin except q85's single orders
    join), q89's EXISTS chain compiles to a LEFT SEMI join."""
    from ecmm428_pycart_spark.benchmarks import queued

    def plan(name):
        return (queued.QUERIES[name](spark, SF_DIR)
                ._jdf.queryExecution().executedPlan().toString())

    p87 = plan("q87_promo_revenue")
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in p87
    assert "BroadcastHashJoin" in p87

    p84 = plan("q84_min_cost_supplier")
    # exactly ONE non-broadcast join: offers x per-part best (two
    # aggregates of the fact — neither side is broadcastable at
    # scale); every dimension is a BroadcastHashJoin
    assert p84.count("SortMergeJoin") == 1
    assert "TakeOrderedAndProject" in p84    # ORDER BY+LIMIT w/o global sort

    p85 = plan("q85_product_profit")
    # exactly one fact-fact join (orders for the year); everything else
    # broadcast
    assert p85.count("SortMergeJoin") <= 1
    assert "BroadcastHashJoin" in p85

    p89 = plan("q89_part_promotion")
    assert "LeftSemi" in p89


def test_q97_bloom_filter_injected(spark):
    """Under q97's pinned configs (shared BLOOM_CONFS + the
    pinned_confs contextmanager), the optimizer must inject the
    runtime Bloom filter; q97 itself also self-checks and raises if
    injection regresses, so the gate run doubles as this guard."""
    from pyspark.sql import functions as F

    from ecmm428_pycart_spark.benchmarks.queued import BLOOM_CONFS
    from ecmm428_pycart_spark.session import load_table, pinned_confs

    with pinned_confs(spark, BLOOM_CONFS):
        urgent = (load_table(spark, SF_DIR, "orders")
                  .filter(F.col("o_orderpriority") == "1-URGENT")
                  .select("o_orderkey"))
        li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
        j = li.join(urgent, F.col("o_orderkey") == F.col("l_orderkey"))
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan or "BloomFilter" in plan, plan
        assert "might_contain" in plan, plan
