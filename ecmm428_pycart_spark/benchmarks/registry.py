"""Assembles the full named-query registry from the per-area modules."""

from __future__ import annotations

from ecmm428_pycart_spark.benchmarks import relational


def _collect():
    queries = {}
    oracles = {}
    for mod in _modules():
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles


def _modules():
    # hard imports: a failure here must propagate — silently dropping a
    # module would remove entire query families from the correctness gate
    from ecmm428_pycart_spark.benchmarks import datapipe_queries, geo_queries
    return [relational, datapipe_queries, geo_queries]


def get_queries():
    return _collect()[0]


def get_oracle_sql():
    q, o = _collect()
    # only emit oracle SQL for registered queries
    return {k: v for k, v in o.items() if k in q and v is not None}


QUERIES = get_queries()
