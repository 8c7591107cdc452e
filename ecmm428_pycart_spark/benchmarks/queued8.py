"""Round-8 registration queue — overflow of benchmarks/queued7.py,
which is hard-capped at 48 entries (round 7 defers it whole into
round 8's 50-slot gate window next to the two rotation sentinels).
Entries here follow the identical contract — oracle beside the
query, the tests/test_queued8_queries.py gate replica, scalar
outputs, plan guards — and register in round 8 by the same
mechanical recipe (collect module, defer to round 9). queued7 holds
3 deliberately-spare slots for round-6/7 discoveries; prefer those
first for anything urgent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ecmm428_pycart_spark.session import load_table as _t

QUERIES = {}
ORACLES = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        ORACLES[name] = sql
        return fn
    return deco
