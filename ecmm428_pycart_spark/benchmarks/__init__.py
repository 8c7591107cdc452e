"""Workload registry: every operator from SURVEY.md §2 exposed as a named
query with (Spark callable, DuckDB oracle SQL) pairs, plus the
beyond-reference data-pipeline operators (dedup / similarity / text /
multimodal) and the geo macro-operators on a synthetic planar grid.

The driver contract (/root/repo/__spark_entry__.py) runs each Spark
callable and its oracle SQL side-by-side and hash-compares results.
"""

from ecmm428_pycart_spark.benchmarks.registry import QUERIES, get_queries, get_oracle_sql

__all__ = ["QUERIES", "get_queries", "get_oracle_sql"]
