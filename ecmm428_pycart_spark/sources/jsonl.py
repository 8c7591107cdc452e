"""JSONL (newline-delimited JSON) source/sink — the interchange format
LLM document corpora ship in (one JSON object per line; splittable, so
a 100 TB corpus parallelizes by line ranges).

Schema is REQUIRED on read: Spark's JSON schema inference runs a full
extra pass over the data, which is fine at test scale and a disaster at
100 TB. Callers pass a DDL string or StructType; `DOCUMENT_SCHEMA`
matches the testdata `documents` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCUMENT_SCHEMA = ("doc_id long, text string, lang string, "
                   "source string, n_chars long")


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Line-delimited JSON with an explicit schema (no inference pass).
    Corrupt lines land in `_corrupt_record` when the schema declares it;
    otherwise they become null rows (PERMISSIVE, Spark default) — pass
    mode options upstream via `.option` if a strict read is needed."""
    if not schema:
        raise ValueError(
            "read_jsonl requires an explicit schema — JSON inference "
            "double-scans the corpus (unacceptable at scale)")
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One JSON object per line, one file per partition (binary columns
    are base64-encoded by Spark's JSON writer)."""
    df.write.mode(mode).json(path)
