"""Table sinks (S6 — reference main.py:253 `to_csv`).

Geometry columns (WKB binary) are serialized to WKT for CSV (text format);
parquet keeps them binary. `coalesce(1)` is available for small exports;
at scale, leave partitioning alone and let the writer emit one file per
partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ecmm428_pycart_spark.geometry.udfs import st_wkb_to_wkt


def write_csv(df: DataFrame, path: str, single_file: bool = False,
              mode: str = "overwrite") -> None:
    out = df
    for field in df.schema.fields:
        if isinstance(field.dataType, T.BinaryType):
            out = out.withColumn(field.name, st_wkb_to_wkt(out[field.name]))
    if single_file:
        out = out.coalesce(1)
    out.write.mode(mode).option("header", "true").csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
    """ORC sink (columnar alternative when the downstream stack is
    Hive/Trino-flavoured); same partition-pruning story as parquet —
    hive-style key=value directories prune at the source level."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row",
              mode: str = "overwrite") -> None:
    """XML sink (Spark 4 native spark-xml): one element per row under
    ``row_tag``. Interchange format for legacy feeds (PubMed,
    Wikipedia dumps, SEC filings) — the read side is where XML
    matters for a corpus pipeline; the writer closes the roundtrip so
    the format is oracle-checkable."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def read_xml(spark, path: str, row_tag: str = "row",
             schema=None) -> DataFrame:
    """XML source. Pass an explicit ``schema`` in production — without
    one Spark runs a full inference scan first (double read), and
    sampled inference on a 100 TB dump can mistype rare fields. Ad-hoc
    exploration can omit it."""
    # spark-xml strips surrounding whitespace by default, silently
    # corrupting whitespace-significant text payloads — disable it so
    # the write/read roundtrip is actually lossless
    r = (spark.read.format("xml").option("rowTag", row_tag)
         .option("ignoreSurroundingSpaces", "false"))
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)
