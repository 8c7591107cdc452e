"""CSV sources (reference main.py:89-93,125-137; docs/quick.md:44-48 — S3-S5).

All readers attach ``file_order`` (a per-file monotonic row id) because the
reference exploits CSV row order for its running-fill scan (main.py:264-271)
and Spark provides no implicit row order. For a SINGLE input file
``monotonically_increasing_id`` is monotone in file order: splits of one
file are enumerated in offset order, partition index follows split order,
and the id is monotone in (partition, position). For MULTI-file input Spark
packs splits sorted by size, so that guarantee breaks — ``read_csv``
therefore enforces the single-file restriction with an explicit check
rather than silently corrupting downstream running-fill (R21) results.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecmm428_pycart_spark.operators.relational import to_int_col


def _assert_single_file(path: str) -> None:
    """file_order is only well-defined for one input file (see module doc).

    Only local paths are validated: on a remote filesystem (hdfs://,
    s3a://, ...) the driver-local glob below would match nothing and
    reject a perfectly valid single file, so non-local schemes pass
    through — the guarantee then rests on the caller, as documented."""
    scheme, _, rest = path.partition("://")
    if rest and scheme not in ("file", "local"):
        return
    p = path[len("file:"):] if path.startswith("file:") else path
    if any(ch in p for ch in "*?["):
        matches = _glob.glob(p)
    elif os.path.isdir(p):
        matches = [f for f in _glob.glob(os.path.join(p, "*"))
                   if not os.path.basename(f).startswith(("_", "."))]
    else:
        matches = [p]
    if len(matches) != 1:
        raise ValueError(
            f"read_csv(with_order=True) requires exactly one input file for "
            f"a well-defined file_order; {path!r} matches {len(matches)} — "
            f"read files separately and union, or pass with_order=False")


def read_csv(spark: SparkSession, path: str, with_order: bool = True) -> DataFrame:
    if with_order:
        _assert_single_file(path)
    df = (spark.read.option("header", "true").csv(path))
    if with_order:
        df = df.withColumn("file_order", F.monotonically_increasing_id())
    return df


def read_pop_csv(spark: SparkSession, path: str,
                 pop_col: str = "Population") -> DataFrame:
    """Population CSV: thousands-separated strings → long (main.py:89-93)."""
    df = read_csv(spark, path)
    return df.withColumn(pop_col, to_int_col(F.col(pop_col)))


def read_world_pop_wide(spark: SparkSession, path: str,
                        year: str = "2021") -> DataFrame:
    """World-bank wide CSV → (Country, ISO, Population) (main.py:125-137).

    Catalyst prunes the other ~60 year columns out of the scan.
    """
    df = spark.read.option("header", "true").csv(path)
    return df.select(
        F.col("Country Name").cast("string").alias("Country"),
        F.col("Country Code").cast("string").alias("ISO"),
        F.col(year).cast("double").alias("Population"),
    )


def read_wkt_csv(spark: SparkSession, path: str,
                 geometry_col: str = "geometry") -> DataFrame:
    """CSV with a WKT geometry column → WKB binary (docs/quick.md:44-48)."""
    from ecmm428_pycart_spark.geometry.udfs import st_wkt_to_wkb
    df = read_csv(spark, path)
    return df.withColumn(geometry_col, st_wkt_to_wkb(F.col(geometry_col)))
