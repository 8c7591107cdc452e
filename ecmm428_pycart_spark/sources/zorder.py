"""Z-order layout + min/max manifest data skipping on plain parquet.

The single biggest lever for a 100 TB scan-heavy table is not reading
most of it. Partition pruning handles ONE coarse key; multi-column
predicate boxes need a space-filling-curve layout so that every file
covers a small rectangle of the (col1, col2) value space, plus
file-level min/max stats to decide — before any scan — which files can
possibly match. That is exactly what Delta/Iceberg data skipping does
with their manifests; this module is the same pattern self-contained on
plain parquet:

- ``zorder_write``: bucketize two columns to 16 bits each (equi-width
  over the observed min/max, which stays IN-PLAN as a broadcast 1-row
  aggregate), interleave the bits into a 32-bit Morton code with four
  mask-shift rounds (all native integer expressions, codegen-friendly),
  ``repartitionByRange`` on the code so each output file owns a
  contiguous z-range ≈ a small value-space rectangle, write parquet.
- ``build_manifest``: one pass over the written files grouping by
  ``input_file_name`` → per-file min/max of the skip columns, persisted
  as a tiny parquet next to the data (``_manifest`` — the same idea as
  an Iceberg manifest file, thousands of rows for a 100 TB table).
- ``read_skipping``: plan-time overlap filter on the manifest; only
  file paths whose [min,max] box intersects the predicate box are
  handed to the parquet reader. The manifest materialization is
  metadata-scale (one row per FILE, not per row-group or row) — the
  same driver-side step every lakehouse table format performs during
  query planning.

Reference parity note: the reference engine (ARundle01/ecmm428-pycart)
reads whole CSV/GeoJSON files (pycart/main.py ingest paths) and has no
layout layer at all; this module is beyond-reference scale
infrastructure, exercised end-to-end by ``q59_zorder_skipping``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

MANIFEST_DIR = "_manifest"


def _spread16(c: Column) -> Column:
    """Interleave-ready bit spread: 16-bit int -> 32-bit with a zero
    between consecutive bits (Morton encoding's standard mask-shift
    ladder, native integer ops only)."""
    c = c.cast("long")
    c = c.bitwiseOR(F.shiftleft(c, 8)).bitwiseAND(F.lit(0x00FF00FF))
    c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x33333333))
    c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x55555555))
    return c


def zvalue(x: Column, y: Column) -> Column:
    """Morton code of two 16-bit bucket ids (x gets the even bits)."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1))


def _bucket16(c: Column, mn: Column, mx: Column) -> Column:
    """Equi-width 16-bit bucket over [mn, mx]; degenerate range -> 0."""
    span = (mx - mn).cast("double")
    b = F.when(span <= 0.0, F.lit(0)).otherwise(
        F.floor(((c - mn).cast("double") / span) * 65535.0))
    return F.least(F.greatest(b, F.lit(0)), F.lit(65535)).cast("int")


def zorder_write(df: DataFrame, path: str, col1: str, col2: str,
                 n_files: int = 32) -> None:
    """Write ``df`` as ``n_files`` parquet files z-ordered on
    (col1, col2). Both columns must be numeric (cast dates/timestamps
    to day numbers first). The min/max needed for bucketizing stays
    in-plan as a broadcast 1-row aggregate — no driver round trip —
    and the only shuffle is the range partitioning that IS the layout."""
    bounds = df.agg(F.min(col1).alias("_mn1"), F.max(col1).alias("_mx1"),
                    F.min(col2).alias("_mn2"), F.max(col2).alias("_mx2"))
    z = zvalue(_bucket16(F.col(col1), F.col("_mn1"), F.col("_mx1")),
               _bucket16(F.col(col2), F.col("_mn2"), F.col("_mx2")))
    (df.crossJoin(F.broadcast(bounds))
       .withColumn("_z", z)
       .repartitionByRange(n_files, "_z")
       .drop("_z", "_mn1", "_mx1", "_mn2", "_mx2")
       .write.mode("overwrite").parquet(path))


def build_manifest(spark: SparkSession, path: str,
                   skip_cols: list[str]) -> None:
    """One scan over the written files -> per-file min/max of each skip
    column, persisted as ``<path>/_manifest`` (read back by
    ``read_skipping``). Output size = one row per data file."""
    df = spark.read.parquet(path)
    aggs = []
    for c in skip_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    (df.groupBy(F.input_file_name().alias("file")).agg(*aggs)
       .coalesce(1)
       .write.mode("overwrite").parquet(f"{path}/{MANIFEST_DIR}"))


def read_skipping(spark: SparkSession, path: str,
                  predicates: dict[str, tuple]) -> tuple[DataFrame, int, int]:
    """Plan a read of ``path`` touching only files whose min/max box
    intersects the predicate box. ``predicates`` maps column ->
    (lo, hi) inclusive bounds (None = unbounded side). Returns
    (dataframe, n_files_selected, n_files_total); the returned frame
    still carries the row-level predicate — skipping is an optimization,
    never a semantic filter. The manifest collect is metadata-scale
    (file paths only), identical in role to a lakehouse format's
    planning-time manifest read."""
    man = spark.read.parquet(f"{path}/{MANIFEST_DIR}")
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            cond = cond & (F.col(f"max_{c}") >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(f"min_{c}") <= F.lit(hi))
    rows = man.select("file", cond.alias("keep")).collect()
    total = len(rows)
    files = [r["file"] for r in rows if r["keep"]]
    if not files:
        df = spark.read.parquet(path).limit(0)
    else:
        df = spark.read.parquet(*files)
    row_cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            row_cond = row_cond & (F.col(c) >= F.lit(lo))
        if hi is not None:
            row_cond = row_cond & (F.col(c) <= F.lit(hi))
    return df.filter(row_cond), len(files), total


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_file_bytes: int = 128 * 1024 * 1024) -> tuple[int, int]:
    """Small-file compaction (the table-maintenance job every streaming
    ingest needs): bin the source's files into ~target_file_bytes
    outputs with coalesce — a NARROW dependency, so compaction reads
    and rewrites without any shuffle. Returns (n_files_in, n_files_out).

    Scope: ``src`` must be a LOCAL, flat directory of parquet files —
    sizing uses os-level listing (metadata-scale, same as the planner's
    own split computation). On HDFS/S3 or nested layouts, list via the
    Hadoop FileSystem API instead; rather than silently compacting to a
    single file when the glob sees nothing, this raises."""
    import glob as _glob
    import os as _os

    files = [f for f in _glob.glob(_os.path.join(src, "*.parquet"))
             if not _os.path.basename(f).startswith(("_", "."))]
    if not files:
        raise FileNotFoundError(
            f"compact_parquet: no *.parquet files directly under {src!r} — "
            "non-local or nested layouts are out of scope (use the Hadoop "
            "FileSystem API to list them)")
    total = sum(_os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_file_bytes))   # ceil
    (spark.read.parquet(src)
     .coalesce(int(n_out))
     .write.mode("overwrite").parquet(dst))
    return len(files), int(n_out)
