"""SparkSession factory tuned for the test harness (local[N]) while keeping
settings that scale to a real cluster (AQE, adaptive shuffle sizing)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ecmm428_pycart_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Local mode is a single JVM; on a real cluster the same settings apply
    per-executor. AQE is on so shuffle partition counts re-plan at runtime
    (the 100 TB path relies on AQE coalescing + skew-join handling).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-generated parquet table (TESTDATA.md).

    The generator's timestamp physical type has varied across rounds:
    INT64 TIMESTAMP(NANOS) (round 2) and TIMESTAMP(MICROS) without the
    isAdjustedToUTC flag (round 3), which Spark 4 reads as TIMESTAMP_NTZ.
    Normalize both to plain TimestampType: the session timezone is pinned
    to UTC, so NTZ->LTZ reinterprets the same wall-clock as the same
    instant, matching DuckDB's naive-timestamp view of the same file.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    from pyspark.sql import functions as F
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
        elif name == "events" and col == "ts" and dtype == "bigint":
            df = df.withColumn(col, F.expr("timestamp_micros(ts DIV 1000)"))
    return df


TESTDATA_TABLES = ["region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents", "embeddings"]


def register_views(spark: SparkSession, sf_dir: str,
                   tables: list[str] | None = None) -> None:
    """Register the testdata tables as temp views so the whole engine
    surface is reachable from ``spark.sql`` as well as the DataFrame API
    (Catalyst produces the same plans either way)."""
    for name in tables or TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


import contextlib


@contextlib.contextmanager
def pinned_confs(spark, confs: dict):
    """Set session confs for a scope and restore them exactly
    (re-unsetting keys that had no explicit value) — the
    save/set/try/finally dance pinned-strategy queries and tests
    otherwise hand-roll. The subtlety this centralizes:
    ``spark.conf.get(k, None)`` returns the DEFAULT for known keys,
    so restoring must distinguish "was explicitly set" from "was
    default" via the unset path only when get returned None."""
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
