"""Snapshot versioning / time travel on plain parquet.

The last piece of the lakehouse quintet (z-order layout, manifest
skipping, compaction, MERGE, bucketing — see ``zorder.py`` and
``benchmarks/relational.py`` q59-q62): every write lands in an
immutable ``v<N>`` directory and a tiny driver-side manifest records
the version list, so readers can ask for *any* historical version (or
the latest) and writers never mutate published data — exactly the
snapshot-isolation contract Iceberg/Delta implement with their
metadata trees, scaled down to a JSON pointer file. Concurrency note:
single-writer by design (the manifest update is last, so readers see
either the old or the new version list, never a torn one); multi-writer
needs the table format's atomic swap, out of scope here.

Exercised end-to-end by ``q65_time_travel``: v1 = base table, v2 = the
MERGE result, and the gate reads BOTH versions back and checks their
aggregates against the oracle's restatement — proving published
versions stay immutable through subsequent writes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_versions.json"


def _read_manifest(base: str) -> list[int]:
    path = os.path.join(base, MANIFEST)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)["versions"]


def write_snapshot(df: DataFrame, base: str) -> int:
    """Publish ``df`` as the next immutable version under ``base``.
    Returns the new version number. The data write completes before the
    manifest is updated, so a concurrent reader never sees a version
    that is not fully on disk."""
    os.makedirs(base, exist_ok=True)
    versions = _read_manifest(base)
    v = (versions[-1] + 1) if versions else 1
    df.write.mode("errorifexists").parquet(os.path.join(base, f"v{v}"))
    # atomic publish: write-temp + rename so a concurrent reader sees the
    # old or the new manifest, never a truncated one (os.replace is atomic
    # within a POSIX filesystem; object stores need the table format's swap)
    tmp = os.path.join(base, f".{MANIFEST}.tmp.{v}")
    with open(tmp, "w") as f:
        json.dump({"versions": versions + [v]}, f)
    os.replace(tmp, os.path.join(base, MANIFEST))
    return v


def read_snapshot(spark: SparkSession, base: str,
                  version: int | None = None) -> DataFrame:
    """Read a specific published version (time travel) or the latest."""
    versions = _read_manifest(base)
    if not versions:
        raise ValueError(f"no snapshots published under {base}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    return spark.read.parquet(os.path.join(base, f"v{v}"))
