"""Custom PYTHON data source (Spark 4 DataSource API) — the engine's
extension point for sources Spark has no built-in reader for (internal
feed formats, synthetic generators, exotic APIs) without writing JVM
code.

`RangeDocsDataSource` is a deterministic partitioned generator:
``n_rows`` rows split over ``n_parts`` input partitions (each
partition is an independent task — the source parallelizes like any
file scan), row i carrying (id, grp, value) with closed-form values so
readers are oracle-checkable. It also implements ``pushFilters``
(Spark 4.1): an EqualTo filter on ``grp`` PRUNES ENTIRE PARTITIONS
before any task launches — demonstrating that predicate pushdown
reaches even Python sources; at 100 TB this is the difference between
scanning one shard and scanning them all.

grp is partition-aligned by construction (partition p generates only
grp = 'g{p % 4}'), which is what makes the EqualTo prune sound.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
)
from pyspark.sql.types import StructType


class _RangePartition(InputPartition):
    def __init__(self, part_id: int, start: int, end: int):
        self.part_id = part_id
        self.start = start
        self.end = end


class RangeDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_parts", 8))
        # ALL pushed grp equalities (the filter list is a conjunction:
        # claiming one and keeping only the last would return g2 rows
        # for grp=='g1' AND grp=='g2' — review finding r4b)
        self.grp_filters: set = set()

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("grp",):
                self.grp_filters.add(f.value)  # fully handled here
            else:
                yield f                        # let Spark re-apply it

    def partitions(self):
        if len(self.grp_filters) > 1:
            return []        # conjunction of different equalities: empty
        want = next(iter(self.grp_filters)) if self.grp_filters else None
        per = (self.n_rows + self.n_parts - 1) // self.n_parts
        parts = []
        for p in range(self.n_parts):
            if want is not None and f"g{p % 4}" != want:
                continue                      # partition pruned
            start = p * per
            end = min(start + per, self.n_rows)
            if start < end:
                parts.append(_RangePartition(p, start, end))
        return parts

    def read(self, partition):
        if partition is None:
            # Spark substitutes [None] when partitions() returns [] —
            # an all-pruned (or empty-source) scan must yield no rows,
            # not crash (review finding r4b)
            return
        grp = f"g{partition.part_id % 4}"
        for i in range(partition.start, partition.end):
            yield (i, grp, float((i * 37) % 1000) / 10.0)


class RangeDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "range_docs"

    def schema(self) -> str:
        return "id bigint, grp string, value double"

    def reader(self, schema: StructType) -> DataSourceReader:
        return RangeDocsReader(self.options)


# ---------------------------------------------------------------------------
# Python STREAMING data source (Spark 4): the same extension point for
# Structured Streaming — a pure-Python micro-batch source with
# offset-tracked, replayable reads. `RangeStreamDataSource` emits the
# deterministic (id, grp, value) rows in fixed-size batches up to
# n_rows, then reports no new data; offsets are plain row indices so
# readBetweenOffsets can replay any batch exactly (the contract that
# makes checkpoint recovery exact-once).
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class RangeStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.batch = int(options.get("batch_rows", 100))

    def initialOffset(self):
        return {"idx": 0}

    def _rows(self, start: int, end: int):
        # a LIST-iterator, not a generator and not a bare list: the
        # prefetching offset cache calls next() on the returned value
        # AND copy.copy()s it between micro-batches — list_iterator
        # supports both, generators support neither
        return iter([(i, f"g{(i // 125) % 4}",
                      float((i * 37) % 1000) / 10.0)
                     for i in range(start, end)])

    def read(self, start: dict):
        lo = start["idx"]
        hi = min(lo + self.batch, self.n_rows)
        return self._rows(lo, hi), {"idx": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["idx"], end["idx"])


class RangeStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "range_docs_stream"

    def schema(self) -> str:
        return "id bigint, grp string, value double"

    def simpleStreamReader(self, schema: StructType):
        return RangeStreamReader(self.options)


# ---------------------------------------------------------------------------
# Python STREAMING SINK (Spark 4 DataSourceStreamWriter): the write
# side of the same extension point — tasks write part files, the
# DRIVER commits a per-batch manifest listing exactly the files of
# that batch's successful tasks. Readers resolve content through the
# manifests only, so a failed/retried task's orphan file is invisible:
# effectively-once without a table format (the same discipline as
# sources/snapshots.py, per micro-batch).
# ---------------------------------------------------------------------------

import dataclasses

from pyspark.sql.datasource import DataSourceStreamWriter, WriterCommitMessage


@dataclasses.dataclass
class _PartFileCommit(WriterCommitMessage):
    path: str
    n_rows: int


class JsonDirStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("range_docs_sink requires a 'path' option")

    def write(self, iterator):
        import json as _json
        import os
        import uuid as _uuid

        rows = [row.asDict() for row in iterator]
        os.makedirs(self.path, exist_ok=True)
        name = os.path.join(self.path, f"part-{_uuid.uuid4().hex}.jsonl")
        with open(name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r, sort_keys=True) + "\n")
        return _PartFileCommit(path=name, n_rows=len(rows))

    def commit(self, messages, batchId):
        import json as _json
        import os

        manifest = {
            "batch": batchId,
            "files": sorted(m.path for m in messages if m is not None),
            "rows": sum(m.n_rows for m in messages if m is not None),
        }
        tmp = os.path.join(self.path, f"_manifest-{batchId}.json.tmp")
        with open(tmp, "w") as f:
            _json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path,
                                     f"_manifest-{batchId}.json"))

    def abort(self, messages, batchId):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonDirSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "range_docs_sink"

    def schema(self) -> str:          # sink: schema comes from the stream
        return "id bigint, grp string, value double"

    def streamWriter(self, schema: StructType, overwrite: bool):
        return JsonDirStreamWriter(self.options)


def read_json_sink(spark, path):
    """Batch-read a JsonDirStreamWriter output directory through its
    manifests: only files listed by a committed batch manifest are
    read (orphans from failed tasks are ignored)."""
    import glob
    import json as _json

    files = []
    for mp in sorted(glob.glob(f"{path}/_manifest-*.json")):
        with open(mp) as f:
            files.extend(_json.load(f)["files"])
    if not files:
        return spark.createDataFrame(
            [], "id bigint, grp string, value double")
    return spark.read.schema("id bigint, grp string, value double") \
        .json(files)
