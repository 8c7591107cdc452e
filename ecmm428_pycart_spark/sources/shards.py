"""WebDataset-style tar shard export — the hand-off format multimodal
training loaders (webdataset, torchdata) stream: N tar files, each
holding per-sample entries named ``{key}.{ext}``, plus a manifest.

Beyond-reference surface (the reference exports tables only,
main.py:253); this is the export path a 100 TB image/audio corpus
actually ships through.

Scale shape: shard assignment is a DETERMINISTIC md5 hash of the id
(reproducible across runs/engines — the d10/d45 convention), and each
shard's tar is built executor-side by one ``applyInPandas`` group —
n_shards is chosen so a shard fits the loader's streaming granularity
(the webdataset norm is ~1 GB/shard; pick ``n_shards ≈ corpus_bytes /
1 GB``), which is exactly the bound on group memory. Executors write
shard files directly under ``out_dir`` and the driver writes the
manifest, so ``out_dir`` must be a shared filesystem in cluster mode
(see write_tar_shards' deployment contract). Tar bytes are
canonical (sorted entries, zeroed mtime/uid/gid, fixed perms) so a
shard's sha256 is stable — re-exports of identical data are
byte-identical, making downstream caching/diffing trivial. The
manifest is written driver-side from the per-shard results via the
snapshots.py atomic-publish convention (temp file + os.replace).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile

from pyspark.sql import DataFrame, functions as F


def shard_key(id_col, n_shards: int):
    """Deterministic shard id: first 8 md5 hex chars of the id mod n
    (the shared md5_bucket contract)."""
    from ecmm428_pycart_spark.datapipe.text import md5_bucket
    return md5_bucket(id_col, n_shards)


def shard_fingerprints(df: DataFrame, n_shards: int,
                       id_col: str = "doc_id",
                       payload_cols: dict[str, str] | None = None) -> DataFrame:
    """Per-shard content fingerprint WITHOUT building any tar: md5 over
    the sorted (id:payload-md5) lines of the shard. Purely relational
    (explode-free aggregate over the rows the shard would contain), so
    an incremental export can decide which shards changed by comparing
    against the previous manifest before touching bytes."""
    payload_cols = dict(payload_cols or {"text": "txt"})
    line = F.concat_ws(":", F.col(id_col).cast("string"),
                       *[F.coalesce(F.md5(F.col(c).cast("binary")),
                                    F.lit("-"))
                         for c in payload_cols])
    return (df.select(F.col(id_col), line.alias("_line"))
            .withColumn("shard", shard_key(id_col, n_shards))
            .groupBy("shard")
            .agg(F.md5(F.concat_ws(
                "\n", F.array_sort(F.collect_list("_line"))))
                .alias("content_fp")))


def write_tar_shards(df: DataFrame, out_dir: str, n_shards: int = 8,
                     id_col: str = "doc_id",
                     payload_cols: dict[str, str] | None = None,
                     incremental: bool = False) -> DataFrame:
    """Export ``df`` as ``shard-{i:05d}.tar`` files under ``out_dir``.

    ``payload_cols`` maps column -> entry extension (default
    ``{"text": "txt"}``); string columns are written utf-8, binary
    columns raw. Entry names are ``{id}.{ext}``, sorted by id within
    the shard. Null payloads are skipped (entry absent, id still
    counted in the manifest's n_rows).

    ``incremental=True`` compares per-shard content fingerprints
    (``shard_fingerprints``; computed without building tars) against
    the existing manifest and rebuilds ONLY the shards whose contents
    changed — the re-export cost tracks the delta, not the corpus.
    Unchanged shards keep their files and manifest rows (canonical tar
    bytes make the skip exact, not heuristic).

    Returns the per-shard result DataFrame (shard, n_rows, n_entries,
    n_bytes, sha256) covering ALL shards — the same rows recorded in
    ``{out_dir}/_manifest.json``.

    DEPLOYMENT CONTRACT: each shard's tar is written by its executor
    via local filesystem calls under ``out_dir``, and the manifest is
    written by the driver — so ``out_dir`` must be a filesystem ALL
    executors and the driver share (NFS/Lustre/FUSE-mounted object
    store), exactly the mount a webdataset training job reads from.
    On local[*] any path works. For a direct-to-object-store export
    without a shared mount, route each shard's bytes through an
    object-store client inside build() instead of open()/os.replace —
    the canonical-bytes and fingerprint logic is unchanged.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    payload_cols = dict(payload_cols or {"text": "txt"})
    missing = [c for c in payload_cols if c not in df.columns]
    if missing:
        raise ValueError(f"payload columns not in DataFrame: {missing}")
    os.makedirs(out_dir, exist_ok=True)

    prev_rows: dict[int, dict] = {}
    if incremental:
        man_path = os.path.join(out_dir, "_manifest.json")
        if os.path.exists(man_path):
            # the fingerprint pre-pass is inherent ONLY to the skip
            # decision (and only when there is a manifest to skip
            # against); a plain or first export computes each shard's
            # fp inside build() from rows it already holds — no extra
            # scan
            fps = {r["shard"]: r["content_fp"]
                   for r in shard_fingerprints(
                       df, n_shards, id_col, payload_cols).collect()}
            with open(man_path) as f:
                prev = json.load(f)
            if (prev.get("n_shards") == n_shards
                    and prev.get("payload_cols") == payload_cols):
                for row in prev.get("shards", []):
                    sh = row["shard"]
                    if (row.get("content_fp") == fps.get(sh)
                            and os.path.exists(os.path.join(
                                out_dir, f"shard-{sh:05d}.tar"))):
                        prev_rows[sh] = row

    cols = [id_col, *payload_cols]
    keyed = (df.select(*cols)
             .withColumn("shard", shard_key(id_col, n_shards)))
    if prev_rows:
        skip = sorted(prev_rows)
        keyed = keyed.filter(~F.col("shard").isin(skip))
    items = list(payload_cols.items())

    def build(pdf):
        import pandas as pd

        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(id_col)
        buf = io.BytesIO()
        n_entries = 0
        fp_lines = []
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in pdf.iterrows():
                hashes = []
                for col, ext in items:
                    v = row[col]
                    if v is None:
                        hashes.append("-")
                        continue
                    if isinstance(v, str):
                        data = v.encode("utf-8")
                    elif isinstance(v, (bytes, bytearray, memoryview)):
                        data = bytes(v)
                    else:
                        # bytes(int) would silently emit zero-fill
                        raise TypeError(
                            f"payload column {col!r} must be string "
                            f"or binary, got {type(v).__name__}")
                    hashes.append(hashlib.md5(data).hexdigest())
                    info = tarfile.TarInfo(name=f"{row[id_col]}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.mode = 0o644
                    tar.addfile(info, io.BytesIO(data))
                    n_entries += 1
                fp_lines.append(":".join([str(row[id_col]), *hashes]))
        payload = buf.getvalue()
        content_fp = hashlib.md5(
            "\n".join(sorted(fp_lines)).encode("utf-8")).hexdigest()
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pd.DataFrame({
            "shard": [shard], "n_rows": [len(pdf)],
            "n_entries": [n_entries], "n_bytes": [len(payload)],
            "sha256": [hashlib.sha256(payload).hexdigest()],
            "content_fp": [content_fp],
        })

    built = (keyed.groupBy("shard").applyInPandas(
        build,
        schema="shard int, n_rows long, n_entries long, n_bytes long, "
               "sha256 string, content_fp string")
        .collect())
    rows = {r["shard"]: r.asDict() for r in built}
    for sh, row in prev_rows.items():
        rows[sh] = {k: row[k] for k in ("shard", "n_rows", "n_entries",
                                        "n_bytes", "sha256", "content_fp")}
    result = [rows[sh] for sh in sorted(rows)]
    manifest = {
        "n_shards": n_shards,
        "id_col": id_col,
        "payload_cols": payload_cols,
        "shards": result,
        "total_rows": sum(r["n_rows"] for r in result),
        "total_entries": sum(r["n_entries"] for r in result),
    }
    tmp = os.path.join(out_dir, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "_manifest.json"))
    # drop stale shard files the new manifest no longer references
    # (docs deleted from a shard, or n_shards reduced between runs)
    import glob as _glob
    live = {f"shard-{r['shard']:05d}.tar" for r in result}
    for path in _glob.glob(os.path.join(out_dir, "shard-*.tar")):
        if os.path.basename(path) not in live:
            os.remove(path)
    return df.sparkSession.createDataFrame(
        [(r["shard"], r["n_rows"], r["n_entries"], r["n_bytes"],
          r["sha256"]) for r in result],
        "shard int, n_rows long, n_entries long, n_bytes long, "
        "sha256 string")


def read_tar_shards(spark, out_dir: str) -> DataFrame:
    """Read an exported shard directory back as (shard, name, data) —
    the verification path (and a minimal loader). Uses binaryFile for
    the tar bytes (distributed read), then a mapInPandas tar walk."""
    import pandas as pd

    files = (spark.read.format("binaryFile")
             .load(os.path.join(out_dir, "shard-*.tar"))
             .select("path", "content"))

    def walk(batches):
        for pdf in batches:
            out = {"shard": [], "name": [], "data": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                base = os.path.basename(path)
                shard = int(base[len("shard-"):-len(".tar")])
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    for m in tar.getmembers():
                        if not m.isreg():
                            continue  # extractfile(None-deref) guard
                        out["shard"].append(shard)
                        out["name"].append(m.name)
                        out["data"].append(tar.extractfile(m).read())
            yield pd.DataFrame(out)

    return files.mapInPandas(walk, schema="shard int, name string, "
                                          "data binary")
