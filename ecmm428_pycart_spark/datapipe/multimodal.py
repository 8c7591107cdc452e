"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not present in this container
(BASELINE.json instruction), so the *decode* kernels are stubs — but the
Spark-side contract is real and tested: BinaryType payload columns, a
metadata struct, Arrow-batched mapInPandas with a declared output schema,
and partition-size-aware batching. Swapping the stub for a real
decoder (PIL / torchaudio / pyav) changes only `_decode_batch`.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

REAL_DECODERS_AVAILABLE = False  # no image/audio libs in this container

FEATURE_DIM = 4

_DECODED_SCHEMA = ("doc_id long, mime string, byte_len long, "
                   "feature array<double>")


def attach_binary_payload(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text,
    metadata struct (mime, byte_len). On a real corpus the payload comes
    from the storage layer; everything downstream only sees bytes."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("long").alias("byte_len"),
        ).alias("meta"))


def _fake_features(buf: bytes) -> list[float]:
    """Deterministic stand-in for a decode+featurize kernel: first
    FEATURE_DIM bytes, scaled. Replace with a real decoder when available."""
    head = np.frombuffer(buf[:FEATURE_DIM].ljust(FEATURE_DIM, b"\0"),
                         dtype=np.uint8)
    return (head.astype("f8") / 255.0).tolist()


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = []
        for buf in pdf["payload"]:
            if REAL_DECODERS_AVAILABLE:
                raise NotImplementedError(
                    "real decode path requires PIL/pyav; not in container")
            feats.append(_fake_features(bytes(buf)))
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "mime": [m["mime"] for m in pdf["meta"]],
            "byte_len": [m["byte_len"] for m in pdf["meta"]],
            "feature": feats,
        })


def decode_features(df: DataFrame) -> DataFrame:
    """mapInPandas decode stage: Arrow batches of (doc_id, payload, meta)
    → (doc_id, mime, byte_len, feature). Batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch; at scale, repartition
    upstream so each task holds ~128 MB of payload."""
    return df.mapInPandas(_decode_batch, schema=_DECODED_SCHEMA)


_RESIZED_SCHEMA = ("doc_id long, width int, height int, pixels binary")


def resize_stub(df: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Image-resize plumbing: payload → fixed (width×height) byte grid.

    The real kernel would be PIL/torchvision inside the same batch
    function; the stub deterministically tiles the payload bytes so the
    Spark-side contract (binary in, fixed-size binary out, schema,
    batching) is real and testable."""
    npix = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for buf in pdf["payload"]:
                b = bytes(buf)
                if REAL_DECODERS_AVAILABLE:
                    raise NotImplementedError("real resize requires PIL")
                tiled = (b * (npix // max(len(b), 1) + 1))[:npix]
                out.append(tiled)
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "width": width, "height": height,
                                "pixels": out})

    return df.mapInPandas(run, schema=_RESIZED_SCHEMA)


_FRAMES_SCHEMA = ("doc_id long, frame_index int, frame binary")


def frame_sample_stub(df: DataFrame, every_n_bytes: int = 64,
                      frame_len: int = 16, max_frames: int = 4) -> DataFrame:
    """Video frame-sampling plumbing: payload → up to ``max_frames``
    evenly spaced byte slices, one output row per frame (the
    explode-shaped contract a real pyav sampler would have)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(buf)
                if REAL_DECODERS_AVAILABLE:
                    raise NotImplementedError("real sampling requires pyav")
                for i in range(min(max_frames, max(len(b) // every_n_bytes, 1))):
                    start = i * every_n_bytes
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[start:start + frame_len])
            yield pd.DataFrame({"doc_id": ids, "frame_index": idxs,
                                "frame": frames})

    return df.mapInPandas(run, schema=_FRAMES_SCHEMA)
