"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (build-brief requirement).

The Spark-side machinery here is REAL and tested: schemas, partitioning,
Arrow batch shapes, mapInPandas signatures, metadata propagation.  The
codec step itself is STUBBED — image/audio libraries are not in this
container — behind ``decode_fn`` hooks: production passes a real decoder
(PIL/torchaudio/ffmpeg); tests and this sandbox use
:func:`deterministic_fake_decoder`, which derives a reproducible feature
vector from the bytes' sha256 (so downstream similarity plumbing is
testable end-to-end).  ``decode_fn=None`` raises NotImplementedError to
make the stub boundary explicit.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),   # image | audio | video
    StructField("mime", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
    StructField("payload", BinaryType(), False),     # opaque encoded bytes
])

FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),
    StructField("feature", ArrayType(FloatType()), False),
])

FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame", BinaryType(), False),
])


def deterministic_fake_decoder(dim: int = 16) -> Callable[[bytes], np.ndarray]:
    """Sandbox stand-in for a real decode+embed: sha256(payload) → a
    reproducible unit-norm float vector.  Deterministic, so tests can
    assert exact downstream results."""

    def decode(payload: bytes) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[:dim * 4],
                            dtype="<u4").astype(np.float64)
        v = (raw / np.uint32(0xFFFFFFFF)) - 0.5
        n = np.linalg.norm(v)
        return (v / n if n else v).astype(np.float32)

    return decode


def extract_features(media: DataFrame,
                     decode_fn: Callable[[bytes], np.ndarray] | None,
                     batch_limit_bytes: int = 64 << 20) -> DataFrame:
    """payload → feature vector via mapInPandas.  Arrow batches are
    bounded by spark.sql.execution.arrow.maxRecordsPerBatch; for large
    payloads repartition upstream so a batch stays under
    ``batch_limit_bytes`` (caller contract, asserted per-batch)."""
    if decode_fn is None:
        raise NotImplementedError(
            "media decoding requires a real codec (PIL/ffmpeg/torchaudio); "
            "not available in this container — pass decode_fn explicitly "
            "(tests use deterministic_fake_decoder())")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            total = int(b["payload"].map(len).sum())
            if total > batch_limit_bytes:
                # explicit raise, not assert: the OOM guard must hold
                # under python -O too
                raise ValueError(
                    f"arrow batch carries {total} payload bytes "
                    f"(> {batch_limit_bytes}); repartition upstream")
            feats = [decode_fn(bytes(p)).tolist() for p in b["payload"]]
            yield pd.DataFrame({"media_id": b["media_id"],
                                "modality": b["modality"],
                                "feature": feats})

    return media.select("media_id", "modality", "payload") \
        .mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int,
                  split_fn: Callable[[bytes, int], list[bytes]] | None) -> DataFrame:
    """video → sampled frame rows (one row per frame, binary payload).
    ``split_fn(payload, every_ms)`` is the stub boundary (ffmpeg in
    production; a byte-chunker stand-in exercises the fan-out shape)."""
    if split_fn is None:
        raise NotImplementedError(
            "frame sampling requires ffmpeg; pass split_fn explicitly")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(b["media_id"], b["payload"]):
                for i, fr in enumerate(split_fn(bytes(payload), every_ms)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return (media.where(F.col("modality") == "video")
            .select("media_id", "payload")
            .mapInPandas(run, FRAMES_SCHEMA))


def chunk_split_fn(chunk: int = 1024) -> Callable[[bytes, int], list[bytes]]:
    """Deterministic stand-in splitter: fixed-size byte chunks as
    'frames' — exercises the one-to-many fan-out without a codec."""

    def split(payload: bytes, _every_ms: int) -> list[bytes]:
        # an empty payload has NO frames (the [b""] placeholder made
        # the Spark plan emit a zero-length frame row where the parity
        # oracle's WHERE n > 0 emits none)
        return [payload[i:i + chunk] for i in range(0, len(payload), chunk)]

    return split
