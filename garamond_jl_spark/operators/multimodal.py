"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (build-brief requirement).

The Spark-side machinery here is REAL and tested: schemas, partitioning,
Arrow batch shapes, mapInPandas signatures, metadata propagation.  The
codec step is split honestly in two:

* **Real stdlib codecs** — WAV (``wave``) and PGM/PPM (hand parser for
  the netpbm grammar) via :func:`wav_decode_features` /
  :func:`pnm_decode_features` / :func:`stdlib_decoder`; the
  ``multimodal_wav_decode`` / ``multimodal_pgm_decode`` parity rows
  hash-verify a full encode→decode round-trip against a DuckDB oracle.
* **Stub boundary for everything else** — JPEG/PNG/MP4 etc. need
  PIL/torchaudio/ffmpeg, which are not in this container; production
  passes a real ``decode_fn``, tests use
  :func:`deterministic_fake_decoder` (sha256-derived reproducible
  vectors), and ``decode_fn=None`` raises NotImplementedError to keep
  the boundary explicit.
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


# --------------------------------------------------------------------------
# Real stdlib codecs (closing the decode stub boundary where the
# standard library allows): WAV via `wave`, PGM/PPM via a hand parser.
# No image/audio libraries exist in this container, but these formats
# are stdlib-decodable — so for them decode_fn is REAL, not a fake.
# --------------------------------------------------------------------------

def wav_encode(samples: np.ndarray, framerate: int = 8000,
               channels: int = 1) -> bytes:
    """int16 PCM samples → a complete WAV byte payload (stdlib
    ``wave``).  The synthesis half of the codec round-trip the parity
    row verifies."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def wav_decode_features(payload: bytes) -> np.ndarray:
    """REAL WAV decode (stdlib ``wave``): parse the RIFF container,
    read PCM frames, return integer-exact summary features
    [channels, framerate, n_samples, sum, abs_sum, min, max].  All
    values stay below 2^24 at the synthetic sizes, so float32 carries
    them exactly (FEATURES_SCHEMA is array<float>)."""
    import io
    import wave
    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, rate = w.getnchannels(), w.getframerate()
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        raw = w.readframes(w.getnframes())
    s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    return np.array([nch, rate, s.size, int(s.sum()),
                     int(np.abs(s).sum()),
                     int(s.min()) if s.size else 0,
                     int(s.max()) if s.size else 0], dtype=np.float32)


def pnm_encode(pixels: np.ndarray, width: int, height: int,
               binary: bool = True) -> bytes:
    """uint8 grayscale pixels (row-major) → PGM bytes: P5 (binary) or
    P2 (ASCII) — both published netpbm formats."""
    if binary:
        head = f"P5\n{width} {height}\n255\n".encode()
        return head + pixels.astype(np.uint8).tobytes()
    body = "\n".join(" ".join(str(int(v)) for v in row)
                     for row in pixels.reshape(height, width))
    return f"P2\n{width} {height}\n255\n{body}\n".encode()


def pnm_decode_features(payload: bytes) -> np.ndarray:
    """REAL PGM/PPM decode (hand parser for the netpbm header grammar:
    magic, comment lines, dims, maxval, then raster — binary P5/P6 or
    ASCII P2/P3).  Returns integer-exact features
    [width, height, channels, sum, min, max]."""
    if not payload.startswith(b"P"):
        raise ValueError("not a PNM payload")
    magic = payload[:2].decode()
    if magic not in ("P2", "P3", "P5", "P6"):
        raise ValueError(f"unsupported PNM magic {magic}")
    # header tokens: width height maxval, with '#' comments allowed
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    width, height, maxval = tokens
    channels = 3 if magic in ("P3", "P6") else 1
    n = width * height * channels
    if magic in ("P5", "P6"):
        pos += 1                       # single whitespace after maxval
        if len(payload) - pos < n:
            raise ValueError("truncated PNM raster")
        px = np.frombuffer(payload, dtype=np.uint8, count=n,
                           offset=pos).astype(np.int64)
    else:
        vals = payload[pos:].split()
        if len(vals) < n:
            raise ValueError("truncated PNM raster")
        px = np.array(vals[:n], dtype=np.int64)
    return np.array([width, height, channels, int(px.sum()),
                     int(px.min()), int(px.max())], dtype=np.float32)


def stdlib_decoder() -> Callable[[bytes], np.ndarray]:
    """Dispatching decode_fn covering the stdlib-decodable formats —
    a REAL codec for extract_features (WAV audio, PGM/PPM images);
    anything else still needs an external library and raises, keeping
    the remaining stub boundary explicit."""

    def decode(payload: bytes) -> np.ndarray:
        if payload[:4] == b"RIFF":
            return wav_decode_features(payload)
        if payload[:1] == b"P":
            return pnm_decode_features(payload)
        raise NotImplementedError(
            "payload is neither WAV nor PNM; real image/audio codecs "
            "(PIL/ffmpeg/torchaudio) are not in this container")

    return decode


def chunk_split_fn(chunk: int = 1024) -> Callable[[bytes, int], list[bytes]]:
    """Deterministic stand-in splitter: fixed-size byte chunks as
    'frames' — exercises the one-to-many fan-out without a codec."""

    def split(payload: bytes, _every_ms: int) -> list[bytes]:
        # an empty payload has NO frames (the [b""] placeholder made
        # the Spark plan emit a zero-length frame row where the parity
        # oracle's WHERE n > 0 emits none)
        return [payload[i:i + chunk] for i in range(0, len(payload), chunk)]

    return split
