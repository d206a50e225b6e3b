"""Posting-list compression codec: docID-delta + variable-byte.

North-star requirement (BASELINE.json): "per-partition sorted posting
lists (docID-delta + varbyte compression)".  The reference's analogous
technique is lossy product quantization for vectors
(/root/reference/src/index/ivfadc.jl:1-18); here the posting lists ARE
the sparse vectors (SURVEY.md §4.2), so we use the classic lossless IR
codec instead.

All encode/decode is numpy-vectorized (loops run over *byte width* ≤ 10,
never over elements), so the pack/unpack pandas UDFs stay Arrow-fast —
no per-element Python in the hot path.

Layout per block: ``doc_ids`` = varbyte(delta(sorted ids)),
``tfs`` = varbyte(tf counts), ``wnorms`` = raw little-endian float32 of
the L2-normalized BM25 weights (exact scoring needs exact floats).
"""

from __future__ import annotations

import numpy as np


def varbyte_encode(vals: np.ndarray) -> bytes:
    """Varbyte-encode a uint64 array (7 data bits/byte, MSB=continuation)."""
    vals = np.asarray(vals, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return b""
    nb = np.ones(n, dtype=np.int64)
    tmp = vals >> np.uint64(7)
    while tmp.any():
        nb += (tmp > 0)
        tmp = tmp >> np.uint64(7)
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    for j in range(int(nb.max())):
        mask = nb > j
        idx = starts[mask] + j
        byte = ((vals[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = ((j < nb[mask] - 1).astype(np.uint8)) << 7
        out[idx] = byte | cont
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Inverse of :func:`varbyte_encode`; returns uint64 array."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = np.nonzero((arr & 0x80) == 0)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    vals = np.zeros(len(ends), dtype=np.uint64)
    width = int((ends - starts + 1).max())
    for j in range(width):
        mask = starts + j <= ends
        vals[mask] |= (arr[starts[mask] + j].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing ids → first id + successive gaps."""
    ids = np.asarray(sorted_ids, dtype=np.uint64)
    if len(ids) == 0:
        return ids
    out = np.empty_like(ids)
    out[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.uint64), dtype=np.uint64)


def pack_ids(sorted_ids: np.ndarray) -> bytes:
    return varbyte_encode(delta_encode(sorted_ids))


def unpack_ids(buf: bytes) -> np.ndarray:
    return delta_decode(varbyte_decode(buf))


def pack_f32(vals: np.ndarray) -> bytes:
    return np.asarray(vals, dtype="<f4").tobytes()


def unpack_f32(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype="<f4")
