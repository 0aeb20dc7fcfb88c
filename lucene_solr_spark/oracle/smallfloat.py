"""Lucene SmallFloat byte315 quantization + BM25 NORM_TABLE, in numpy.

Bit-exact with the reference:
- floatToByte315 / byte315ToFloat: lucene/core/src/java/org/apache/lucene/
  util/SmallFloat.java:78-98 (3 mantissa bits, zero-exponent 15, truncating).
- NORM_TABLE[b] = 1/f^2 with f = byte315ToFloat(b); NORM_TABLE[0] =
  1/NORM_TABLE[255]: search/similarities/BM25Similarity.java:134-143.
- norm byte = floatToByte315(1f / (float) Math.sqrt(length)); zero-length
  field => byte 0: BM25Similarity.java:103-105 encodeNormValue,
  index/DefaultIndexingChain.java:691-703.
"""

from __future__ import annotations

import numpy as np


def float_to_byte315(f: np.ndarray | float) -> np.ndarray:
    """Vectorized SmallFloat.floatToByte315. Returns uint8 array."""
    f32 = np.atleast_1d(np.asarray(f, dtype=np.float32))
    bits = f32.view(np.int32)
    smallfloat = bits >> (24 - 3)
    base = (63 - 15) << 3
    out = (smallfloat - base).astype(np.int32)
    # underflow: bits<=0 -> 0 else 1
    under = smallfloat <= base
    out = np.where(under, np.where(bits <= 0, 0, 1), out)
    # overflow -> (byte)-1 == 255
    out = np.where(smallfloat >= base + 0x100, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray | int) -> np.ndarray:
    """Vectorized SmallFloat.byte315ToFloat. Returns float32 array."""
    b = np.atleast_1d(np.asarray(b, dtype=np.uint8)).astype(np.int32)
    bits = (b << (24 - 3)) + ((63 - 15) << 24)
    f = bits.astype(np.int32).view(np.float32)
    return np.where(b == 0, np.float32(0.0), f).astype(np.float32)


def _build_norm_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.float32)
    f = byte315_to_float(np.arange(256, dtype=np.uint8))
    with np.errstate(divide="ignore"):
        t[1:] = (np.float32(1.0) / (f[1:] * f[1:])).astype(np.float32)
    t[0] = np.float32(1.0) / t[255]
    return t


#: NORM_TABLE[b] = 1/f^2, NORM_TABLE[0] special-cased (BM25Similarity.java:134-143)
NORM_TABLE: np.ndarray = _build_norm_table()


def norm_bytes_for_lengths(lengths: np.ndarray) -> np.ndarray:
    """Norm byte per field length (vectorized).

    length==0 -> byte 0 (DefaultIndexingChain.java:694-699); else
    floatToByte315(1f / (float) sqrt(length)) — sqrt in double, cast to
    float32, then float32 division, matching Java evaluation order.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    sqrt32 = np.sqrt(lengths.astype(np.float64)).astype(np.float32)
    with np.errstate(divide="ignore"):
        inv = (np.float32(1.0) / sqrt32).astype(np.float32)
    out = float_to_byte315(inv)
    return np.where(lengths == 0, np.uint8(0), out).astype(np.uint8)


def norm_byte_for_length(length: int) -> int:
    return int(norm_bytes_for_lengths(np.array([length]))[0])
