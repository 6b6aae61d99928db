"""Vectorized variable-byte (VInt) codec.

Same wire format as the reference's DataOutput.writeVInt
(lucene/core/src/java/org/apache/lucene/store/DataOutput.java:186-192):
7-bit little-endian groups, high bit set on every byte except the last.

Both directions are numpy-vectorized — the per-value loop is over the
max byte-length (≤5 for uint32 payloads, ≤10 for uint64), not over values.
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # enough for uint64


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative integer array to VByte bytes."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nb = np.ones(v.size, dtype=np.int64)
    for k in range(1, _MAX_BYTES):
        nb += (v >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(nb)))[:-1]
    out = np.zeros(int(offsets[-1] + nb[-1]), dtype=np.uint8)
    rem = v.copy()
    for j in range(int(nb.max())):
        mask = nb > j
        cur = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        more = (nb[mask] > j + 1).astype(np.uint8) << 7
        out[offsets[mask] + j] = cur | more
        rem = rem >> np.uint64(7)
    return out.tobytes()


def vbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value — lets callers encode a whole
    stream ONCE and slice per-block spans out of the result instead of
    paying the encoder's fixed numpy overhead per tiny block."""
    v = np.asarray(values, dtype=np.uint64)
    nb = np.ones(v.size, dtype=np.int64)
    for k in range(1, _MAX_BYTES):
        nb += (v >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    return nb


def vbyte_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode VByte bytes back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else buf
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = np.flatnonzero(b < 0x80)
    starts = np.concatenate(([0], ends[:-1] + 1))
    out = np.zeros(ends.size, dtype=np.uint64)
    max_len = int((ends - starts).max()) + 1
    for j in range(max_len):
        pos = starts + j
        mask = pos <= ends
        out[mask] |= (b[pos[mask]].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return out
