"""FOR (Frame-of-Reference) 128-int block bit-packing.

Mirrors the reference's ForUtil semantics
(lucene/core/src/java/org/apache/lucene/codecs/lucene50/ForUtil.java):
per-block bit width = bits(max value); the all-values-equal block is the
width-0 special case carrying a single VInt (ForUtil.java:40-46,
ALL_VALUES_EQUAL).  Wire layout here: [width:1 byte][packed payload],
values packed MSB-first at ``width`` bits each.

numpy-vectorized both ways (packbits/unpackbits), no per-value Python.
"""

from __future__ import annotations

import numpy as np

from lucene_solr_spark.codecs.vbyte import vbyte_decode, vbyte_encode

BLOCK_SIZE = 128  # ref: Lucene50PostingsFormat.java:397


def for_encode(block: np.ndarray) -> bytes:
    """Encode one block (any length ≤ BLOCK_SIZE of uint32) to bytes."""
    v = np.asarray(block, dtype=np.uint64)
    if v.size == 0:
        return b""
    if (v == v[0]).all():
        return bytes([0]) + vbyte_encode(v[:1]) + vbyte_encode(np.array([v.size]))
    width = int(v.max()).bit_length()
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    packed = np.packbits(bits.ravel())
    return bytes([width]) + vbyte_encode(np.array([v.size])) + packed.tobytes()


def for_decode(buf: bytes) -> np.ndarray:
    """Decode one FOR block back to uint64 values."""
    if len(buf) == 0:
        return np.zeros(0, dtype=np.uint64)
    width = buf[0]
    rest = np.frombuffer(buf, dtype=np.uint8, offset=1)
    if width == 0:
        vals = vbyte_decode(rest)
        return np.full(int(vals[1]), vals[0], dtype=np.uint64)
    # count prefix is VByte — find its end (first byte < 0x80)
    cnt_end = int(np.flatnonzero(rest < 0x80)[0]) + 1
    count = int(vbyte_decode(rest[:cnt_end])[0])
    bits = np.unpackbits(rest[cnt_end:], count=count * width)
    mat = bits.reshape(count, width).astype(np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (mat << shifts[None, :]).sum(axis=1, dtype=np.uint64)
