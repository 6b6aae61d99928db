"""Bit-faithful float32 BM25 (k1=1.2, b=0.75) with byte315 norm quantization.

Replicates the arithmetic of the reference
(lucene/core/src/java/org/apache/lucene/search/similarities/
BM25Similarity.java and util/SmallFloat.java:79-99) in vectorized numpy:

- ``idf``        = (float32) ln(1 + (docCount − df + 0.5)/(df + 0.5))
                   (BM25Similarity.java:71-74; multi-term weights sum the
                   float idfs in double then cast back — :196-205)
- norm encode    = floatToByte315((float32)(1/sqrt(fieldLength)))
                   (BM25Similarity.java:103-111; SmallFloat.java:79-89 —
                   3 mantissa bits, zero-exponent 15, truncating)
- NORM_TABLE[b]  = 1/byte315ToFloat(b)^2, NORM_TABLE[0]=1/NORM_TABLE[255]
                   (BM25Similarity.java:134-143)
- cache[b]       = k1·((1−b) + b·NORM_TABLE[b]/avgdl)  in float32
                   (BM25Similarity.java:213-217); avgdl =
                   (float32)(sumTotalTermFreq / (double)docCount) (:89-97)
- score          = weight·(k1+1)·freq / (freq + cache[normByte]) in float32
                   (BM25DocScorer.score, :241-254), weight = boost·idf

All hot-path entry points take/return numpy arrays so they vectorize
inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# ---------------------------------------------------------------- SmallFloat


def float_to_byte315(f: np.ndarray | float) -> np.ndarray:
    """Vectorized SmallFloat.floatToByte315 (truncating 8-bit float).

    3 mantissa bits, zero exponent 15.  Ref: util/SmallFloat.java:79-89.
    """
    f32 = np.asarray(f, dtype=np.float32)
    bits = f32.view(np.int32)
    smallfloat = bits >> (24 - 3)
    lo = (63 - 15) << 3
    out = (smallfloat - lo).astype(np.int64)
    # underflow: 0 for <=0.0, 1 for tiny positives
    out = np.where(smallfloat <= lo, np.where(bits <= 0, 0, 1), out)
    # overflow saturates to 255 ((byte)-1)
    out = np.where(smallfloat >= lo + 0x100, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray | int) -> np.ndarray:
    """Vectorized SmallFloat.byte315ToFloat.  Ref: SmallFloat.java:91-99."""
    barr = np.asarray(b, dtype=np.int64) & 0xFF
    bits = (barr << (24 - 3)) + ((63 - 15) << 24)
    out = bits.astype(np.int32).view(np.float32)
    return np.where(barr == 0, np.float32(0.0), out).astype(np.float32)


# NORM_TABLE per BM25Similarity.java:134-143 (float32 throughout).
_f = byte315_to_float(np.arange(256))
with np.errstate(divide="ignore"):
    NORM_TABLE = (np.float32(1.0) / (_f * _f)).astype(np.float32)
NORM_TABLE[0] = np.float32(1.0) / NORM_TABLE[255]
del _f


def encode_norm(field_length: np.ndarray | int) -> np.ndarray:
    """fieldLength → norm byte: floatToByte315((float)(1/sqrt(len))).

    Ref: BM25Similarity.encodeNormValue, :103-105.  float32 end-to-end.
    """
    length = np.asarray(field_length, dtype=np.float64)
    inv = (np.float64(1.0) / np.sqrt(length)).astype(np.float32)
    return float_to_byte315(inv)


def byte315_length_ranges(max_len: int = 10**9) -> list[tuple[int, int, int]]:
    """Contiguous ``(byte, lo, hi)`` field-length ranges per norm byte.

    encode_norm is monotone non-increasing in length, so each norm byte
    owns one contiguous length interval.  These are spec constants of
    SmallFloat.floatToByte315 (like the NORM_TABLE values) — the DuckDB
    correctness oracle embeds them as literals to recover the norm byte
    from the SQL-derived field length without bit twiddling."""
    ranges: list[tuple[int, int, int]] = []
    lo = 1
    while lo <= max_len:
        b = int(encode_norm(lo))
        step, hi = 1, lo
        while hi < max_len and int(encode_norm(min(hi + step, max_len))) == b:
            hi = min(hi + step, max_len)
            step *= 2
        top = min(hi + step, max_len)
        while hi < top:
            mid = (hi + top + 1) // 2
            if int(encode_norm(mid)) == b:
                hi = mid
            else:
                top = mid - 1
        ranges.append((b, lo, hi))
        lo = hi + 1
    return ranges


def idf(doc_freq: np.ndarray | int, doc_count: int) -> np.ndarray:
    """(float32) ln(1 + (N − df + 0.5)/(df + 0.5)).  Ref: :71-74.

    Math.log(1 + x), NOT log1p — the reference adds 1 in double before
    the log (BM25Similarity.java:72), and the DuckDB oracle's ln(1+x)
    must hit the same double before the float32 cast."""
    df = np.asarray(doc_freq, dtype=np.float64)
    return np.log(1.0 + (doc_count - df + 0.5) / (df + 0.5)).astype(np.float32)


@dataclass(frozen=True)
class BM25:
    """Per-collection BM25 scorer state (the SimWeight analog).

    Global statistics MUST be collection-wide, not per-partition —
    Solr's ExactStatsCache makes the same point
    (solr/core/.../search/stats/ExactStatsCache.java:56).
    """

    k1: float = 1.2
    b: float = 0.75

    def __post_init__(self) -> None:
        if not np.isfinite(self.k1) or self.k1 < 0:
            raise ValueError(f"illegal k1 value: {self.k1}, must be a non-negative finite value")
        if np.isnan(self.b) or self.b < 0 or self.b > 1:
            raise ValueError(f"illegal b value: {self.b}, must be between 0 and 1")

    def avgdl(self, sum_total_term_freq: int, doc_count: int) -> np.float32:
        """(float32)(sumTotalTermFreq/(double)docCount).  Ref: :89-97."""
        if sum_total_term_freq <= 0:
            return np.float32(1.0)
        return np.float32(sum_total_term_freq / float(doc_count))

    def cache(self, avgdl: np.float32) -> np.ndarray:
        """Freq-independent part per norm byte, float32.  Ref: :213-217."""
        k1 = np.float32(self.k1)
        b = np.float32(self.b)
        return (
            k1 * ((np.float32(1) - b) + b * NORM_TABLE / np.float32(avgdl))
        ).astype(np.float32)

    def weight(self, idf_value: np.ndarray | float, boost: float = 1.0) -> np.float32:
        """boost·idf (BM25Stats.weight); multi-term idf is summed in double
        by the caller before this cast (ref: :196-205)."""
        return np.float32(np.float32(boost) * np.float32(idf_value))

    def score(
        self,
        weight: np.ndarray | np.float32,
        freq: np.ndarray,
        norm_byte: np.ndarray,
        cache: np.ndarray,
    ) -> np.ndarray:
        """weight·(k1+1)·freq/(freq + cache[normByte]) in float32.  Ref: :241-254."""
        w = (np.asarray(weight, dtype=np.float32) * np.float32(self.k1 + 1)).astype(
            np.float32
        )
        f = np.asarray(freq, dtype=np.float32)
        norm = cache[np.asarray(norm_byte, dtype=np.int64) & 0xFF]
        return (w * f / (f + norm)).astype(np.float32)
