"""BM25 kernel tests (mirrors TestBM25Similarity.java:24-74 plus
hand-computed values and SmallFloat roundtrips)."""

import math

import numpy as np
import pytest

from lucene_solr_spark.scoring import (
    BM25,
    NORM_TABLE,
    byte315_to_float,
    encode_norm,
    float_to_byte315,
    idf,
)


def test_norm_table_monotonic_nonincreasing_length():
    # longer field → bigger norm denominator → lower score
    lengths = np.array([1, 2, 3, 5, 8, 16, 64, 255, 1000, 100000])
    bytes_ = encode_norm(lengths)
    decoded = NORM_TABLE[bytes_]
    assert (np.diff(decoded) >= 0).all()  # NORM_TABLE value grows with length


def test_norm_table_sane():
    # TestBM25Similarity.java:24-35 analog
    assert NORM_TABLE[0] == np.float32(1.0) / NORM_TABLE[255]
    assert (NORM_TABLE[1:] > 0).all()
    assert np.isfinite(NORM_TABLE).all()


def test_param_validation():
    # TestBM25Similarity.java:37-74
    for k1 in [float("nan"), -1.0, float("inf")]:
        with pytest.raises(ValueError):
            BM25(k1=k1)
    for b in [float("nan"), -0.5, 1.5]:
        with pytest.raises(ValueError):
            BM25(b=b)
    BM25(k1=0.0, b=0.0)
    BM25(k1=5.0, b=1.0)


def test_smallfloat_known_values():
    # floatToByte315(1.0f) == 124 (3 mantissa bits, zero-exp 15)
    assert int(float_to_byte315(1.0)) == 124
    assert int(float_to_byte315(0.0)) == 0
    assert int(float_to_byte315(-1.0)) == 0
    assert int(float_to_byte315(1e12)) == 255  # overflow saturates
    assert int(float_to_byte315(1e-12)) == 1  # tiny positive underflow
    assert byte315_to_float(0) == 0.0


def test_smallfloat_roundtrip_idempotent():
    rng = np.random.default_rng(42)
    f = rng.uniform(1e-9, 1e9, 1000).astype(np.float32)
    b1 = float_to_byte315(f)
    f2 = byte315_to_float(b1)
    b2 = float_to_byte315(f2)
    assert (b1 == b2).all()  # quantization is idempotent
    # truncating: decoded value never exceeds the input
    assert (f2 <= f + 1e-30).all()


def test_idf_formula():
    # ln(1 + (N - df + 0.5)/(df + 0.5)), float32
    v = idf(5, 100)
    assert v == np.float32(math.log(1 + (100 - 5 + 0.5) / (5 + 0.5)))
    assert idf(100, 100).dtype == np.float32


def test_hand_computed_score():
    """Fully hand-derived single score (FIXTURES.md §3 oracle pin).

    Corpus: N=10 docs, df=2, sumTotalTermFreq=100 → avgdl=10.
    Doc: fieldLength=16 → byte315(1/4)=116 → NORM_TABLE[116]=16.0; tf=3.
    idf = ln(1 + (10-2+0.5)/(2.5)) = ln(4.4)
    cache = 1.2*(0.25 + 0.75*16/10)
    score = idf*2.2*3/(3+cache)
    """
    bm = BM25()
    assert int(encode_norm(16)) == 116
    assert NORM_TABLE[116] == np.float32(16.0)
    w = bm.weight(idf(2, 10))
    cache = bm.cache(bm.avgdl(100, 10))
    expected_cache = np.float32(1.2) * (
        np.float32(0.25) + np.float32(0.75) * np.float32(16.0) / np.float32(10.0)
    )
    assert cache[116] == expected_cache
    got = bm.score(w, np.array([3.0]), np.array([116]), cache)[0]
    exp = (
        np.float32(math.log(4.4))
        * np.float32(2.2)
        * np.float32(3.0)
        / (np.float32(3.0) + expected_cache)
    )
    assert got == np.float32(exp)
    assert got.dtype == np.float32


def test_avgdl_float32_cast():
    bm = BM25()
    assert bm.avgdl(0, 10) == np.float32(1.0)  # missing-stat fallback
    assert bm.avgdl(26098, 500) == np.float32(26098 / 500.0)
