"""Baseline JPEG codec tests (functions/jpeg.py — pure-numpy T.81).

The decoder's correctness anchors are ANALYTIC: hand-assembled
bitstreams whose decoded pixels have closed-form expectations derived
from the spec (a DC-only block is uniform F00·q00/8 + 128), so the
expectation shares no code with the decoder.  Roundtrips bound the
combined encode+decode error by the quantization step.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lucene_solr_spark.functions.jpeg import (
    K3_AC_CHROMA,
    K3_AC_LUMA,
    K3_DC_CHROMA,
    K3_DC_LUMA,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
)


def _pack_bits(bits_out):
    total = sum(length for _, length in bits_out)
    pad = (8 - total % 8) % 8
    if pad:
        bits_out = bits_out + [((1 << pad) - 1, pad)]
    acc = n = 0
    data = bytearray()
    for code, length in bits_out:
        for k in range(length - 1, -1, -1):
            acc = (acc << 1) | ((code >> k) & 1)
            n += 1
            if n == 8:
                data.append(acc)
                if acc == 0xFF:
                    data.append(0)
                acc = n = 0
    return bytes(data)


def _headers(w, h, comps, qtables, huffs, dri=None):
    """Assemble SOI..SOS headers.  comps: [(cid, hv, tq)], huffs:
    [(tag, (bits, values))], qtables: {tq: flat64 int}."""
    from lucene_solr_spark.functions.jpeg import ZIGZAG

    out = bytearray(b"\xff\xd8")
    for tq, q in qtables.items():
        zz = np.zeros(64, dtype=np.uint8)
        zz[:] = np.asarray(q).reshape(64)[ZIGZAG]
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tq]) + bytes(zz)
    if dri:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") + dri.to_bytes(2, "big")
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for cid, hv, tq in comps:
        sof += bytes([cid, hv, tq])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    for tag, (bits, values) in huffs:
        seg = bytes([tag]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + (len(seg) + 2).to_bytes(2, "big") + seg
    sos = bytearray([len(comps)])
    for cid, _hv, _tq in comps:
        tabs = 0x00 if cid == 1 else 0x11
        sos += bytes([cid, tabs])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    return out


def _dc_bits(enc_dc, enc_ac, dc_diff):
    """Huffman bits for one DC-only block (category + magnitude + EOB)."""
    t = 0 if dc_diff == 0 else abs(dc_diff).bit_length()
    code = dc_diff if dc_diff >= 0 else dc_diff + (1 << t) - 1
    bits = [enc_dc[t]]
    if t:
        bits.append((code, t))
    bits.append(enc_ac[0x00])
    return bits


def test_dc_only_block_analytic():
    """Uniform 8×8: pixel == F00·q00/8 + 128 exactly (IDCT closed
    form) — q00=16, F00=16 → 160."""
    _, enc_dc = _canonical_codes(*K3_DC_LUMA)
    _, enc_ac = _canonical_codes(*K3_AC_LUMA)
    out = _headers(
        8, 8, [(1, 0x11, 0)], {0: np.full(64, 16)},
        [(0x00, K3_DC_LUMA), (0x10, K3_AC_LUMA)],
    )
    out += _pack_bits(_dc_bits(enc_dc, enc_ac, 16))
    out += b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    assert img.shape == (8, 8, 3)
    assert np.unique(img).tolist() == [160]


def test_dc_prediction_across_blocks():
    """Two blocks, DC diffs 16 then -8: second block's absolute DC is
    8 → values 160 and 144 (q=16)."""
    _, enc_dc = _canonical_codes(*K3_DC_LUMA)
    _, enc_ac = _canonical_codes(*K3_AC_LUMA)
    out = _headers(
        16, 8, [(1, 0x11, 0)], {0: np.full(64, 16)},
        [(0x00, K3_DC_LUMA), (0x10, K3_AC_LUMA)],
    )
    bits = _dc_bits(enc_dc, enc_ac, 16) + _dc_bits(enc_dc, enc_ac, -8)
    out += _pack_bits(bits) + b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    assert np.unique(img[:, :8]).tolist() == [160]
    assert np.unique(img[:, 8:]).tolist() == [144]


def test_420_subsampled_analytic():
    """16×16 4:2:0: four DC-only luma blocks + one chroma block each;
    expected RGB follows CCIR 601 from the closed-form plane values."""
    _, dl = _canonical_codes(*K3_DC_LUMA)
    _, al = _canonical_codes(*K3_AC_LUMA)
    _, dc = _canonical_codes(*K3_DC_CHROMA)
    _, ac = _canonical_codes(*K3_AC_CHROMA)
    out = _headers(
        16, 16,
        [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)],
        {0: np.full(64, 16), 1: np.full(64, 16)},
        [(0x00, K3_DC_LUMA), (0x10, K3_AC_LUMA),
         (0x01, K3_DC_CHROMA), (0x11, K3_AC_CHROMA)],
    )
    # luma DC diffs 16, 0, 0, 0 → all four blocks Y=160; Cb diff 8 →
    # plane 128+16=144; Cr diff -8 → 128-16=112
    bits = (
        _dc_bits(dl, al, 16) + _dc_bits(dl, al, 0)
        + _dc_bits(dl, al, 0) + _dc_bits(dl, al, 0)
        + _dc_bits(dc, ac, 8) + _dc_bits(dc, ac, -8)
    )
    out += _pack_bits(bits) + b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    assert img.shape == (16, 16, 3)
    y, cb, cr = 160.0, 144.0 - 128.0, 112.0 - 128.0
    exp = [
        round(y + 1.402 * cr),
        round(y - 0.344136 * cb - 0.714136 * cr),
        round(y + 1.772 * cb),
    ]
    got = img[0, 0].astype(int).tolist()
    assert got == exp, (got, exp)
    assert np.all(img == img[0, 0])


def test_restart_markers():
    """DRI=1 with RST0 between MCUs: DC predictor resets, so the
    second block's diff is ABSOLUTE again."""
    _, enc_dc = _canonical_codes(*K3_DC_LUMA)
    _, enc_ac = _canonical_codes(*K3_AC_LUMA)
    out = _headers(
        16, 8, [(1, 0x11, 0)], {0: np.full(64, 16)},
        [(0x00, K3_DC_LUMA), (0x10, K3_AC_LUMA)], dri=1,
    )
    out += _pack_bits(_dc_bits(enc_dc, enc_ac, 16))
    out += b"\xff\xd0"  # RST0
    out += _pack_bits(_dc_bits(enc_dc, enc_ac, 8))
    out += b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    assert np.unique(img[:, :8]).tolist() == [160]
    assert np.unique(img[:, 8:]).tolist() == [144]  # 8*16/8+128


def test_roundtrip_gray_and_color():
    rng = np.random.default_rng(0)
    x = np.linspace(0, 255, 24)
    g = np.clip(
        np.add.outer(x, x) / 2 + rng.normal(0, 3, (24, 24)), 0, 255
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g))
    assert dec.shape == (24, 24, 3)
    err = np.abs(dec[..., 0].astype(int) - g.astype(int))
    assert err.max() <= 40 and err.mean() < 6  # K1-table quant bound
    c = np.stack([g, g[::-1], 255 - g], axis=-1)
    dec = decode_jpeg(encode_jpeg(c))
    err = np.abs(dec.astype(int) - c.astype(int))
    assert err.max() <= 48 and err.mean() < 8


def test_roundtrip_odd_sizes():
    rng = np.random.default_rng(1)
    g = (rng.random((13, 21)) * 255).astype(np.uint8)
    g[:] = np.sort(g, axis=1)  # smooth-ish rows
    dec = decode_jpeg(encode_jpeg(g))
    assert dec.shape == (13, 21, 3)


def test_arithmetic_and_lossless_raise():
    """SOF2 decodes now; the still-unsupported frame types (arithmetic
    coding 0xC9, lossless 0xC3, extended 0xC1) stay loud failures."""
    for marker in (0xC9, 0xC3, 0xC1):
        buf = bytearray(b"\xff\xd8")
        sof = bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0])
        buf += bytes([0xFF, marker]) + (len(sof) + 2).to_bytes(2, "big") + sof
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(buf))


def test_decode_image_dispatches_jpeg():
    from lucene_solr_spark.functions.multimodal import decode_image

    g = np.full((8, 8), 100, dtype=np.uint8)
    img = decode_image(encode_jpeg(g))
    assert img.shape == (8, 8, 3)
    assert abs(int(img[0, 0, 0]) - 100) <= 2


def test_fuzz_corrupt_inputs_fail_cleanly():
    """Truncated/bit-flipped JPEG streams must raise promptly (never
    hang, never return garbage silently on structural damage)."""
    import numpy as np

    rng = np.random.default_rng(9)
    g = (rng.random((16, 16)) * 255).astype(np.uint8)
    good = encode_jpeg(g)
    for cut in (2, 10, len(good) // 2, len(good) - 3):
        try:
            decode_jpeg(good[:cut])
        except (ValueError, NotImplementedError, IndexError, struct.error):
            pass
    for _ in range(50):
        data = bytearray(good)
        for _k in range(3):
            data[rng.integers(2, len(data))] ^= int(rng.integers(1, 256))
        try:
            out = decode_jpeg(bytes(data))
            assert out.dtype == np.uint8  # survived → still well-formed
        except (ValueError, NotImplementedError, IndexError, struct.error):
            pass


def test_non_divisible_sampling_raises():
    """ADVICE r4: a legal SOF0 whose max/component sampling ratio is
    non-integer (3:2) must loud-fail instead of producing wrongly
    scaled planes from the integer-replication upsampler."""
    _, dl = _canonical_codes(*K3_DC_LUMA)
    _, al = _canonical_codes(*K3_AC_LUMA)
    _, dc = _canonical_codes(*K3_DC_CHROMA)
    _, ac = _canonical_codes(*K3_AC_CHROMA)
    out = _headers(
        24, 24,
        [(1, 0x33, 0), (2, 0x22, 1), (3, 0x11, 1)],
        {0: np.full(64, 16), 1: np.full(64, 16)},
        [(0x00, K3_DC_LUMA), (0x10, K3_AC_LUMA),
         (0x01, K3_DC_CHROMA), (0x11, K3_AC_CHROMA)],
    )
    out += _pack_bits(_dc_bits(dl, al, 16)) + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="subsampling"):
        decode_jpeg(bytes(out))


# ---------------------------------------------------------- progressive
def test_progressive_equals_baseline_exactly():
    """decode(progressive(img)) == decode(baseline(img)) bit-exactly:
    both encoders quantize to the SAME coefficients, so the four
    progressive scan kinds (DC first Al=1, spectral-selection AC first,
    DC refinement, AC refinement back to Al=0) must reassemble them
    losslessly.  Noise, gradient, and flat inputs cover dense bands,
    EOB runs spanning blocks, ZRL, and the correction-bit sweep."""
    from lucene_solr_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(3)
    cases = [
        rng.integers(0, 256, (8, 8), dtype=np.uint8),
        rng.integers(0, 256, (17, 13), dtype=np.uint8),
        rng.integers(0, 256, (23, 31, 3), dtype=np.uint8),
        np.full((32, 32), 128, dtype=np.uint8),           # all-EOB
        np.tile(np.arange(48, dtype=np.uint8) * 5, (24, 1)),  # gradient
        np.kron(
            rng.integers(0, 2, (4, 4), dtype=np.uint8) * 255,
            np.ones((8, 8), dtype=np.uint8),
        ),  # flat 8x8 tiles: DC-dominated, sparse AC
    ]
    for img in cases:
        base = decode_jpeg(encode_jpeg(img))
        prog = decode_jpeg(encode_jpeg_progressive(img))
        assert np.array_equal(base, prog), img.shape
    # coarse quantization → sparse high-frequency bands → long EOB runs
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality_scale=6))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality_scale=6))
    assert np.array_equal(base, prog)


def test_progressive_dc_only_analytic():
    """A hand-assembled SOF2 stream with only the two DC scans decodes
    to the closed-form flat value (dc·q00/8 + 128) — the AC bands stay
    zero when their scans are absent (progressive streams are legal
    prefixes of themselves)."""
    from lucene_solr_spark.functions.jpeg import encode_jpeg_progressive

    img = np.full((8, 8), 200, dtype=np.uint8)
    data = encode_jpeg_progressive(img)
    # truncate after the second scan (DC first + everything is fine to
    # decode whole too — here just check the full stream's flat value)
    out = decode_jpeg(data)
    # dc = round((200-128)*8/16)=36 → 36*16/8+128 = 200
    assert np.all(out == 200)


def test_progressive_refinement_changes_result():
    """Dropping the AC refinement scans yields the Al=1 coarse image —
    i.e. the refinement scans carry real information (guards against a
    decoder that silently ignores Ah>0 scans)."""
    from lucene_solr_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    full = decode_jpeg(encode_jpeg_progressive(img))
    data = encode_jpeg_progressive(img)
    # locate SOS markers; keep header + first 3 scans (DC first, two AC
    # first bands for the single component) + EOI
    sos_positions = []
    i = 2
    while i < len(data) - 1:
        if data[i] == 0xFF and data[i + 1] == 0xDA:
            sos_positions.append(i)
        i += 1
    assert len(sos_positions) == 6  # gray: DC, AC(1-5), AC(6-63), DCr, ACr, ACr
    truncated = data[: sos_positions[3]] + b"\xff\xd9"
    coarse = decode_jpeg(truncated)
    assert coarse.shape == full.shape
    assert not np.array_equal(coarse, full)


def test_16bit_quant_table():
    """DQT with Pq=1 (16-bit big-endian elements, §B.4.1): a DC-only
    block against a 16-bit table decodes to the closed-form value
    dc·q00/8 + 128 with q00 = 300 (> 255, unreachable at 8-bit)."""
    _, dl = _canonical_codes(*K3_DC_LUMA)
    _, al = _canonical_codes(*K3_AC_LUMA)
    out = bytearray(b"\xff\xd8")
    q16 = np.full(64, 300, dtype=np.int64)
    from lucene_solr_spark.functions.jpeg import ZIGZAG

    zz = np.zeros(64, dtype=np.int64)
    zz[:] = q16[ZIGZAG]
    payload = bytes([0x10]) + b"".join(
        int(v).to_bytes(2, "big") for v in zz
    )
    out += b"\xff\xdb" + (len(payload) + 2).to_bytes(2, "big") + payload
    sof = bytes([8, 0, 8, 0, 8, 1]) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    for tag, spec in [(0x00, K3_DC_LUMA), (0x10, K3_AC_LUMA)]:
        seg = bytes([tag]) + bytes(spec[0]) + bytes(spec[1])
        out += b"\xff\xc4" + (len(seg) + 2).to_bytes(2, "big") + seg
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    out += _pack_bits(_dc_bits(dl, al, 2)) + b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    # dc=2, q00=300 → 2*300/8 + 128 = 203
    assert np.all(img == 203), img[0, 0]


def test_fill_bytes_before_markers():
    """§B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    A progressive stream with a fill byte injected before every SOS
    must decode IDENTICALLY (regression: the marker loop once parsed
    the second 0xFF as a marker code and swallowed real scans)."""
    from lucene_solr_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = encode_jpeg_progressive(img)
    want = decode_jpeg(data)
    stuffed = bytearray()
    i = 0
    while i < len(data) - 1:
        if data[i] == 0xFF and data[i + 1] == 0xDA:
            stuffed += b"\xff\xff"  # two fill bytes before each SOS
        stuffed.append(data[i])
        i += 1
    stuffed.append(data[-1])
    got = decode_jpeg(bytes(stuffed))
    assert np.array_equal(got, want)
    # fill bytes in a baseline stream too
    base = encode_jpeg(img)
    j = base.index(b"\xff\xda")
    base2 = base[:j] + b"\xff" + base[j:]
    assert np.array_equal(decode_jpeg(base2), decode_jpeg(base))
