"""PNG codec tests (functions/png.py): per-filter hand-built scanline
fixtures with closed-form reconstructions, lossless roundtrips, and
chunk-integrity behavior."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from lucene_solr_spark.functions.png import _chunk, decode_png, encode_png

SIG = b"\x89PNG\r\n\x1a\n"


def _build_png(w, h, ctype, raw_scanlines, plte=None):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", bytes(plte))
    out += _chunk(b"IDAT", zlib.compress(raw_scanlines))
    out += _chunk(b"IEND", b"")
    return out


def test_filter_reconstruction_closed_form():
    """Each filter decoded against the spec's Recon() equations applied
    by hand to tiny known scanlines (grayscale, 4px wide)."""
    # row0 filter None: [10, 20, 30, 40]
    # row1 filter Sub:  enc [5, 5, 5, 5]  -> [5, 10, 15, 20]
    # row2 filter Up:   enc [1, 1, 1, 1]  -> [6, 11, 16, 21]
    # row3 filter Avg:  enc [0, 0, 0, 0]  -> x0=6//2=3, then
    #                   x1=(3+11)//2=7, x2=(7+16)//2=11, x3=(11+21)//2=16
    # row4 filter Paeth: enc [0,0,0,0] -> predictor picks nearest of
    #                   (left, up, upleft); x0: a=0,b=3,c=0 -> b=3;
    #                   x1: a=3,b=7,c=3 -> p=7,pb=0 -> 7; x2 -> 11; x3 -> 16
    raw = bytes(
        [0, 10, 20, 30, 40]
        + [1, 5, 5, 5, 5]
        + [2, 1, 1, 1, 1]
        + [3, 0, 0, 0, 0]
        + [4, 0, 0, 0, 0]
    )
    img = decode_png(_build_png(4, 5, 0, raw))
    g = img[..., 0]
    assert g[0].tolist() == [10, 20, 30, 40]
    assert g[1].tolist() == [5, 10, 15, 20]
    assert g[2].tolist() == [6, 11, 16, 21]
    assert g[3].tolist() == [3, 7, 11, 16]
    assert g[4].tolist() == [3, 7, 11, 16]
    assert np.array_equal(img[..., 0], img[..., 2])  # grey replicated


def test_palette_and_rgba():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    raw = bytes([0, 0, 1, 2])  # one row, indices 0,1,2
    img = decode_png(_build_png(3, 1, 3, raw, plte=plte))
    assert img[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    # RGBA: alpha dropped
    raw = bytes([0, 9, 8, 7, 250, 1, 2, 3, 0])
    img = decode_png(_build_png(2, 1, 6, raw))
    assert img[0].tolist() == [[9, 8, 7], [1, 2, 3]]


def test_roundtrip_lossless_all_filters():
    rng = np.random.default_rng(5)
    img = (rng.random((17, 23, 3)) * 255).astype(np.uint8)
    for ft in range(5):
        dec = decode_png(encode_png(img, filter_type=ft))
        assert np.array_equal(dec, img), f"filter {ft}"
    g = (rng.random((9, 9)) * 255).astype(np.uint8)
    dec = decode_png(encode_png(g))
    assert np.array_equal(dec[..., 0], g)


def test_crc_corruption_detected():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_png(img))
    data[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_adam7_roundtrip_lossless():
    """Adam7 interlaced encode → decode is bit-lossless for every
    filter type, including dims not multiples of 8 (passes with empty
    sub-grids contribute no bytes, §8.2)."""
    rng = np.random.default_rng(5)
    for hw in [(16, 16), (13, 9), (7, 5), (3, 2), (1, 1), (2, 10)]:
        c = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
        g = rng.integers(0, 256, hw, dtype=np.uint8)
        for ft in range(5):
            got = decode_png(encode_png(c, filter_type=ft, interlace=True))
            assert np.array_equal(got, c), (hw, ft)
            gg = decode_png(encode_png(g, filter_type=ft, interlace=True))
            assert np.array_equal(gg[..., 0], g), (hw, ft)
    # interlaced output really differs from sequential at the byte level
    assert encode_png(c, interlace=True) != encode_png(c)


def test_16bit_high_byte_reduction():
    """16-bit samples reduce to their high byte: a hand-built 2×2
    16-bit grey image and a 1×2 16-bit RGB image decode exactly."""
    vals = [0x1234, 0x00FF, 0xFF00, 0xABCD]
    lines = b"\x00" + struct.pack(">HH", *vals[:2])
    lines += b"\x00" + struct.pack(">HH", *vals[2:])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    png = (
        SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines)) + _chunk(b"IEND", b"")
    )
    img = decode_png(png)
    assert img[..., 0].flatten().tolist() == [v >> 8 for v in vals]
    rgb = [0x0102, 0x8081, 0xFFFE, 0x0001, 0x4040, 0xC0C0]
    lines = b"\x00" + struct.pack(">6H", *rgb)
    ihdr = struct.pack(">IIBBBBB", 2, 1, 16, 2, 0, 0, 0)
    png = (
        SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines)) + _chunk(b"IEND", b"")
    )
    img = decode_png(png)
    assert img.flatten().tolist() == [v >> 8 for v in rgb]


def test_subbyte_depths_grey_and_palette():
    """1/2/4-bit greyscale scale by exactly 255/(2^d−1); 4-bit palette
    indexes unpack MSB-first."""
    # 1-bit grey, 10 px wide: bits 1010101010 + 6 pad bits, 1 row
    lines = b"\x00" + bytes([0b10101010, 0b10000000])
    ihdr = struct.pack(">IIBBBBB", 10, 1, 1, 0, 0, 0, 0)
    png = (
        SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines)) + _chunk(b"IEND", b"")
    )
    img = decode_png(png)
    assert img[0, :, 0].tolist() == [255, 0] * 5
    # 2-bit grey: samples 0,1,2,3 → 0,85,170,255
    lines = b"\x00" + bytes([0b00011011])
    ihdr = struct.pack(">IIBBBBB", 4, 1, 2, 0, 0, 0, 0)
    png = (
        SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines)) + _chunk(b"IEND", b"")
    )
    assert decode_png(png)[0, :, 0].tolist() == [0, 85, 170, 255]
    # 4-bit grey: 0x0 → 0, 0xF → 255, 0x8 → 136 (8·17)
    lines = b"\x00" + bytes([0x0F, 0x80])
    ihdr = struct.pack(">IIBBBBB", 3, 1, 4, 0, 0, 0, 0)
    png = (
        SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines)) + _chunk(b"IEND", b"")
    )
    assert decode_png(png)[0, :, 0].tolist() == [0, 255, 136]
    # 4-bit palette: indexes 1,0,2 against a 3-colour PLTE
    plte = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])
    lines = b"\x00" + bytes([0x10, 0x20])
    ihdr = struct.pack(">IIBBBBB", 3, 1, 4, 3, 0, 0, 0)
    png = (
        SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(lines)) + _chunk(b"IEND", b"")
    )
    assert decode_png(png)[0].tolist() == [
        [40, 50, 60], [10, 20, 30], [70, 80, 90],
    ]


def test_illegal_depth_combo_rejected():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0)  # 4-bit RGB
    with pytest.raises(ValueError, match="illegal depth"):
        decode_png(SIG + _chunk(b"IHDR", ihdr))
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 3, 0, 0, 0)  # 16-bit PLTE
    with pytest.raises(ValueError, match="illegal depth"):
        decode_png(SIG + _chunk(b"IHDR", ihdr))


def test_decode_image_dispatches_png():
    from lucene_solr_spark.functions.multimodal import decode_image

    img = np.full((6, 5, 3), 77, dtype=np.uint8)
    out = decode_image(encode_png(img))
    assert np.array_equal(out, img)


def test_fuzz_corrupt_inputs_fail_cleanly():
    import zlib as _z

    rng = np.random.default_rng(9)
    img = (rng.random((12, 12, 3)) * 255).astype(np.uint8)
    good = encode_png(img)
    for cut in (4, 12, len(good) // 2, len(good) - 2):
        with pytest.raises(
            (ValueError, NotImplementedError, _z.error, struct.error,
             IndexError)
        ):
            decode_png(good[:cut])
    for _ in range(50):
        data = bytearray(good)
        for _k in range(3):
            data[rng.integers(8, len(data))] ^= int(rng.integers(1, 256))
        try:
            decode_png(bytes(data))
        except (ValueError, NotImplementedError, _z.error, struct.error,
                IndexError):
            pass
