"""Pure-Python PNG codec (RFC 2083 / ISO 15948) over stdlib zlib.

Closes the PNG half of the compressed-image exclusion: the DEFLATE
layer is Python's built-in ``zlib`` (stdlib, not a third-party
dependency), so what a PNG codec actually adds — chunk framing, CRCs,
scanline serialization, and the five reconstruction filters
(None/Sub/Up/Average/Paeth) — is implemented here in numpy.

Decoder: every legal IHDR combination — greyscale (0) at depths
1/2/4/8/16, truecolour (2) at 8/16, indexed (3, via PLTE) at 1/2/4/8,
grey+alpha (4) and RGBA (6) at 8/16 — both non-interlaced and Adam7
interlaced (§8.2: seven passes, each an independently filtered
sub-image, composited on the 8×8 pattern grid).  16-bit samples reduce
to 8-bit by the high byte; sub-byte greyscale samples scale by
255/(2^d−1) (exact integers for d ∈ {1,2,4}).  Encoder: 8-bit RGB /
greyscale, filter type configurable (default Paeth), optional Adam7
output — used by the test fixtures and media synthesizer.

Spec anchors: chunk layout §5.3, IHDR §11.2.2, interlace §8.2, filter
algorithms §9 (filter-unit bpp = max(1, channels·depth/8) §9.2, Paeth
predictor §9.4), CRC-32 §5.5 (stdlib ``zlib.crc32``).

Correctness evidence (tests/test_png.py): per-filter hand-built
scanline fixtures with closed-form reconstructions (each filter's
inverse applied to known bytes), encoder↔decoder exact roundtrips
(PNG is lossless), palette + alpha paths, and a CRC-corruption check.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (§9.4), vectorized; a=left, b=up, c=up-left."""
    p = a.astype(np.int64) + b.astype(np.int64) - c.astype(np.int64)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


# Adam7 pass grid (§8.2): (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)

_LEGAL_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                 4: (8, 16), 6: (8, 16)}


def _unfilter(raw: bytes, pos: int, h: int, stride: int, bpp: int):
    """Reverse the §9 scanline filters for one (sub-)image of ``h``
    rows × ``stride`` filtered bytes; returns (rows, new_pos)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8)
        if len(line) != stride:
            raise ValueError("IDAT truncated")
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = (line.astype(np.int64) + prev) % 256
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
            cur = np.zeros(stride, dtype=np.uint8)
            ln = line.astype(np.int64)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                if ftype == 1:
                    cur[x] = (ln[x] + a) % 256
                elif ftype == 3:
                    cur[x] = (ln[x] + (a + int(prev[x])) // 2) % 256
                else:
                    b = int(prev[x])
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (ln[x] + pred) % 256
            out[y] = cur
        else:
            raise ValueError(f"unknown filter type {ftype}")
    return out, pos


def _rows_to_samples(
    rows: np.ndarray, w: int, channels: int, depth: int
) -> np.ndarray:
    """(h, stride) unfiltered bytes → (h, w, channels) uint8 samples.
    16-bit reduces by the high byte; 1/2/4-bit unpack MSB-first."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        return (
            rows[:, : w * channels * 2]
            .reshape(h, w, channels, 2)[..., 0]
            .copy()
        )
    bits = np.unpackbits(rows, axis=1)
    per = bits.shape[1] // depth
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    samples = (bits[:, : per * depth].reshape(h, per, depth) * weights).sum(
        axis=2, dtype=np.int64
    )
    return samples[:, :w].astype(np.uint8).reshape(h, w, 1)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, 3) RGB uint8 (alpha dropped after
    compositing-free extraction; greyscale replicated)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    i = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while i < len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + length]
        crc = struct.unpack(">I", data[i + 8 + length : i + 12 + length])[0]
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if ctype not in _LEGAL_DEPTHS:
                raise NotImplementedError(f"colour type {ctype}")
            if depth not in _LEGAL_DEPTHS[ctype]:
                raise ValueError(
                    f"illegal depth {depth} for colour type {ctype}"
                )
            if interlace not in (0, 1):
                raise ValueError(f"unknown interlace method {interlace}")
            if comp or filt:
                raise ValueError("unknown compression/filter method")
            ihdr = (w, h, ctype, depth, interlace)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        i += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, ctype, depth, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(bytes(idat))
    bpp = max(1, channels * depth // 8)  # filter unit, §9.2

    def _stride(wp: int) -> int:
        return (wp * channels * depth + 7) // 8

    px = np.zeros((h, w, channels), dtype=np.uint8)
    if interlace == 0:
        rows, pos = _unfilter(raw, 0, h, _stride(w), bpp)
        if pos != len(raw):
            raise ValueError("IDAT size does not match dimensions")
        px = _rows_to_samples(rows, w, channels, depth)
    else:
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            rows, pos = _unfilter(raw, pos, hp, _stride(wp), bpp)
            px[y0::dy, x0::dx] = _rows_to_samples(rows, wp, channels, depth)
        if pos != len(raw):
            raise ValueError("IDAT size does not match pass layout")
    if ctype == 0:
        g = px[..., 0]
        if depth < 8:  # exact: 255/(2^d−1) is an integer for d∈{1,2,4}
            g = (g.astype(np.int64) * (255 // ((1 << depth) - 1))).astype(
                np.uint8
            )
        return np.stack([g, g, g], axis=-1)
    if ctype == 2:
        return px.copy()
    if ctype == 3:
        if plte is None:
            raise ValueError("indexed PNG without PLTE")
        return plte[px[..., 0]]
    if ctype == 4:
        g = px[..., 0]
        return np.stack([g, g, g], axis=-1)
    return px[..., :3].copy()  # RGBA → RGB


def _filter_image(px: np.ndarray, channels: int, filter_type: int) -> bytes:
    """Apply one fixed §9 filter to every scanline of an (h, w·ch)
    sample grid; returns the filtered byte stream (type byte + line)."""
    h = px.shape[0]
    bpp = channels
    lines = bytearray()
    zero = np.zeros(px.shape[1], dtype=np.int64)
    for y in range(h):
        cur = px[y].astype(np.int64)
        prev = px[y - 1].astype(np.int64) if y else zero
        left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            enc = cur - (left + prev) // 2
        elif filter_type == 4:
            pred = _paeth(
                left.astype(np.uint8),
                prev.astype(np.uint8),
                upleft.astype(np.uint8),
            ).astype(np.int64)
            enc = cur - pred
        else:
            raise ValueError(f"filter type {filter_type}")
        lines.append(filter_type)
        lines += (enc % 256).astype(np.uint8).tobytes()
    return bytes(lines)


def encode_png(
    img: np.ndarray, filter_type: int = 4, interlace: bool = False
) -> bytes:
    """(H, W, 3) RGB or (H, W) grey uint8 → PNG bytes (lossless).
    ``filter_type``: 0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth — applied
    to every scanline (fixed, not adaptive).  ``interlace`` writes the
    Adam7 layout (each pass filtered independently, §8.2)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    channels = 1 if gray else 3
    ctype = 0 if gray else 2
    grid = img.reshape(h, w, channels).astype(np.uint8)
    if interlace:
        lines = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = grid[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            hp, wp = sub.shape[:2]
            lines += _filter_image(
                sub.reshape(hp, wp * channels), channels, filter_type
            )
        body = bytes(lines)
    else:
        body = _filter_image(
            grid.reshape(h, w * channels), channels, filter_type
        )
    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, ctype, 0, 0, 1 if interlace else 0
    )
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(body, 9))
        + _chunk(b"IEND", b"")
    )
