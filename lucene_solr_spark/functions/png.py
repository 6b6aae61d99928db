"""Pure-Python PNG codec (RFC 2083 / ISO 15948) over stdlib zlib.

Closes the PNG half of the compressed-image exclusion: the DEFLATE
layer is Python's built-in ``zlib`` (stdlib, not a third-party
dependency), so what a PNG codec actually adds — chunk framing, CRCs,
scanline serialization, and the five reconstruction filters
(None/Sub/Up/Average/Paeth) — is implemented here in numpy.

Decoder: 8-bit greyscale (0), truecolour (2), indexed (3, via PLTE),
grey+alpha (4) and RGBA (6), non-interlaced.  Interlaced (Adam7) and
16-bit depths raise NotImplementedError loudly.  Encoder: 8-bit RGB /
greyscale, filter type configurable (default Paeth) — used by the test
fixtures and media synthesizer.

Spec anchors: chunk layout §5.3, IHDR §11.2.2, filter algorithms
§9 (Paeth predictor §9.4), CRC-32 §5.5 (stdlib ``zlib.crc32``).

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
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth} (8 only)")
            if interlace:
                raise NotImplementedError("Adam7 interlacing")
            if comp or filt:
                raise ValueError("unknown compression/filter method")
            ihdr = (w, h, ctype)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        i += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, ctype = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise NotImplementedError(f"colour type {ctype}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size does not match dimensions")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8)
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
    px = out.reshape(h, w, channels)
    if ctype == 0:
        g = px[..., 0]
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


def encode_png(img: np.ndarray, filter_type: int = 4) -> bytes:
    """(H, W, 3) RGB or (H, W) grey uint8 → PNG bytes (lossless).
    ``filter_type``: 0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth — applied
    to every scanline (fixed, not adaptive)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    channels = 1 if gray else 3
    ctype = 0 if gray else 2
    px = img.reshape(h, w * channels).astype(np.uint8)
    bpp = channels
    lines = bytearray()
    zero = np.zeros(w * channels, dtype=np.uint8)
    for y in range(h):
        cur = px[y].astype(np.int64)
        prev = px[y - 1].astype(np.int64) if y else zero.astype(np.int64)
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
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), 9))
        + _chunk(b"IEND", b"")
    )
