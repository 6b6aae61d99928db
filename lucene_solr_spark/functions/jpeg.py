"""Pure-numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Closes the round-3 "compressed image codecs are environment-gated"
partial WITHOUT external libraries: a complete baseline **decoder**
(SOI/APPn/DQT/DHT/DRI/SOF0/SOS parsing, canonical Huffman entropy
decode with byte-unstuffing and restart markers, dequantization,
zigzag, orthonormal 2-D IDCT, chroma upsampling for any h/v ∈ {1,2},
CCIR-601 YCbCr→RGB) plus a minimal baseline **encoder** (grayscale or
4:4:4, Annex-K example quantization + Huffman tables) used by the test
fixtures and the multimodal media synthesizer.

Spec anchors: marker syntax T.81 §B.2, EXTEND §F.2.2.1 (Figure F.12),
DC/AC decode §F.2.2.1-2, canonical Huffman code generation §C.2,
zigzag Figure 5, IDCT §A.3.3, the Annex K.1/K.3 example tables.
Progressive (SOF2), arithmetic coding, and 12-bit precision raise
NotImplementedError loudly — baseline sequential only, like the
original libjpeg's core path.

Correctness evidence (tests/test_jpeg.py): hand-assembled bitstreams
with ANALYTIC expectations (a DC-only block decodes to the closed-form
uniform value F00·q00/8 + 128 — no shared code between expectation and
decoder), encoder↔decoder roundtrips bounded by quantization error,
4:2:0 sampling shapes, and restart-marker streams.
"""

from __future__ import annotations

import math

import numpy as np

# zigzag scan order (T.81 Figure 5): zz index -> (row, col) flat index
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8x8 DCT basis: F = A f A^T (forward), f = A^T F A (inverse)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = math.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * math.cos((2 * _x + 1) * _u * math.pi / 16)

# Annex K.1 example quantization tables (luminance / chrominance)
K1_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
K1_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 example Huffman specs: (bits[1..16], values)
K3_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
K3_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
K3_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
K3_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _canonical_codes(bits: list[int], values: list[int]):
    """T.81 §C.2 canonical code assignment: {(length, code): symbol}
    for decode and {symbol: (code, length)} for encode."""
    dec: dict[tuple[int, int], int] = {}
    enc: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = values[k]
            dec[(length, code)] = sym
            enc[sym] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return dec, enc


def _extend(v: int, t: int) -> int:
    """EXTEND (T.81 Figure F.12): map a t-bit magnitude to its signed
    value."""
    if t == 0:
        return 0
    return v - ((1 << t) - 1) if v < (1 << (t - 1)) else v


class _BitReader:
    """MSB-first bit reader over entropy-coded bytes with 0xFF00
    unstuffing; RSTn markers are handled by the caller via
    ``align_to_marker``."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.i = start
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.i >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.i]
            if b == 0xFF:
                nxt = self.data[self.i + 1] if self.i + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.i += 2
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                # a real marker: feed zeros, do not consume
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            self.i += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, t: int) -> int:
        v = 0
        for _ in range(t):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, dec: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = dec.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def restart(self) -> None:
        """Skip to just past the next RSTn marker, resetting alignment."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.i + 1 < len(d):
            if d[self.i] == 0xFF and 0xD0 <= d[self.i + 1] <= 0xD7:
                self.i += 2
                return
            self.i += 1
        raise ValueError("expected restart marker")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (H, W, 3) RGB uint8 (grayscale replicated
    across channels)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = (data[i + 2] << 8) | data[i + 3]
        seg = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(seg[j + 1 : j + 65], dtype=np.uint8)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zz
                qt[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nsym = sum(bits)
                values = list(seg[j + 17 : j + 17 + nsym])
                dec, _ = _canonical_codes(bits, values)
                (huff_ac if tc else huff_dc)[th] = dec
                j += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            ncomp = seg[5]
            if not (1 <= ncomp <= 4) or h == 0 or w == 0:
                raise ValueError("corrupt SOF0 dimensions/components")
            comps = []
            for c in range(ncomp):
                cid = seg[6 + c * 3]
                hv = seg[7 + c * 3]
                hh, vv = hv >> 4, hv & 0x0F
                if not (1 <= hh <= 4 and 1 <= vv <= 4):
                    raise ValueError(f"corrupt sampling factors {hv:#x}")
                comps.append(
                    {"id": cid, "h": hh, "v": vv, "tq": seg[8 + c * 3]}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline SOF marker 0xFF{marker:02X} (progressive/"
                "arithmetic/lossless) — baseline sequential only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = {}
            for c in range(ns):
                scan[seg[1 + c * 2]] = (
                    seg[2 + c * 2] >> 4,
                    seg[2 + c * 2] & 0x0F,
                )
            i = i + 2 + seg_len
            return _decode_scan(
                data, i, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        i += 2 + seg_len
    raise ValueError("no SOS marker found")


def _decode_scan(data, start, frame, scan, qt, huff_dc, huff_ac, dri):
    if frame is None:
        raise ValueError("SOS before SOF0")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    for c in comps:
        if c["id"] not in scan:
            raise ValueError(f"scan missing component {c['id']}")
        td, ta = scan[c["id"]]
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError("scan references a missing Huffman table")
        if c["tq"] not in qt:
            raise ValueError("frame references a missing quant table")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        # the integer-replication upsampler needs hmax/vmax to be
        # exact multiples of every component's factors; a legal but
        # non-divisible stream (e.g. 3:2) must loud-fail, not produce
        # wrongly-scaled planes
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                f"non-integer chroma subsampling ratio (h={c['h']}/"
                f"{hmax}, v={c['v']}/{vmax}) is not supported"
            )
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
        )
    br = _BitReader(data, start)
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and n_mcu and n_mcu % dri == 0:
                br.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = br.decode_huff(huff_dc[td])
                        if t > 15:
                            raise ValueError(
                                f"corrupt DC category {t} (spec max 15)"
                            )
                        diff = _extend(br.receive(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.decode_huff(huff_ac[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.int64)
                        blk[ZIGZAG] = zz
                        F = (blk.reshape(8, 8) * q).astype(np.float64)
                        f = _A.T @ F @ _A + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = f
            n_mcu += 1
    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits (§F.1.2.3)


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit code) for a signed value (§F.1.2.1.1)."""
    t = 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


def encode_jpeg(img: np.ndarray, quality_scale: int = 1) -> bytes:
    """(H, W) grayscale or (H, W, 3) RGB uint8 → baseline JPEG bytes
    (grayscale 1-component or 4:4:4 color; Annex-K tables scaled by
    ``quality_scale``, 1 = the example tables, larger = coarser)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = np.clip(K1_LUMA * quality_scale, 1, 255).reshape(8, 8)
    qc = np.clip(K1_CHROMA * quality_scale, 1, 255).reshape(8, 8)
    if gray:
        planes = [img.astype(np.float64)]
        qts = [qy]
        comp_q = [0]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qts = [qy, qc]
        comp_q = [0, 1, 1]

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate(qts):
        zz = np.zeros(64, dtype=np.uint8)
        zz[:] = q.reshape(64)[ZIGZAG]
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tq]) + bytes(zz)
    ncomp = 1 if gray else 3
    sof = bytearray()
    sof += bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, comp_q[c]])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof

    specs = [(0x00, K3_DC_LUMA), (0x10, K3_AC_LUMA)]
    if not gray:
        specs += [(0x01, K3_DC_CHROMA), (0x11, K3_AC_CHROMA)]
    encs = {}
    for tag, (bits, values) in specs:
        _, enc = _canonical_codes(bits, values)
        encs[tag] = enc
        seg = bytes([tag]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + (len(seg) + 2).to_bytes(2, "big") + seg

    sos = bytearray([ncomp])
    for c in range(ncomp):
        tabs = 0x00 if c == 0 else 0x11
        sos += bytes([c + 1, tabs])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    bw = _BitWriter()
    pred = [0] * ncomp
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    padded = []
    for p in planes:
        pp = np.empty((bh * 8, bwid * 8))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1 : h, :]
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)
    for by in range(bh):
        for bx in range(bwid):
            for ci in range(ncomp):
                q = qts[comp_q[ci]]
                dc_enc = encs[0x00 if ci == 0 else 0x01]
                ac_enc = encs[0x10 if ci == 0 else 0x11]
                blk = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                F = _A @ (blk - 128.0) @ _A.T
                coef = np.round(F / q).astype(np.int64)
                zz = coef.reshape(64)[ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t, code = _magnitude(diff)
                c0, l0 = dc_enc[t]
                bw.write(c0, l0)
                if t:
                    bw.write(code, t)
                run = 0
                last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        czrl, lzrl = ac_enc[0xF0]
                        bw.write(czrl, lzrl)
                        run -= 16
                    t, code = _magnitude(v)
                    ca, la = ac_enc[(run << 4) | t]
                    bw.write(ca, la)
                    bw.write(code, t)
                    run = 0
                if last_nz < 63:
                    ceob, leob = ac_enc[0x00]
                    bw.write(ceob, leob)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
