"""Pure-numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Closes the round-3 "compressed image codecs are environment-gated"
partial WITHOUT external libraries: a complete baseline **decoder**
(SOI/APPn/DQT/DHT/DRI/SOF0/SOS parsing, canonical Huffman entropy
decode with byte-unstuffing and restart markers, dequantization,
zigzag, orthonormal 2-D IDCT, chroma upsampling for any h/v ∈ {1,2},
CCIR-601 YCbCr→RGB), a **progressive decoder** (SOF2, round 5: all
four §G scan kinds — DC first/refinement, spectral-selection AC first
with EOB-run coding, and the §G.1.2.3 AC correction-bit refinement —
accumulated in per-component coefficient grids and IDCT'd at EOI),
plus baseline and progressive **encoders** (grayscale or 4:4:4,
Annex-K example tables; the progressive scan script exercises every
scan kind) used by the test fixtures and the media synthesizer.

Spec anchors: marker syntax T.81 §B.2, EXTEND §F.2.2.1 (Figure F.12),
DC/AC decode §F.2.2.1-2, progressive control §G.1.2 (EOB runs
§G.1.2.2, successive approximation §G.1.2.3), canonical Huffman code
generation §C.2, zigzag Figure 5, IDCT §A.3.3, the Annex K.1/K.3
example tables.  Arithmetic coding, lossless/extended frames, and
12-bit precision raise NotImplementedError loudly.

Correctness evidence (tests/test_jpeg.py): hand-assembled bitstreams
with ANALYTIC expectations (a DC-only block decodes to the closed-form
uniform value F00·q00/8 + 128 — no shared code between expectation and
decoder), encoder↔decoder roundtrips bounded by quantization error,
4:2:0 sampling shapes, restart-marker streams, and the progressive
gate: decode(progressive(img)) == decode(baseline(img)) BIT-EXACTLY
(both quantize to identical coefficients), over dense/sparse/flat
inputs, plus a truncated-scan check that refinement scans carry real
information.
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
        if i + 1 >= len(data):
            break
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte before a marker (§B.1.1.2)
            i += 1
            continue
        if marker == 0x00:  # stuffed 0xFF00 residue — entropy data
            i += 2
            continue
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
                if pq not in (0, 1):
                    raise ValueError(f"corrupt DQT precision {pq}")
                if pq:  # Pq=1: 16-bit big-endian elements (§B.4.1)
                    zz = np.frombuffer(
                        seg[j + 1 : j + 129], dtype=">u2"
                    ).astype(np.int64)
                else:
                    zz = np.frombuffer(seg[j + 1 : j + 65], dtype=np.uint8)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zz
                qt[tq] = tbl.reshape(8, 8)
                j += 129 if pq else 65
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            ncomp = seg[5]
            if not (1 <= ncomp <= 4) or h == 0 or w == 0:
                raise ValueError("corrupt SOF dimensions/components")
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
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
            if marker == 0xC2:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
                # zigzag-order coefficient grids, MCU-padded, filled
                # across scans and IDCT'd only at EOI
                coef = [
                    np.zeros(
                        (mcus_y * c["v"], mcus_x * c["h"], 64),
                        dtype=np.int64,
                    )
                    for c in comps
                ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported SOF marker 0xFF{marker:02X} (extended/"
                "arithmetic/lossless) — baseline sequential and "
                "progressive Huffman only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            if frame is None:
                raise ValueError("SOS before SOF")
            if not frame["progressive"]:
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
            by_id = {c["id"]: ci for ci, c in enumerate(frame["comps"])}
            scan_list = []
            for c in range(ns):
                cs = seg[1 + c * 2]
                if cs not in by_id:
                    raise ValueError(f"scan references unknown comp {cs}")
                scan_list.append(
                    (by_id[cs], seg[2 + c * 2] >> 4, seg[2 + c * 2] & 0x0F)
                )
            ss, se = seg[1 + ns * 2], seg[2 + ns * 2]
            ahal = seg[3 + ns * 2]
            i = _decode_progressive_scan(
                data, i + 2 + seg_len, frame, scan_list, ss, se,
                ahal >> 4, ahal & 0x0F, huff_dc, huff_ac,
                restart_interval, coef,
            )
            continue
        i += 2 + seg_len
    if frame is not None and frame.get("progressive"):
        return _reconstruct_progressive(frame, coef, qt)
    raise ValueError("no SOS marker found")


def _decode_progressive_scan(
    data, start, frame, scan_list, ss, se, ah, al, huff_dc, huff_ac,
    dri, coef,
):
    """One progressive scan (T.81 §G.2): updates the zigzag-order
    coefficient grids in place, returns the stream position after the
    scan's entropy data.

    Four scan kinds: DC first (Ss=0, Ah=0 — diff decode, values <<Al,
    §G.1.2.1), DC refinement (Ah>0 — one bit per block), AC first
    (Ss>0, Ah=0 — EOB-run coding, §G.1.2.2), AC refinement (Ah>0 — the
    §G.1.2.3 correction-bit algorithm).  DC scans may interleave
    several components in MCU order; AC scans are single-component in
    the component's own block raster (§A.2.2).  Restart markers reset
    DC predictors AND the EOB run."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    br = _BitReader(data, start)
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        for ci, td, _ in scan_list:
            if ah == 0 and td not in huff_dc:
                raise ValueError("scan references a missing DC table")
        pred = [0] * len(scan_list)
        if len(scan_list) > 1:
            # interleaved MCU order
            n_mcu = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if dri and n_mcu and n_mcu % dri == 0:
                        br.restart()
                        pred = [0] * len(scan_list)
                    for si, (ci, td, _) in enumerate(scan_list):
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = coef[ci][
                                    my * c["v"] + by, mx * c["h"] + bx
                                ]
                                pred[si] = _dc_step(
                                    br, huff_dc.get(td), blk, ah, al,
                                    pred[si],
                                )
                    n_mcu += 1
        else:
            ci, td, _ = scan_list[0]
            c = comps[ci]
            cbw = ((w * c["h"] + hmax - 1) // hmax + 7) // 8
            cbh = ((h * c["v"] + vmax - 1) // vmax + 7) // 8
            n_blk = 0
            for by in range(cbh):
                for bx in range(cbw):
                    if dri and n_blk and n_blk % dri == 0:
                        br.restart()
                        pred = [0]
                    pred[0] = _dc_step(
                        br, huff_dc.get(td), coef[ci][by, bx], ah, al,
                        pred[0],
                    )
                    n_blk += 1
        return br.i
    # AC scan: exactly one component (§B.2.3)
    if len(scan_list) != 1:
        raise ValueError("progressive AC scan must be single-component")
    ci, _, ta = scan_list[0]
    if ta not in huff_ac:
        raise ValueError("scan references a missing AC table")
    c = comps[ci]
    cbw = ((w * c["h"] + hmax - 1) // hmax + 7) // 8
    cbh = ((h * c["v"] + vmax - 1) // vmax + 7) // 8
    dec = huff_ac[ta]
    eobrun = 0
    n_blk = 0
    for by in range(cbh):
        for bx in range(cbw):
            if dri and n_blk and n_blk % dri == 0:
                br.restart()
                eobrun = 0
            blk = coef[ci][by, bx]
            if ah == 0:
                eobrun = _ac_first(br, dec, blk, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(br, dec, blk, ss, se, al, eobrun)
            n_blk += 1
    return br.i


def _dc_step(br, dec, blk, ah, al, pred):
    """One block of a DC scan; returns the updated predictor."""
    if ah == 0:
        t = br.decode_huff(dec)
        if t > 15:
            raise ValueError(f"corrupt DC category {t} (spec max 15)")
        pred += _extend(br.receive(t), t)
        blk[0] = pred << al
    else:
        if br.read_bit():
            blk[0] |= 1 << al
    return pred


def _ac_first(br, dec, blk, ss, se, al, eobrun):
    """AC first pass (§G.1.2.2): EOB-run coded, values scaled <<Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode_huff(dec)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("AC coefficient index past Se")
        blk[k] = _extend(br.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine(br, dec, blk, ss, se, al, eobrun):
    """AC refinement pass — the §G.1.2.3 correction-bit algorithm:
    already-nonzero coefficients absorb one correction bit each as the
    band is traversed; zero-history positions consume the run counts
    and newly-nonzero coefficients arrive with magnitude 1."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode_huff(dec)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # r == 15: run of 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError(
                        "AC refinement symbol with size != 1"
                    )
                newval = p1 if br.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if br.read_bit():
                        if (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if br.read_bit():
                    if (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, coef, qt):
    """Dequantize + IDCT the accumulated coefficient grids (EOI)."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            raise ValueError("frame references a missing quant table")
        q = qt[c["tq"]]
        bh, bw = coef[ci].shape[:2]
        plane = np.zeros((bh * 8, bw * 8))
        for by in range(bh):
            for bx in range(bw):
                blk = np.zeros(64, dtype=np.int64)
                blk[ZIGZAG] = coef[ci][by, bx]
                F = (blk.reshape(8, 8) * q).astype(np.float64)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _A.T @ F @ _A + 128.0
                )
        planes.append(plane)
    return _planes_to_rgb(planes, comps, h, w, hmax, vmax)


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
    return _planes_to_rgb(planes, comps, h, w, hmax, vmax)


def _planes_to_rgb(planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Upsample component planes to full resolution, crop, and apply
    CCIR-601 YCbCr→RGB (greyscale replicated)."""
    for c in comps:
        # shared guard for BOTH decode paths (baseline checks early in
        # _decode_scan too): the integer-replication upsampler needs
        # exact factor multiples — a 3:2 stream must loud-fail here,
        # not silently mis-scale a progressive reconstruction
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                f"non-integer chroma subsampling ratio (h={c['h']}/"
                f"{hmax}, v={c['v']}/{vmax}) is not supported"
            )
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


# ------------------------------------------------- progressive encoder
def _trunc_shift(v: int, al: int) -> int:
    """Point-transform for AC first passes (§G.1.2.1): divide by 2^Al
    truncating toward ZERO (DC uses arithmetic shift instead)."""
    t = abs(int(v)) >> al
    return -t if v < 0 else t


def _emit_ac_first(bw, enc, grid, ss, se, al):
    """AC first pass for one component band: run/size coding with
    EOB-run accumulation (the encoder dual of _ac_first)."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            c, l = enc[nbits << 4]
            bw.write(c, l)
            if nbits:
                bw.write(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0

    bh, bwid = grid.shape[:2]
    for by in range(bh):
        for bx in range(bwid):
            zz = grid[by, bx]
            r = 0
            for k in range(ss, se + 1):
                t = _trunc_shift(zz[k], al)
                if t == 0:
                    r += 1
                    continue
                flush_eob()
                while r > 15:
                    c, l = enc[0xF0]
                    bw.write(c, l)
                    r -= 16
                s, code = _magnitude(t)
                c, l = enc[(r << 4) | s]
                bw.write(c, l)
                bw.write(code, s)
                r = 0
            if r > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()


def _emit_ac_refine(bw, enc, grid, ss, se, al):
    """AC refinement pass — encoder dual of _ac_refine: correction
    bits for history-nonzero coefficients ride along with the symbols
    (or the EOB run) that cover their positions."""
    eobrun = 0
    pend: list[int] = []  # correction bits buffered with the EOB run

    def flush_eob():
        nonlocal eobrun, pend
        if eobrun:
            nbits = eobrun.bit_length() - 1
            c, l = enc[nbits << 4]
            bw.write(c, l)
            if nbits:
                bw.write(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0
        for b in pend:
            bw.write(b, 1)
        pend = []

    bh, bwid = grid.shape[:2]
    for by in range(bh):
        for bx in range(bwid):
            zz = grid[by, bx]
            absv = [abs(_trunc_shift(zz[k], al)) for k in range(ss, se + 1)]
            eob_k = ss - 1  # last newly-nonzero position in this pass
            for k in range(ss, se + 1):
                if absv[k - ss] == 1:
                    eob_k = k
            r = 0
            br_bits: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob_k:
                    flush_eob()
                    c, l = enc[0xF0]
                    bw.write(c, l)
                    r -= 16
                    for b in br_bits:
                        bw.write(b, 1)
                    br_bits = []
                if t > 1:  # history-nonzero: one correction bit
                    br_bits.append(t & 1)
                    continue
                flush_eob()
                c, l = enc[(r << 4) | 1]
                bw.write(c, l)
                bw.write(1 if zz[k] > 0 else 0, 1)
                for b in br_bits:
                    bw.write(b, 1)
                br_bits = []
                r = 0
            if r > 0 or br_bits:
                eobrun += 1
                pend.extend(br_bits)
                if eobrun == 0x7FFF or len(pend) > 900:
                    flush_eob()
    flush_eob()


def encode_jpeg_progressive(
    img: np.ndarray, quality_scale: int = 1
) -> bytes:
    """(H, W) grayscale or (H, W, 3) RGB uint8 → PROGRESSIVE JPEG bytes
    (SOF2).  The scan script exercises every progressive scan kind: DC
    first with Al=1, per-component AC first scans with spectral
    selection (1–5, 6–63) at Al=1, a DC refinement scan, and AC
    refinement scans back to Al=0.  Coefficients are identical to the
    baseline encoder's, so decode(progressive(img)) must equal
    decode(baseline(img)) EXACTLY — the equivalence gate in
    tests/test_jpeg.py."""
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
    ncomp = len(planes)
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    grids = []
    for ci in range(ncomp):
        p = planes[ci]
        pp = np.empty((bh * 8, bwid * 8))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1 : h, :]
        pp[:, w:] = pp[:, w - 1 : w]
        q = qts[comp_q[ci]]
        grid = np.zeros((bh, bwid, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bwid):
                blk = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                Fc = _A @ (blk - 128.0) @ _A.T
                grid[by, bx] = (
                    np.round(Fc / q).astype(np.int64).reshape(64)[ZIGZAG]
                )
        grids.append(grid)

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate(qts):
        zz = np.zeros(64, dtype=np.uint8)
        zz[:] = q.reshape(64)[ZIGZAG]
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tq]) + bytes(zz)
    sof = bytearray()
    sof += bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, comp_q[c]])
    out += b"\xff\xc2" + (len(sof) + 2).to_bytes(2, "big") + sof
    # DC table 0: the K3 luma spec (symbols 0-11).  AC table 0: a flat
    # 256-symbol canonical table (255×len-8 + 1×len-9, Kraft < 1) —
    # progressive needs the EOB-run symbols 0x10..0xE0 that the K3
    # sequential AC tables do not carry
    dc_bits, dc_vals = K3_DC_LUMA
    _, dc_enc = _canonical_codes(dc_bits, dc_vals)
    seg = bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
    out += b"\xff\xc4" + (len(seg) + 2).to_bytes(2, "big") + seg
    ac_bits = [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = list(range(256))
    _, ac_enc = _canonical_codes(ac_bits, ac_vals)
    seg = bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    out += b"\xff\xc4" + (len(seg) + 2).to_bytes(2, "big") + seg

    def sos(comp_ids, ss, se, ah, al):
        s = bytearray([len(comp_ids)])
        for cid in comp_ids:
            s += bytes([cid, 0x00])
        s += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + (len(s) + 2).to_bytes(2, "big") + bytes(s)

    all_ids = [c + 1 for c in range(ncomp)]
    # scan 1: DC first, Al=1, all components (interleaved when ncomp>1)
    out += sos(all_ids, 0, 0, 0, 1)
    bw = _BitWriter()
    pred = [0] * ncomp
    for by in range(bh):
        for bx in range(bwid):
            for ci in range(ncomp):
                v = int(grids[ci][by, bx, 0]) >> 1  # arithmetic shift
                diff = v - pred[ci]
                pred[ci] = v
                t, code = _magnitude(diff)
                c0, l0 = dc_enc[t]
                bw.write(c0, l0)
                if t:
                    bw.write(code, t)
    bw.flush()
    out += bw.out
    # scans 2..: AC first, spectral selection, Al=1
    bands = [(1, 5), (6, 63)]
    for ss, se in bands:
        for ci in range(ncomp):
            out += sos([ci + 1], ss, se, 0, 1)
            bw = _BitWriter()
            _emit_ac_first(bw, ac_enc, grids[ci], ss, se, 1)
            bw.flush()
            out += bw.out
    # DC refinement: Ah=1 → Al=0, one raw bit per block
    out += sos(all_ids, 0, 0, 1, 0)
    bw = _BitWriter()
    for by in range(bh):
        for bx in range(bwid):
            for ci in range(ncomp):
                bw.write(int(grids[ci][by, bx, 0]) & 1, 1)
    bw.flush()
    out += bw.out
    # AC refinement scans back to Al=0
    for ss, se in bands:
        for ci in range(ncomp):
            out += sos([ci + 1], ss, se, 1, 0)
            bw = _BitWriter()
            _emit_ac_refine(bw, ac_enc, grids[ci], ss, se, 0)
            bw.flush()
            out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
