"""MJPEG-in-AVI video container (RIFF 'AVI ', OpenDML/MSDN layout).

Makes the video half of the multimodal surface REAL: an AVI writer
(RIFF → LIST 'hdrl' (avih + LIST 'strl' (strh 'vids'/'MJPG' + strf
BITMAPINFOHEADER)) → LIST 'movi' ('00dc' frame chunks, word-aligned)
→ 'idx1') whose frames are baseline JPEGs from ``functions/jpeg.py``,
and a parser that walks the RIFF tree, recovers fps from
``dwMicroSecPerFrame``, and decodes every '00dc' frame — so frame
sampling operates on an actual container format end-to-end with zero
external libraries.

Layout anchors: the public AVI RIFF file reference (avih 56-byte main
header, strh 56-byte stream header with rate/scale fps, '00dc'
compressed-video chunk ids, odd-length chunk padding, 'idx1'
AVIOLDINDEX entries).
"""

from __future__ import annotations

import struct

import numpy as np

from lucene_solr_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(subtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", subtype + payload)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 4) -> bytes:
    """Grayscale/RGB uint8 frames (all same size) → MJPEG AVI bytes."""
    if not frames:
        raise ValueError("at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f) for f in frames]
    usec = 1_000_000 // fps
    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        usec, max_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        len(jpegs), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4s10I4h",
        b"vids", b"MJPG", 0, 0, 0, 1, fps, 0, len(jpegs),
        max_bytes, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_chunks)
    # idx1: AVIOLDINDEX — offsets relative to the start of 'movi' data
    idx_entries = bytearray()
    off = 4  # past the 'movi' subtype fourcc
    for j in jpegs:
        idx_entries += struct.pack("<4sIII", b"00dc", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", bytes(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_frames(data: bytes) -> tuple[list[np.ndarray], int]:
    """AVI bytes → (decoded RGB frames, fps)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    fps = 0
    frames: list[np.ndarray] = []

    def walk(start: int, end: int) -> None:
        nonlocal fps
        i = start
        while i + 8 <= end:
            tag = data[i : i + 4]
            (size,) = struct.unpack("<I", data[i + 4 : i + 8])
            payload_start = i + 8
            if tag == b"LIST":
                walk(payload_start + 4, payload_start + size)
            elif tag == b"avih":
                usec = struct.unpack("<I", data[payload_start : payload_start + 4])[0]
                fps = round(1_000_000 / usec) if usec else 0
            elif tag == b"00dc" and size:
                frames.append(
                    decode_jpeg(data[payload_start : payload_start + size])
                )
            i = payload_start + size + (size % 2)

    walk(12, 8 + struct.unpack("<I", data[4:8])[0])
    return frames, fps


def extract_video_frame(data: bytes, index: int) -> np.ndarray:
    """Decode ONLY the index-th frame: seek via idx1 when present
    (the random-access path frame sampling wants), else walk movi."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    end = 8 + struct.unpack("<I", data[4:8])[0]
    i = 12
    movi_data_start = None
    idx1 = None
    while i + 8 <= end:
        tag = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        if tag == b"LIST" and data[i + 8 : i + 12] == b"movi":
            movi_data_start = i + 8
        elif tag == b"idx1":
            idx1 = data[i + 8 : i + 8 + size]
        i += 8 + size + (size % 2)
    if movi_data_start is None:
        raise ValueError("no movi list")
    if idx1 is not None:
        n = len(idx1) // 16
        if not 0 <= index < n:
            raise IndexError(f"frame {index} of {n}")
        _tag, _flags, off, length = struct.unpack(
            "<4sIII", idx1[index * 16 : index * 16 + 16]
        )
        start = movi_data_start + off + 8  # skip the 00dc header
        return decode_jpeg(data[start : start + length])
    frames, _ = decode_avi_frames(data)
    return frames[index]
