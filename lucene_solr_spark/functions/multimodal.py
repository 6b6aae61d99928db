"""Multimodal columns: binary payloads + typed metadata, with REAL
pure-numpy decoders for uncompressed formats.

Images/audio/video are opaque ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels.  The container ships no media libraries, so the
decoders implement the uncompressed container formats directly:

- 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up, BGR, 4-byte row
  padding) — encode + decode, numpy only.
- PCM-16 mono/stereo RIFF WAVE — encode + decode, chunk-walking parser.

Compressed codecs (JPEG/PNG/MP3/H.264) stay out of scope and raise
NotImplementedError with a clear message; the Spark-side plumbing
(schema, partitioning, Arrow batch shapes, feature kernels) is identical
for any decoder dropped into ``decode_image``/``decode_audio``.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


# ------------------------------------------------------------------ BMP
def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) RGB uint8 → 24-bit uncompressed BMP bytes."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 RGB")
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up row order, BGR channel order
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    return header + dib + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (H, W, 3) RGB uint8."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, comp={comp})"
        )
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = data.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


# ------------------------------------------------------------------ WAV
def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 samples ((N,) mono or (N, C)) → PCM-16 RIFF WAVE bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    block = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, 16
    )
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM-16 RIFF WAVE bytes → ((N, C) int16 samples, sample_rate).
    Walks chunks, so extra LIST/INFO chunks are tolerated."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _br, _ba, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM-16 supported (fmt={audio_fmt}, bits={bits})"
        )
    s = np.frombuffer(data, dtype="<i2")
    return s.reshape(-1, ch), rate


# ----------------------------------------------------------- synthesize
def _image_pixels(media_id: int, width: int, height: int) -> np.ndarray:
    seed = int.from_bytes(
        hashlib.sha256(f"media-image-{media_id}".encode()).digest()[:8], "big"
    )
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (height, width, 3), dtype=np.uint8)


def _audio_samples(media_id: int, n: int, rate: int) -> np.ndarray:
    t = np.arange(n, dtype=np.float64) / rate
    f0 = 220.0 + (media_id % 16) * 55.0
    wave = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(2 * np.pi * 3 * f0 * t)
    return (wave * 32767 * 0.5).astype(np.int16)


def synthesize_media(spark, n: int = 100, kind: str = "image") -> DataFrame:
    """Deterministic media table with REAL format payloads (BMP for
    images/video frames, WAV for audio) — the decode in the feature
    kernels is genuine, not a stand-in."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids.tolist():
                if kind == "audio":
                    rate = 16000
                    dur_ms = 1000 + i
                    samples = _audio_samples(i, rate * dur_ms // 1000, rate)
                    payload = encode_wav(samples, rate)
                    meta = (None, None, rate, dur_ms, "wav")
                elif kind == "video":
                    # REAL MJPEG-AVI container (functions/avi.py): each
                    # frame a uniform EVEN brightness so the JPEG DC is
                    # exact and per-frame values are analytic
                    from lucene_solr_spark.functions.avi import (
                        encode_avi_mjpeg,
                    )

                    fps = 4
                    n_frames = 4 + i % 3
                    w = h = 16
                    frames = [
                        np.full(
                            (h, w),
                            (i * 7 + k * 20) % 100 * 2 + 20,
                            dtype=np.uint8,
                        )
                        for k in range(n_frames)
                    ]
                    payload = encode_avi_mjpeg(frames, fps=fps)
                    dur_ms = n_frames * 1000 // fps
                    meta = (w, h, None, dur_ms, "avi")
                else:
                    w, h = 64 + i % 32, 64 + i % 16
                    payload = encode_bmp(_image_pixels(i, w, h))
                    meta = (w, h, None, 1000 + i, "bmp")
                rows.append((i, kind, payload, meta))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return spark.range(0, n, 1, 4).mapInPandas(gen, schema=MEDIA_SCHEMA)


# -------------------------------------------------------------- decode
def decode_image(
    payload: bytes, width: int | None = None, height: int | None = None,
) -> np.ndarray:
    """Binary payload → (H, W, 3) RGB uint8.  BMP, baseline JPEG and
    PNG decode for real (pure-numpy T.81 baseline codec in
    functions/jpeg.py, stdlib-zlib RFC 2083 decoder in functions/
    png.py — no external libraries); other formats (H.264, ...) raise
    with a clear message (the Spark plumbing is format-agnostic)."""
    if bytes(payload[:2]) == b"BM":
        return decode_bmp(bytes(payload))
    if bytes(payload[:2]) == b"\xff\xd8":
        from lucene_solr_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(bytes(payload))
    if bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n":
        from lucene_solr_spark.functions.png import decode_png

        return decode_png(bytes(payload))
    raise NotImplementedError(
        "BMP, baseline JPEG and PNG decode are implemented "
        "in-container; other formats (H.264, MP3, ...) need external "
        "codecs"
    )


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Binary payload → (samples, rate).  PCM-16 WAV decodes for real."""
    if bytes(payload[:4]) == b"RIFF":
        return decode_wav(bytes(payload))
    raise NotImplementedError(
        "only PCM-16 WAV decode is implemented in-container"
    )


# ------------------------------------------------------------- features
def extract_image_features(df: DataFrame, feature_dim: int = 16) -> DataFrame:
    """mapInPandas feature extractor: binary payload → array<float>.

    Partition-parallel, Arrow batches, bounded memory per batch; the
    pixel decode is the real BMP parser."""
    out_schema = "media_id long, kind string, features array<float>"

    def kernel(batches):
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                img = decode_image(payload)
                # channel-mean + downsampled row means → fixed-dim feature
                base = img.reshape(-1, 3).mean(axis=0)
                rows = img.mean(axis=(1, 2))
                idx = np.linspace(0, len(rows) - 1, feature_dim - 3).astype(int)
                feats.append(
                    np.concatenate([base, rows[idx]]).astype(np.float32).tolist()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return df.mapInPandas(kernel, schema=out_schema)


def extract_audio_features(df: DataFrame, bands: int = 4) -> DataFrame:
    """mapInPandas audio features: RMS, zero-crossing rate, and coarse
    FFT band energies over the decoded PCM stream."""
    out_schema = "media_id long, kind string, features array<float>"

    def kernel(batches):
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                s, _rate = decode_audio(payload)
                x = s[:, 0].astype(np.float64) / 32768.0
                rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
                zcr = (
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if x.size > 1
                    else 0.0
                )
                spec = np.abs(np.fft.rfft(x))
                bands_e = [
                    float(np.sqrt(np.mean(np.square(c)))) if c.size else 0.0
                    for c in np.array_split(spec, bands)
                ]
                feats.append(
                    np.asarray([rms, zcr] + bands_e, dtype=np.float32).tolist()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return df.mapInPandas(kernel, schema=out_schema)


def resize_image_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (numpy gather — the kernel a real
    thumbnailing pipeline vectorizes the same way)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(max=h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(max=w - 1)
    return img[yi][:, xi]


def sample_video_frames(df: DataFrame, every_ms: int = 250) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (JVM-side sequence explode; decode deferred to the
    feature kernel)."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts",
            F.explode(F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))),
        )
        .select("media_id", "frame_ts", "payload", "meta")
    )


def sampled_frame_features(df: DataFrame, every_ms: int = 250) -> DataFrame:
    """sample_video_frames + REAL per-frame decode: each sampled
    timestamp maps to its container frame (idx1 random access — only
    that frame's JPEG is decoded, not the whole video) and emits
    (media_id, frame_ts, frame_index, mean_px).  mapInPandas,
    partition-parallel, one Arrow batch at a time."""
    frames = sample_video_frames(df, every_ms)
    out_schema = (
        "media_id long, frame_ts long, frame_index long, mean_px double"
    )

    def kernel(batches):
        from lucene_solr_spark.functions.avi import (
            decode_avi_frames,
            extract_video_frame,
        )

        for pdf in batches:
            rows = []
            for media_id, ts, payload, meta in zip(
                pdf["media_id"], pdf["frame_ts"], pdf["payload"], pdf["meta"]
            ):
                data = bytes(payload)
                # fps from the container header only (no frame decode):
                # walk chunks until avih
                import struct as _s

                fps = 0
                i = 12
                end = 8 + _s.unpack("<I", data[4:8])[0]
                while i + 8 <= end and not fps:
                    tag = data[i : i + 4]
                    (size,) = _s.unpack("<I", data[i + 4 : i + 8])
                    if tag == b"LIST":
                        i += 12
                        continue
                    if tag == b"avih":
                        usec = _s.unpack("<I", data[i + 8 : i + 12])[0]
                        fps = round(1_000_000 / usec) if usec else 0
                        break
                    i += 8 + size + (size % 2)
                dur = int(meta["duration_ms"])
                n_frames = max(1, dur * fps // 1000)
                idx = min(int(ts) * fps // 1000, n_frames - 1)
                frame = extract_video_frame(data, idx)
                rows.append(
                    (int(media_id), int(ts), idx, float(frame.mean()))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_ts", "frame_index", "mean_px"],
            )

    return frames.mapInPandas(kernel, schema=out_schema)
