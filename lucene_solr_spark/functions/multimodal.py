"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels.  The actual media decode is STUBBED (the
container ships no image/audio libs): ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder exercises the real Spark plumbing — schema, partitioning,
UDF signature, batch shapes — end-to-end.
"""

from __future__ import annotations

import hashlib

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


def synthesize_media(spark, n: int = 100, kind: str = "image") -> DataFrame:
    """Deterministic fake media table exercising the binary column path."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids.tolist():
                payload = hashlib.sha256(f"media-{kind}-{i}".encode()).digest() * 8
                rows.append(
                    (
                        i,
                        kind,
                        payload,
                        (64 + i % 32, 64 + i % 16, 16000, 1000 + i, "fake"),
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(0, n, 1, 4).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decoder."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (height, width, 3), dtype=np.uint8)


def decode_image(payload: bytes, width: int, height: int, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_decode(payload, width, height)
    raise NotImplementedError(
        "real image decode requires PIL/libjpeg — not shipped in this "
        "container; pass fake=True to exercise the pipeline"
    )


def extract_image_features(
    df: DataFrame, feature_dim: int = 16, fake: bool = True
) -> DataFrame:
    """mapInPandas feature extractor: binary payload → array<float>.

    Real pipeline shape (partition-parallel, Arrow batches, bounded
    memory per batch); only the pixel decode itself is faked.
    """
    out_schema = "media_id long, kind string, features array<float>"

    def kernel(batches):
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                img = decode_image(payload, meta["width"], meta["height"], fake=fake)
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
