"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batch kernels.

The decode step itself is STUBBED (image/audio libraries are not in
this container): ``decode_stub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic md5-derived
feature vector so the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and testable end to end.

A production deployment swaps ``_fake_features`` for a real decoder
(PIL/ffmpeg); nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8


def media_from_pages(pages: DataFrame) -> DataFrame:
    """Derive a media table from web_pages: html bytes as the payload,
    deterministic typed metadata."""
    return pages.select(
        F.col("doc_id").alias("media_id"),
        F.expr(
            "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
        ).alias("media_type"),
        F.col("html").alias("payload"),
        F.struct(
            (F.col("doc_id") % 1920).cast("int").alias("width"),
            (F.col("doc_id") % 1080).cast("int").alias("height"),
            (F.col("doc_id") * 40).cast("long").alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: md5-seeded floats."""
    d = hashlib.md5(payload or b"").digest()
    raw = (d * ((dim * 4) // len(d) + 1))[: dim * 4]
    ints = np.frombuffer(raw, dtype=np.uint32).astype(np.float64)
    return ints / np.float64(2**32)


def decode_features(
    media: DataFrame, fake: bool = True, dim: int = FEATURE_DIM
) -> DataFrame:
    """mapInPandas decode/feature-extract kernel.

    Output schema: media_id, media_type, features array<double>,
    n_bytes. Real decoding is NotImplemented in this environment.
    """
    if not fake:
        raise NotImplementedError(
            "real image/audio decode requires PIL/ffmpeg — not in this container"
        )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_features(bytes(p) if p is not None else b"", dim).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(fn, out_schema)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame offset
    (pure column ops — the decode of each frame would go through
    ``decode_features``)."""
    return media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
    )


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (aspect-preserving target dims) as column math;
    the pixel work itself lives in the (stubbed) decoder."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_side,
        max_side / F.greatest(w, h).cast("double"),
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        "media_type",
        (w * scale).cast("int").alias("target_w"),
        (h * scale).cast("int").alias("target_h"),
    )
