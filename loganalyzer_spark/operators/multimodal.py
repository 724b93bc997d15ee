"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batch kernels.

The decode step does REAL pixel decoding for two formats that need no
external libraries — binary PPM (P6) and uncompressed 24-bit BMP —
with pure-numpy codecs (``decode_ppm``/``decode_bmp``, encoders
provided for fixtures/datagen). Formats that would require PIL/ffmpeg
(JPEG, PNG, any audio/video codec) raise ``NotImplementedError`` at
the per-payload dispatch; ``fake=True`` keeps the deterministic
md5-derived feature path so the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — stays testable on
arbitrary payloads. A production deployment adds decoders to
``_DECODERS``; nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct
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


# ---------------------------------------------------------------------------
# Pure-numpy image codecs (no external libs): binary PPM (P6) and
# uncompressed 24-bit bottom-up BMP (BITMAPINFOHEADER, BI_RGB).
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 (H, W, 3) → binary PPM (P6, maxval 255)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3, "PPM P6 is RGB"
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 (H, W, 3). Handles whitespace/comment
    runs in the header per the netpbm spec."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval 255 PPM supported")
    pos += 1  # single whitespace after maxval
    n = w * h * 3
    pix = np.frombuffer(buf, dtype=np.uint8, count=n, offset=pos)
    return pix.reshape(h, w, 3)


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB → 24-bit uncompressed BMP (bottom-up rows,
    BGR byte order, rows padded to 4 bytes)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3
    row = w * 3
    pad = (-row) % 4
    padded = np.zeros((h, row + pad), dtype=np.uint8)
    padded[:, :row] = img[::-1, :, ::-1].reshape(h, row)  # bottom-up, BGR
    data = padded.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit uncompressed (BI_RGB) BMP → uint8 (H, W, 3) RGB. Handles
    bottom-up and top-down (negative height) row orders."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", buf, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", buf, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit BI_RGB BMP supported")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=h * stride, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    img = rows[:, :, ::-1]  # BGR → RGB
    return img if top_down else img[::-1]


def image_features(img: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic feature vector from decoded pixels, every entry in
    [0, 1]: [w/4096, h/4096, mean R, mean G, mean B, min/max/std of
    luma] (first ``dim`` entries, zero-padded)."""
    h, w = img.shape[:2]
    px = img.reshape(-1, 3).astype(np.float64) / 255.0
    luma = px @ np.array([0.299, 0.587, 0.114])
    feats = np.array(
        [
            min(w / 4096.0, 1.0),
            min(h / 4096.0, 1.0),
            px[:, 0].mean(),
            px[:, 1].mean(),
            px[:, 2].mean(),
            luma.min(),
            luma.max(),
            min(luma.std() * 2.0, 1.0),
        ]
    )
    out = np.zeros(dim)
    out[: min(dim, len(feats))] = feats[:dim]
    return out


_DECODERS = [
    (b"P6", decode_ppm),
    (b"BM", decode_bmp),
]


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes to a pure-numpy decoder. Unknown magics
    are the formats that genuinely need external libs (PIL/ffmpeg)."""
    for magic, fn in _DECODERS:
        if payload[: len(magic)] == magic:
            return fn(payload)
    raise NotImplementedError(
        f"no built-in decoder for magic {payload[:2]!r} — "
        "JPEG/PNG/audio/video need PIL/ffmpeg (not in this container)"
    )


def decode_features(
    media: DataFrame, fake: bool = True, dim: int = FEATURE_DIM
) -> DataFrame:
    """mapInPandas decode/feature-extract kernel.

    Output schema: media_id, media_type, features array<double>,
    n_bytes. ``fake=False`` decodes real pixels via the pure-numpy
    PPM/BMP codecs (``decode_image``); payloads in a format that needs
    external libs raise ``NotImplementedError`` from the executor.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def one(p) -> list:
        b = bytes(p) if p is not None else b""
        if fake:
            return _fake_features(b, dim).tolist()
        return image_features(decode_image(b), dim).tolist()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": [one(p) for p in pdf["payload"]],
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
