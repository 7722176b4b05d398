"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side architecture here is real and tested — schema, partition
strategy, UDF signatures, batch shapes. The *codec* step is stubbed:
image/audio libraries are not in this container, so ``decode_images``
raises ``NotImplementedError`` unless the deterministic fake decoder is
requested (``fake=True``), which produces reproducible pseudo-pixels from
the payload bytes. Swapping the fake for PIL/ffmpeg changes one inner
function, not the plan.

Scale notes: payloads never pass through Python row-by-row — Arrow moves
whole columns; ``repartition`` before decode sizes batches to keep
executor memory flat (payload_bytes * rows_per_batch); feature vectors
come back as fixed-width arrays so downstream similarity operators apply
unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


def synthetic_media(spark: SparkSession, n: int = 64, *, kind: str = "image") -> DataFrame:
    """Deterministic fake media table: payload = repeated md5 bytes of the
    id (binary, opaque), metadata plausible for the kind."""
    rows = []
    for i in range(n):
        digest = hashlib.md5(f"media{i}".encode()).digest()
        payload = (digest * 64)[: 512 + (i % 7) * 64]
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                ("png", 32 + i % 16, 24 + i % 9, None, None)
                if kind == "image"
                else ("wav", None, None, 16000, 1000 + i),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_batch(pdf):
    """Deterministic stand-in for a real codec: 'pixels' are the payload
    bytes themselves; features are 16 normalized byte-histogram buckets.
    Replace this single function with a PIL/ffmpeg call in production."""
    import numpy as np
    import pandas as pd

    out = {
        "media_id": pdf["media_id"],
        "kind": pdf["kind"],
        "width": pdf["meta"].map(lambda m: m["width"] if m else None),
        "height": pdf["meta"].map(lambda m: m["height"] if m else None),
        "n_bytes": pdf["payload"].map(len),
    }
    feats = []
    for payload in pdf["payload"]:
        arr = np.frombuffer(bytes(payload), dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
        total = hist.sum() or 1
        feats.append((hist / total).astype("float32").tolist())
    out["features"] = feats
    return pd.DataFrame(out)


def decode_images(df: DataFrame, *, fake: bool = False,
                  rows_per_batch: int = 256) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas.

    ``fake=False`` requires a real codec (not available in this
    container) and raises ``NotImplementedError`` at plan-build time so
    misconfiguration fails fast, not mid-job."""
    if not fake:
        raise NotImplementedError(
            "real image/audio decoding needs PIL/ffmpeg, which are not "
            "installed here; pass fake=True for the deterministic stub"
        )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # Respect the batch-size contract even if Arrow hands us more.
            for start in range(0, len(pdf), rows_per_batch):
                yield _fake_decode_batch(pdf.iloc[start:start + rows_per_batch])

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_images(
    df: DataFrame, *, width: int = 16, height: int = 16, fake: bool = False,
    rows_per_batch: int = 256,
) -> DataFrame:
    """Resize media payloads to width x height via mapInPandas. The fake
    codec treats the payload as a flat byte raster and area-samples it to
    w*h bytes — deterministic, shape-correct plumbing; a real
    implementation swaps in PIL's ``Image.resize`` in ``_fake_resize``."""
    if not fake:
        raise NotImplementedError(
            "real image resizing needs PIL, which is not installed here; "
            "pass fake=True for the deterministic stub"
        )

    def _fake_resize(payload: bytes) -> bytes:
        import numpy as np

        arr = np.frombuffer(bytes(payload), dtype=np.uint8)
        n = width * height
        idx = (np.arange(n) * max(len(arr) // n, 1)) % max(len(arr), 1)
        return arr[idx].tobytes()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for start in range(0, len(pdf), rows_per_batch):
                b = pdf.iloc[start:start + rows_per_batch]
                if len(b) == 0:
                    continue
                resized = b["payload"].map(_fake_resize)
                yield pd.DataFrame(
                    {
                        "media_id": b["media_id"],
                        "kind": b["kind"],
                        "target_w": width,
                        "target_h": height,
                        "payload": resized,
                        "n_bytes": resized.map(len),
                    }
                )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, *, every_ms: int = 250, frame_bytes: int = 64,
    fake: bool = False,
) -> DataFrame:
    """Frame-sample video/audio payloads: one output row per sampled
    frame — a row-expanding mapInPandas (the Pandas-UDF analog of
    explode). The fake codec slices the payload at byte offsets
    proportional to the timestamp; a real one seeks with ffmpeg. Duration
    comes from meta.duration_ms, so the expansion factor is data-driven."""
    if not fake:
        raise NotImplementedError(
            "real frame sampling needs ffmpeg, which is not installed "
            "here; pass fake=True for the deterministic stub"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "frame_ms": [], "payload": []}
            for _, row in pdf.iterrows():
                meta = row["meta"]
                duration = (meta["duration_ms"] if meta is not None else None) or 1000
                payload = bytes(row["payload"])
                for no, ms in enumerate(range(0, duration, every_ms)):
                    off = (ms * max(len(payload) - frame_bytes, 1)) // max(duration, 1)
                    out["media_id"].append(row["media_id"])
                    out["frame_no"].append(no)
                    out["frame_ms"].append(ms)
                    out["payload"].append(payload[off:off + frame_bytes])
            if out["media_id"]:
                yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def media_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """media_id -> fixed-width float feature vector, ready for the
    similarity operators (operators.similarity)."""
    return decode_images(df, fake=fake).select(
        F.col("media_id").alias("vec_id"),
        F.col("features").alias("embedding"),
    )
