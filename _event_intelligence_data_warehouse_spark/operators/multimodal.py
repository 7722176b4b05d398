"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side architecture here is real and tested — schema, partition
strategy, UDF signatures, batch shapes. Codecs come in three tiers:

- REAL, library-free: binary PPM/PGM images decode and resize with
  numpy alone (``decode_ppm_images`` / ``resize_ppm_images`` — header
  parsing, true pixel histograms, exact nearest-neighbor resize); RIFF
  PCM16 WAV audio decodes with a chunk-walking parser
  (``audio_features`` — header-derived rate/channels, RMS/peak/exact
  zero-crossing over actual samples); PPM STREAMS (concatenated P6,
  the netpbm stream ffmpeg's image2pipe emits) give real video frame
  sampling (``sample_ppm_stream_frames``).
- Deterministic fake (``fake=True``): reproducible pseudo-pixels from
  payload bytes — the oracle-checkable stand-in for formats whose
  codecs aren't in this container.
- PIL/ffmpeg formats (JPEG/PNG/audio/video): ``fake=False`` fails fast
  with ``NotImplementedError`` at plan-build time; swapping in the
  real library changes one inner function, not the plan.

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


def pil_available() -> bool:
    """True when Pillow is importable — the gate for the real image
    codec path (absent in this container; present in production)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _pil_decode_batch(pdf):
    """Real-codec decode: PIL opens each payload (JPEG/PNG/BMP/...),
    width/height come from the DECODED image (not trusted metadata),
    and features are the same 16-bin normalized histogram as the fake
    codec — over actual grayscale pixel values, so downstream
    similarity/dedup plumbing is codec-agnostic. Same signature and
    output schema as :func:`_fake_decode_batch`; decode_images picks
    per availability.

    Corrupt/truncated payloads do NOT fail the job (at corpus scale a
    handful of bad images per billion is the norm, and one poisoned
    row killing a 1000-executor stage mid-run is the real failure
    mode): each row decodes under its own guard, and undecodable
    payloads surface as (media_id, kind, n_bytes) rows with NULL
    width/height/features — filter ``width IS NULL`` downstream to
    audit or drop them."""
    import io

    import numpy as np
    import pandas as pd
    from PIL import Image

    media_ids, kinds, widths, heights, n_bytes, feats = [], [], [], [], [], []
    for mid, kind, payload in zip(
        pdf["media_id"], pdf["kind"], pdf["payload"]
    ):
        raw = bytes(payload)
        media_ids.append(mid)
        kinds.append(kind)
        n_bytes.append(len(raw))
        try:
            img = Image.open(io.BytesIO(raw))
            arr = np.asarray(img.convert("L"), dtype=np.uint8)
        except Exception:
            widths.append(None)
            heights.append(None)
            feats.append(None)
            continue
        hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
        total = hist.sum() or 1
        widths.append(img.size[0])
        heights.append(img.size[1])
        feats.append((hist / total).astype("float32").tolist())
    return pd.DataFrame(
        {
            "media_id": media_ids,
            "kind": kinds,
            "width": widths,
            "height": heights,
            "n_bytes": n_bytes,
            "features": feats,
        }
    )


def decode_images(df: DataFrame, *, fake: bool = False,
                  rows_per_batch: int = 256) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas.

    ``fake=False`` uses the real PIL codec when Pillow is importable
    (JPEG/PNG/... payloads, real decoded dimensions + pixel-histogram
    features — tests/test_extensions.py exercises it skip-marked until
    the dependency appears); without Pillow it raises
    ``NotImplementedError`` at plan-build time so misconfiguration
    fails fast, not mid-job."""
    if not fake and not pil_available():
        raise NotImplementedError(
            "real image/audio decoding needs PIL/ffmpeg, which are not "
            "installed here; pass fake=True for the deterministic stub"
        )
    decode_batch = _fake_decode_batch if fake else _pil_decode_batch

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # Respect the batch-size contract even if Arrow hands us more.
            for start in range(0, len(pdf), rows_per_batch):
                yield decode_batch(pdf.iloc[start:start + rows_per_batch])

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


# ---------------------------------------------------------------------------
# REAL codec path: PPM (P6) / PGM (P5) — raw binary image formats fully
# decodable with numpy alone, no PIL. The plumbing (mapInPandas, Arrow
# batches, schemas) is byte-identical to the fake path; only the inner
# decode differs. JPEG/PNG still fail fast until PIL exists.
# ---------------------------------------------------------------------------

def encode_ppm(arr) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6) — or (h, w)
    as PGM (P5)."""
    import numpy as np

    a = np.asarray(arr, dtype="uint8")
    if a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    elif a.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"need (h,w,3) or (h,w) uint8, got {a.shape}")
    h, w = a.shape[0], a.shape[1]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_ppm(payload: bytes):
    """Decode binary PPM/PGM to an (h, w, 3) or (h, w) uint8 array.
    Handles the whitespace/comment grammar of the netpbm header."""
    import numpy as np

    buf = bytes(payload)
    if buf[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    chans = 3 if buf[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(buf) and buf[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    need = w * h * chans
    arr = np.frombuffer(buf, dtype=np.uint8, count=need, offset=pos)
    return arr.reshape((h, w, 3) if chans == 3 else (h, w))


def synthetic_ppm(spark: SparkSession, n: int = 32, *,
                  width: int = 24, height: int = 16) -> DataFrame:
    """Media table whose payloads are REAL binary PPM images:
    deterministic md5-seeded gradient+noise patterns, so every test and
    oracle sees identical pixels."""
    import numpy as np

    rows = []
    for i in range(n):
        seed = hashlib.md5(f"ppm{i}".encode()).digest()
        base = np.frombuffer(
            (seed * ((width * height * 3) // len(seed) + 1))
            [: width * height * 3], dtype=np.uint8,
        ).reshape(height, width, 3).copy()
        # horizontal gradient keeps resize behavior visually meaningful
        base[:, :, 0] = np.linspace(0, 255, width, dtype=np.uint8)[None, :]
        rows.append((i, "image", bytearray(encode_ppm(base)),
                     ("ppm", width, height, None, None)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _ppm_decode_batch(pdf):
    import numpy as np
    import pandas as pd

    widths, heights, feats = [], [], []
    for payload in pdf["payload"]:
        img = decode_ppm(bytes(payload))
        h, w = img.shape[0], img.shape[1]
        widths.append(w)
        heights.append(h)
        # luminance histogram over REAL pixels
        lum = (
            img.mean(axis=2) if img.ndim == 3 else img
        ).astype(np.float64)
        hist, _ = np.histogram(lum, bins=FEATURE_DIM, range=(0, 256))
        total = hist.sum() or 1
        feats.append((hist / total).astype("float32").tolist())
    return pd.DataFrame({
        "media_id": pdf["media_id"],
        "kind": pdf["kind"],
        "width": pd.array(widths, dtype="int32"),
        "height": pd.array(heights, dtype="int32"),
        "n_bytes": pdf["payload"].map(len),
        "features": feats,
    })


def decode_ppm_images(
    df: DataFrame, *, rows_per_batch: int = 256
) -> DataFrame:
    """REAL decode of PPM/PGM payloads (numpy, no PIL): width/height
    come from the image HEADER (not trusted metadata) and features are
    a luminance histogram over actual pixels. Same mapInPandas shape,
    batch contract, and output schema as the fake path — swapping
    codecs never touches the plan."""
    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for start in range(0, len(pdf), rows_per_batch):
                yield _ppm_decode_batch(
                    pdf.iloc[start:start + rows_per_batch]
                )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def resize_ppm_images(
    df: DataFrame, *, width: int = 16, height: int = 16,
    rows_per_batch: int = 256,
) -> DataFrame:
    """REAL nearest-neighbor resize of PPM payloads (numpy index
    arithmetic), re-encoded as PPM — deterministic, library-free, and
    exactly reproducible for the round-trip test."""
    import numpy as np
    import pandas as pd

    def _resize(payload: bytes) -> bytes:
        img = decode_ppm(bytes(payload))
        h, w = img.shape[0], img.shape[1]
        ys = (np.arange(height) * h) // height
        xs = (np.arange(width) * w) // width
        return encode_ppm(img[ys][:, xs])

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for start in range(0, len(pdf), rows_per_batch):
                b = pdf.iloc[start:start + rows_per_batch]
                resized = b["payload"].map(_resize)
                yield pd.DataFrame({
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "target_w": pd.array([width] * len(b), dtype="int32"),
                    "target_h": pd.array([height] * len(b), dtype="int32"),
                    "payload": resized.map(bytearray),
                    "n_bytes": resized.map(len),
                })

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# REAL codec path: WAV (RIFF PCM16) — audio fully decodable with numpy
# alone, no ffmpeg. Same honest-codec contract as PPM/PGM above: the
# mapInPandas plumbing is identical to the fake path; compressed formats
# (MP3/AAC/OGG) still fail fast until a real decoder exists here.
# ---------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_ms long, rms double, peak int, zero_cross_ppm long"
)


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """Encode an int16 array — (n,) mono or (n, ch) — as a RIFF PCM16
    WAV payload (canonical 44-byte header + data chunk)."""
    import struct

    import numpy as np

    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    byte_rate = sample_rate * ch * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate, byte_rate,
                      ch * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(payload: bytes):
    """Decode a RIFF PCM16 WAV payload to ((n, ch) int16 array,
    sample_rate). Walks the chunk list (fmt may be followed by LIST /
    fact chunks before data); only uncompressed 16-bit PCM is
    supported — anything else raises, it does not guess."""
    import struct

    import numpy as np

    buf = bytes(payload)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        body = buf[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated chunk body")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _brate, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(
            f"only PCM16 supported (fmt={audio_fmt}, bits={bits}); "
            "compressed audio needs a real decoder"
        )
    arr = np.frombuffer(data, dtype="<i2")
    n = len(arr) // ch
    return arr[: n * ch].reshape(n, ch), rate


def synthetic_wav(
    spark: SparkSession, n: int = 16, *, sample_rate: int = 8000,
    duration_ms: int = 250,
) -> DataFrame:
    """Media table whose payloads are REAL PCM16 WAV clips:
    deterministic md5-seeded sine tones (frequency varies per id) with
    a small additive pseudo-noise floor — identical samples everywhere,
    so features are test-pinnable."""
    import numpy as np

    n_samp = sample_rate * duration_ms // 1000
    rows = []
    for i in range(n):
        seed = int.from_bytes(
            hashlib.md5(f"wav{i}".encode()).digest()[:4], "big"
        )
        freq = 200 + (seed % 1800)
        t = np.arange(n_samp, dtype=np.float64) / sample_rate
        tone = 12000 * np.sin(2 * np.pi * freq * t)
        noise_bytes = (
            hashlib.md5(f"noise{i}".encode()).digest()
            * (n_samp // 16 + 1)
        )[:n_samp]
        noise = (
            np.frombuffer(noise_bytes, dtype=np.uint8).astype(np.float64)
            - 128.0
        ) * 4.0
        clip = np.clip(tone + noise, -32768, 32767).astype("<i2")
        rows.append((i, "audio", bytearray(encode_wav(clip, sample_rate)),
                     ("wav", None, None, sample_rate, duration_ms)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def audio_features(df: DataFrame, *, rows_per_batch: int = 256) -> DataFrame:
    """REAL audio featurization over WAV payloads (numpy, no ffmpeg):
    sample rate and channel count come from the RIFF HEADER (not
    trusted metadata); RMS / peak / zero-crossing rate are computed
    over actual PCM samples (channel-mean mono mix). zero_cross_ppm is
    exact integer (crossings * 1e6 div (n_samples - 1)) so the feature
    is bit-stable. Same mapInPandas batch contract as every decode
    path here."""
    import numpy as np
    import pandas as pd

    def _feats(pdf):
        ids, rates, chans, nsamps, durs, rmss, peaks, zcs = (
            [], [], [], [], [], [], [], []
        )
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            arr, rate = decode_wav(bytes(payload))
            n, ch = arr.shape
            mono = arr.astype(np.float64).mean(axis=1)
            rms = float(np.sqrt(np.mean(mono ** 2))) if n else 0.0
            peak = int(np.max(np.abs(arr))) if n else 0
            if n > 1:
                signs = np.signbit(mono)
                crossings = int(np.count_nonzero(signs[1:] != signs[:-1]))
                zc_ppm = crossings * 1_000_000 // (n - 1)
            else:
                zc_ppm = 0
            ids.append(mid)
            rates.append(rate)
            chans.append(ch)
            nsamps.append(n)
            durs.append(n * 1000 // rate if rate else 0)
            rmss.append(rms)
            peaks.append(peak)
            zcs.append(zc_ppm)
        return pd.DataFrame({
            "media_id": ids,
            "sample_rate": pd.array(rates, dtype="int32"),
            "n_channels": pd.array(chans, dtype="int32"),
            "n_samples": pd.array(nsamps, dtype="int64"),
            "duration_ms": pd.array(durs, dtype="int64"),
            "rms": rmss,
            "peak": pd.array(peaks, dtype="int32"),
            "zero_cross_ppm": pd.array(zcs, dtype="int64"),
        })

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for start in range(0, len(pdf), rows_per_batch):
                yield _feats(pdf.iloc[start:start + rows_per_batch])

    return df.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# REAL codec path: PPM STREAMS — video as concatenated binary P6 frames,
# the netpbm stream format ffmpeg emits with `-f image2pipe -vcodec ppm`.
# Fully parseable with numpy alone; frame boundaries come from each
# frame's own header, so sampling genuinely decodes structure instead of
# slicing at guessed offsets (contrast the fake sample_frames path).
# ---------------------------------------------------------------------------

PPM_FRAMES_SCHEMA = (
    "media_id long, frame_idx long, n_frames int, width int, height int, "
    "payload binary, mean_lum double"
)


def encode_ppm_stream(frames) -> bytes:
    """Concatenate (h, w, 3) uint8 arrays into a binary PPM stream."""
    return b"".join(encode_ppm(f) for f in frames)


def decode_ppm_stream(payload: bytes):
    """Split a concatenated-P6 stream into frames: parse each header,
    slice exactly w*h*3 pixel bytes, repeat. Returns a list of
    (h, w, 3) uint8 arrays; trailing garbage raises rather than being
    silently dropped."""
    import numpy as np

    buf = bytes(payload)
    frames = []
    pos = 0
    while pos < len(buf):
        if buf[pos:pos + 2] != b"P6":
            raise ValueError(f"not a P6 frame header at offset {pos}")
        # netpbm header grammar: magic, whitespace/comments, w, h, maxval
        p, fields = pos + 2, []
        while len(fields) < 3:
            while p < len(buf) and buf[p:p + 1].isspace():
                p += 1
            if buf[p:p + 1] == b"#":
                while p < len(buf) and buf[p:p + 1] != b"\n":
                    p += 1
                continue
            start = p
            while p < len(buf) and not buf[p:p + 1].isspace():
                p += 1
            fields.append(int(buf[start:p]))
        p += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255:
            raise ValueError(f"only maxval 255 supported, got {maxval}")
        need = w * h * 3
        if p + need > len(buf):
            raise ValueError("truncated frame payload")
        frames.append(
            np.frombuffer(buf, dtype=np.uint8, count=need, offset=p)
            .reshape(h, w, 3)
        )
        pos = p + need
    return frames


def synthetic_ppm_stream(
    spark: SparkSession, n: int = 8, *, n_frames: int = 12,
    width: int = 16, height: int = 12,
) -> DataFrame:
    """Media table whose payloads are REAL multi-frame PPM streams:
    deterministic per-frame gradients (frame index modulates the red
    channel) so sampled frames are pixel-pinnable in tests."""
    import numpy as np

    rows = []
    for i in range(n):
        frames = []
        for fidx in range(n_frames):
            seed = hashlib.md5(f"vid{i}f{fidx}".encode()).digest()
            base = np.frombuffer(
                (seed * ((width * height * 3) // len(seed) + 1))
                [: width * height * 3], dtype=np.uint8,
            ).reshape(height, width, 3).copy()
            base[:, :, 0] = (fidx * 20) % 256
            frames.append(base)
        rows.append((
            i, "video", bytearray(encode_ppm_stream(frames)),
            ("ppm-stream", width, height, None, n_frames * 40),
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def sample_ppm_stream_frames(
    df: DataFrame, *, every_n: int = 4, rows_per_batch: int = 64,
) -> DataFrame:
    """REAL frame sampling over PPM streams: every ``every_n``-th frame
    is decoded from its own header (dimensions per frame, not trusted
    metadata), re-encoded as a standalone PPM payload, and scored with
    its true mean luminance. One output row per sampled frame — the
    row-expanding mapInPandas shape shared with the fake path, with an
    actual codec inside."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for start in range(0, len(pdf), rows_per_batch):
                b = pdf.iloc[start:start + rows_per_batch]
                out = {k: [] for k in (
                    "media_id", "frame_idx", "n_frames", "width",
                    "height", "payload", "mean_lum",
                )}
                for mid, payload in zip(b["media_id"], b["payload"]):
                    frames = decode_ppm_stream(bytes(payload))
                    for fidx in range(0, len(frames), every_n):
                        fr = frames[fidx]
                        out["media_id"].append(mid)
                        out["frame_idx"].append(fidx)
                        out["n_frames"].append(len(frames))
                        out["width"].append(fr.shape[1])
                        out["height"].append(fr.shape[0])
                        out["payload"].append(bytearray(encode_ppm(fr)))
                        out["mean_lum"].append(
                            float(fr.astype(np.float64).mean())
                        )
                if out["media_id"]:
                    yield pd.DataFrame({
                        "media_id": out["media_id"],
                        "frame_idx": pd.array(out["frame_idx"],
                                              dtype="int64"),
                        "n_frames": pd.array(out["n_frames"],
                                             dtype="int32"),
                        "width": pd.array(out["width"], dtype="int32"),
                        "height": pd.array(out["height"], dtype="int32"),
                        "payload": out["payload"],
                        "mean_lum": out["mean_lum"],
                    })

    return df.mapInPandas(run, schema=PPM_FRAMES_SCHEMA)


DHASH_BITS = 60  # < 63 so the packed hash stays a positive BIGINT

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def dhash_images(
    df: DataFrame, *, fake: bool = False, rows_per_batch: int = 256
) -> DataFrame:
    """Perceptual difference-hash over decoded pixels: bit j is
    ``pixel[j] < pixel[j+1]`` for the first ``DHASH_BITS`` adjacent
    pairs, packed little-endian into one positive int64 — the standard
    near-duplicate image fingerprint (dHash), reduced to its gradient
    essence so the fake codec keeps it closed-form (payload bytes ARE
    the pixels; a production codec feeds the same packing its resized
    grayscale rows).

    Payloads shorter than DHASH_BITS+1 bytes hash their available pairs
    only (missing high bits are 0), so truncated media still bucket
    deterministically rather than erroring mid-job.

    Scale: one Arrow pass, numpy-vectorized inside the batch; output is
    16 bytes/row however large the payload — the hash table, not the
    media, is what downstream dedup shuffles."""
    if not fake:
        raise NotImplementedError(
            "real image decoding needs PIL, which is not installed here; "
            "pass fake=True to hash the payload bytes as pixels (or feed "
            "decode_ppm_images output through a custom hasher)"
        )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            for start in range(0, len(pdf), rows_per_batch):
                b = pdf.iloc[start:start + rows_per_batch]
                hashes = []
                for payload in b["payload"]:
                    arr = np.frombuffer(
                        bytes(payload)[: DHASH_BITS + 1], dtype=np.uint8
                    ).astype(np.int64)
                    bits = (arr[:-1] < arr[1:]).astype(np.int64)
                    hashes.append(int((bits << np.arange(len(bits))).sum()))
                yield pd.DataFrame(
                    {
                        "media_id": b["media_id"],
                        "dhash": hashes,
                        "n_bytes": b["payload"].map(len),
                    }
                )

    return df.mapInPandas(run, schema=DHASH_SCHEMA)


def phash_near_dups(
    hashes: DataFrame,
    *,
    max_hamming: int = 3,
    n_bands: int = 4,
    band_bits: int = 15,
) -> DataFrame:
    """Near-duplicate pairs from perceptual hashes via Hamming-LSH
    banding: two hashes within ``max_hamming`` of each other must agree
    exactly on at least one of the ``n_bands`` bit-slices whenever
    ``max_hamming < n_bands`` bands differ — the pigeonhole guarantee
    (candidates are recall-complete for max_hamming <= n_bands - 1 bit
    flips; the default radius is pinned to that bound so defaults never
    silently trade recall — asking for a wider radius without raising
    n_bands raises instead of missing pairs whose flips spread across
    every band). Candidates equi-join on (band, slice); the exact
    ``bit_count(xor)`` verify runs only on collisions.

    Returns (media_id_a, media_id_b, hamming), a < b, distinct.

    Scale: identical shape to minhash_lsh_candidates — O(collisions)
    never O(n^2); the banded join shuffles 16-byte rows; a degenerate
    all-same-hash corpus is bounded upstream by exact-dedup on the hash
    itself (group identical hashes first; this operator's job is the
    near-miss tail)."""
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the recall-complete "
            f"radius n_bands-1={n_bands - 1}; raise n_bands (pairs "
            "with one flip per band would otherwise be silently missed)"
        )
    h = hashes.select(
        F.col("media_id").cast("bigint").alias("media_id"),
        F.col("dhash").cast("bigint").alias("dhash"),
    )
    bands = None
    mask = (1 << band_bits) - 1
    for k in range(n_bands):
        part = h.select(
            "media_id",
            "dhash",
            F.lit(k).alias("band"),
            F.expr(
                f"shiftright(dhash, {k * band_bits}) & {mask}"
            ).alias("slice"),
        )
        bands = part if bands is None else bands.unionByName(part)
    a = bands.select(
        "band", "slice",
        F.col("media_id").alias("media_id_a"), F.col("dhash").alias("h_a"),
    )
    b = bands.select(
        "band", "slice",
        F.col("media_id").alias("media_id_b"), F.col("dhash").alias("h_b"),
    )
    return (
        a.join(b, ["band", "slice"])
        .filter(F.col("media_id_a") < F.col("media_id_b"))
        .select(
            "media_id_a", "media_id_b",
            F.bit_count(F.expr("h_a ^ h_b")).cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def synthetic_media_near_dups(spark: SparkSession, n: int = 64) -> DataFrame:
    """Fixture corpus for perceptual-hash dedup: for each base id i,
    three medias — the base (payload = md5 digest of ``media{i}`` tiled
    to 512+(i%7)*64 bytes), an exact copy at id i+n (Hamming 0), and a
    near-miss at id i+2n whose FIRST byte only is bumped by one
    (mod 256), flipping at most dHash bit 0 (Hamming <= 1). Cross-id
    hashes differ in ~half their bits, so a small Hamming threshold
    recovers exactly the planted groups. Closed-form by construction —
    the oracle rebuilds every payload from md5 hex."""
    rows = []
    for i in range(n):
        digest = hashlib.md5(f"media{i}".encode()).digest()
        payload = (digest * 64)[: 512 + (i % 7) * 64]
        near = bytes([(payload[0] + 1) % 256]) + payload[1:]
        meta = ("png", 32 + i % 16, 24 + i % 9, None, None)
        rows.append((i, "image", bytearray(payload), meta))
        rows.append((i + n, "image", bytearray(payload), meta))
        rows.append((i + 2 * n, "image", bytearray(near), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_audio(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake PCM-ish audio table with NON-periodic payloads:
    media i concatenates md5("audio{i}:{k}") digests for k in
    0..(8 + i%5 - 1), so every 16-byte frame carries a different chunk
    digest — unlike :func:`synthetic_media`'s repeated-digest payloads,
    whose frames are all identical and would make any frame-level
    energy screen degenerate. An external SQL oracle can rebuild the
    exact bytes from the same md5 hex."""
    rows = []
    for i in range(n):
        chunks = 8 + i % 5
        payload = b"".join(
            hashlib.md5(f"audio{i}:{k}".encode()).digest()
            for k in range(chunks)
        )
        rows.append(
            (i, "audio", bytearray(payload),
             ("wav", None, None, 16000, chunks))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


VAD_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def audio_frame_energies(
    df: DataFrame, *, frame_bytes: int = 16, rows_per_batch: int = 256
) -> DataFrame:
    """Per-frame signal energy over raw payload bytes via mapInPandas
    (Arrow-batched numpy — the sanctioned Python path): each
    non-overlapping ``frame_bytes`` window yields
    sum((byte - 128)^2) as an EXACT int64, so downstream thresholds are
    engine-portable. Trailing partial frames are dropped (standard
    frame alignment). Production decodes containers first
    (decode_wav's numpy codec) and frames PCM samples; the energy
    algebra is identical."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for start in range(0, len(pdf), rows_per_batch):
                b = pdf.iloc[start:start + rows_per_batch]
                ids, frames, energies = [], [], []
                for mid, payload in zip(b["media_id"], b["payload"]):
                    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                    nf = len(arr) // frame_bytes
                    if nf == 0:
                        continue
                    w = (
                        arr[: nf * frame_bytes]
                        .astype(np.int64)
                        .reshape(nf, frame_bytes)
                    )
                    e = ((w - 128) ** 2).sum(axis=1)
                    ids.extend([mid] * nf)
                    frames.extend(range(nf))
                    energies.extend(int(x) for x in e)
                if ids:
                    yield pd.DataFrame(
                        {"media_id": ids, "frame_no": frames,
                         "energy": energies}
                    )

    return df.mapInPandas(run, schema=VAD_FRAME_SCHEMA)


def vad_segments(
    frames: DataFrame, *, threshold: int = 87000
) -> DataFrame:
    """Energy-threshold voice-activity segments: active frames
    (energy > threshold) collapse into maximal contiguous runs via the
    gaps-and-islands construction (frame_no minus the per-media active
    rank is constant within a run). Output one row per segment:
    (media_id, seg_start, seg_end, n_frames, energy_sum).

    Scale: one window partitioned by media (frames of one recording
    co-locate), one aggregate — the same per-key-bounded shape as the
    sessionizers; no self-joins."""
    from pyspark.sql.window import Window

    act = frames.filter(F.col("energy") > threshold)
    w = Window.partitionBy("media_id").orderBy("frame_no")
    grp = act.withColumn(
        "grp", F.col("frame_no") - F.row_number().over(w)
    )
    return grp.groupBy("media_id", "grp").agg(
        F.min("frame_no").cast("bigint").alias("seg_start"),
        F.max("frame_no").cast("bigint").alias("seg_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum("energy").cast("bigint").alias("energy_sum"),
    ).drop("grp")


def synthetic_video(
    spark: SparkSession, n: int = 48, *, frame_bytes: int = 32
) -> DataFrame:
    """Deterministic fake raw-video table: media i carries
    ``24 + (i % 7) * 8`` frames, each frame ``frame_bytes`` bytes made
    of consecutive md5("video{i}:{f}:{c}") digests (c = chunk index
    within the frame) — every frame is distinct and externally
    reconstructible from the same md5 hex, the discipline
    :func:`synthetic_audio` established. The payload is the exact
    concatenation of frames (a raw/uncompressed container): real
    pipelines land exactly this shape after a demux pass, with the
    codec decode stubbed behind the container boundary (the build
    brief's decode-stub mandate — PyAV/ffmpeg are not in this
    environment, so the SPARK-SIDE plumbing is what's real and
    tested: schema, batching, frame addressing, sampling)."""
    chunks_per_frame = frame_bytes // 16
    rows = []
    for i in range(n):
        nf = 24 + (i % 7) * 8
        payload = b"".join(
            hashlib.md5(f"video{i}:{f}:{c}".encode()).digest()
            for f in range(nf)
            for c in range(chunks_per_frame)
        )
        rows.append(
            (i, "video", bytearray(payload), ("raw", 4, 8, None, nf))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.LongType()),
        T.StructField("frame_hex", T.StringType()),
        T.StructField("byte_sum", T.LongType()),
    ]
)


def sample_frames_stride(
    df: DataFrame,
    *,
    every_k: int = 4,
    frame_bytes: int = 32,
    rows_per_batch: int = 256,
) -> DataFrame:
    """Fixed-stride frame sampling over raw video payloads via
    mapInPandas (Arrow-batched numpy — the sanctioned Python path):
    frames 0, k, 2k, ... of each payload are sliced out of the
    contiguous byte stream and summarized as (media_id, frame_no,
    frame_hex, byte_sum) — the lowercase hex of the frame's bytes (the
    raw feature handle a downstream embedder consumes) plus the exact
    int64 byte sum (a cheap engine-portable content check). Trailing
    partial frames are dropped (standard frame alignment).

    This is the video half of the multimodal curation contract: frame
    sampling before captioning/embedding is how every video pipeline
    bounds per-clip cost (every-k-th or keyframe; the stride variant is
    the deterministic one). Production swaps the raw slicer for a
    demuxed-codec decode INSIDE the same mapInPandas batch loop —
    partitioning, batch shape and output schema are unchanged, which
    is exactly the plumbing this operator pins down.

    Scale: pure per-row work (no shuffle at all); payload bytes stay
    executor-side — only the sampled frames' summaries (hex is
    2*frame_bytes chars) ever leave the scan stage. Arrow moves bytes
    in batches, never per-row Python rows."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for start in range(0, len(pdf), rows_per_batch):
                b = pdf.iloc[start:start + rows_per_batch]
                ids, frames, hexes, sums = [], [], [], []
                for mid, payload in zip(b["media_id"], b["payload"]):
                    raw = bytes(payload)
                    arr = np.frombuffer(raw, dtype=np.uint8)
                    nf = len(arr) // frame_bytes
                    for f in range(0, nf, every_k):
                        fr = raw[f * frame_bytes:(f + 1) * frame_bytes]
                        ids.append(mid)
                        frames.append(f)
                        hexes.append(fr.hex())
                        sums.append(int(
                            np.frombuffer(fr, dtype=np.uint8)
                            .astype(np.int64).sum()
                        ))
                if ids:
                    yield pd.DataFrame(
                        {"media_id": ids, "frame_no": frames,
                         "frame_hex": hexes, "byte_sum": sums}
                    )

    return df.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
