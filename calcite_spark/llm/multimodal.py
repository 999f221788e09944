"""Multimodal columns for training-data pipelines: image/audio/video as
opaque `binary` columns plus typed metadata structs, with decode /
feature-extract / resize / frame-sample operators as Arrow-batched
Pandas UDFs over mapInPandas.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested; the actual codec calls are STUBBED behind
`_require_codec()` (image/audio libraries are not in this container) or
served by a deterministic fake for tests. A production deployment swaps
`_decode_image_impl` for PIL/libvips without touching any plan code.

Scale notes (100 TB of media):
  * media bytes stay in one `content binary` column — Parquet keeps
    them out of scans that only touch metadata (column pruning);
  * decode batches are bounded by `spark.sql.execution.arrow.
    maxRecordsPerBatch` — set it low (e.g. 64) for multi-MB payloads so
    a batch fits in worker memory;
  * repartition by a content-size bucket before heavy decode so one
    task doesn't draw all the 4K videos.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# Typed metadata ≈ the reference's typed-column model (RelDataType struct)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, width int, height int, n_bytes int, mean_luma double"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id bigint, n_channels int, sample_rate int, bit_depth int, "
    "duration_ms bigint, rms double, peak double"
)

_FAKE_CODEC = False  # tests flip this to use the deterministic fake


def _require_codec(use_fake: bool):
    if use_fake:
        return None
    try:
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image codec not available in this environment: PPM (P3/P6) "
            "decodes natively via the pure-stdlib parser; for other "
            "formats install Pillow or enable the deterministic fake "
            "(tests do)"
        ) from e


# -- real pure-stdlib codecs (no third-party deps) ---------------------


def _decode_ppm(content: bytes):
    """Netpbm PPM decode (P6 binary / P3 ASCII), stdlib-only: header
    tokens (with # comments) then the RGB raster. Returns
    (width, height, mean_luma) with Rec.601 luma normalized by maxval."""
    # header = first 4 whitespace-separated tokens, comments stripped
    tokens, i, n = [], 2, len(content)
    while len(tokens) < 3 and i < n:
        c = content[i : i + 1]
        if c == b"#":
            while i < n and content[i] not in (10, 13):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not content[j : j + 1].isspace():
                j += 1
            tokens.append(content[i:j])
            i = j
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    width, height, maxval = (int(t) for t in tokens)
    if maxval > 255:
        # 2-byte samples: reading single bytes would compute garbage luma
        # — refuse through the codec gate instead of mis-decoding
        raise NotImplementedError("PPM maxval > 255 (2-byte samples) not supported")
    i += 1  # single whitespace after maxval precedes the raster
    if content[:2] == b"P6":
        raster = content[i : i + width * height * 3]
        vals = list(raster)
    else:  # P3: ASCII sample values
        vals = [int(t) for t in content[i:].split()]
    if len(vals) < width * height * 3:
        raise ValueError("truncated PPM raster")
    luma = 0.0
    for p in range(0, width * height * 3, 3):
        luma += 0.299 * vals[p] + 0.587 * vals[p + 1] + 0.114 * vals[p + 2]
    luma /= width * height * maxval
    return (width, height, round(luma, 6))


def _decode_wav(content: bytes):
    """RIFF/WAVE decode via the stdlib `wave` module + PCM amplitude
    stats: (n_channels, sample_rate, bit_depth, duration_ms, rms, peak),
    amplitudes normalized to [-1, 1] (8-bit PCM is unsigned per spec)."""
    import array
    import io
    import math
    import wave

    with wave.open(io.BytesIO(content), "rb") as w:
        nch, sw, rate, nframes = (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.getnframes(),
        )
        raw = w.readframes(nframes)
    if sw == 2:
        samples = array.array("h", raw)
        scale = 32768.0
    elif sw == 1:
        samples = array.array("B", raw)
        samples = [s - 128 for s in samples]
        scale = 128.0
    else:
        raise NotImplementedError(f"PCM sample width {sw * 8} bits not supported")
    if not len(samples):
        return (nch, rate, sw * 8, 0, 0.0, 0.0)
    rms = math.sqrt(sum((s / scale) ** 2 for s in samples) / len(samples))
    peak = max(abs(s) / scale for s in samples)
    duration_ms = nframes * 1000 // rate if rate else 0
    return (nch, rate, sw * 8, duration_ms, round(rms, 6), round(peak, 6))


def _decode_image_impl(content: bytes, use_fake: bool = False):
    """Return (width, height, mean_luma). PPM payloads decode for real
    (stdlib parser); other formats use the deterministic fake when
    enabled, else the codec gate raises."""
    if content is None or len(content) < 2:
        return (0, 0, 0.0)
    if content[:2] in (b"P6", b"P3"):
        return _decode_ppm(bytes(content))
    codec = _require_codec(use_fake)
    if codec is None:
        w = 1 + content[0] % 64
        h = 1 + content[1] % 64
        luma = (sum(content[:256]) / min(len(content), 256)) / 255.0
        return (w, h, round(luma, 6))
    img = codec.open(__import__("io").BytesIO(content)).convert("L")  # pragma: no cover
    px = list(img.getdata())  # pragma: no cover
    return (img.width, img.height, sum(px) / (255.0 * len(px)))  # pragma: no cover


def decode_image_features(media: DataFrame, batch_size: int = 64) -> DataFrame:
    """binary content → (width, height, n_bytes, mean_luma) via
    mapInPandas (Arrow batches; per-partition iterator keeps memory to
    one batch of payloads)."""
    from calcite_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    # capture the codec choice at plan-build time: module globals set on
    # the driver are NOT visible inside Python workers (fresh import)
    use_fake = _FAKE_CODEC

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_impl(bytes(c), use_fake) if c is not None else (0, 0, 0.0)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "mean_luma": [f[2] for f in feats],
                }
            )

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    from calcite_spark.exec import parallelize_input

    # single-file media inputs otherwise decode on ONE task (§5 guard;
    # no-op when the scan already reads >= cores files)
    return parallelize_input(media.select("media_id", "content")).mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


def decode_audio_features(media: DataFrame, batch_size: int = 64) -> DataFrame:
    """binary WAV content → (n_channels, sample_rate, bit_depth,
    duration_ms, rms, peak) via mapInPandas — the REAL stdlib decoder
    (wave + array + math), no fake: non-RIFF payloads raise
    NotImplementedError (the codec gate), so callers filter by kind/mime
    first, same as a production media pipeline."""
    from calcite_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for c in pdf["content"]:
                if c is None or len(c) < 12:
                    feats.append((0, 0, 0, 0, 0.0, 0.0))
                elif bytes(c[:4]) == b"RIFF" and bytes(c[8:12]) == b"WAVE":
                    feats.append(_decode_wav(bytes(c)))
                else:
                    raise NotImplementedError(
                        "audio codec: only RIFF/WAVE PCM is decoded natively"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_channels": [f[0] for f in feats],
                    "sample_rate": [f[1] for f in feats],
                    "bit_depth": [f[2] for f in feats],
                    "duration_ms": [f[3] for f in feats],
                    "rms": [f[4] for f in feats],
                    "peak": [f[5] for f in feats],
                }
            )

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    from calcite_spark.exec import parallelize_input

    return parallelize_input(media.select("media_id", "content")).mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled frame
    timestamp (the decode itself is the stubbed step). Pure Spark:
    explode a generated timestamp sequence from metadata — no Python."""
    return media.filter("kind = 'video'").selectExpr(
        "media_id",
        f"explode(sequence(0, coalesce(meta.duration_ms, 0), {every_ms})) AS frame_ts_ms",
    )


def size_bucket(media: DataFrame, n_buckets: int = 8) -> DataFrame:
    """Bucket by payload size and repartition so heavy payloads spread
    across tasks (skew control for decode stages)."""
    bucketed = media.withColumn(
        "__size_bucket", F.expr(f"CAST(length(content) * {n_buckets} / (1024 * 1024 * 64) AS INT)")
    )
    return bucketed.repartition(n_buckets * 4, "__size_bucket", "media_id").drop("__size_bucket")


def synth_wav_bytes(
    freq: float = 440.0, ms: int = 100, rate: int = 8000, amp: float = 0.5
) -> bytes:
    """Mono 16-bit PCM sine WAV, stdlib-only — a REAL container for codec
    tests (rms of a sine = amp/sqrt(2), peak = amp)."""
    import io
    import math
    import struct
    import wave

    nframes = rate * ms // 1000
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack(
                "<h", int(32767 * amp * math.sin(2 * math.pi * freq * i / rate))
            )
            for i in range(nframes)
        )
        w.writeframes(frames)
    return buf.getvalue()


def synth_ppm_bytes(width: int = 8, height: int = 6) -> bytes:
    """P6 gradient image: pixel (x, y) = (x*16 % 256, y*16 % 256, (x+y)*8
    % 256) — real binary Netpbm container for codec tests."""
    raster = bytearray()
    for y in range(height):
        for x in range(width):
            raster += bytes([(x * 16) % 256, (y * 16) % 256, ((x + y) * 8) % 256])
    return f"P6\n# synth\n{width} {height}\n255\n".encode() + bytes(raster)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (seeded bytes)."""
    rows = []
    for i in range(n):
        content = bytes([(i * 7 + j * 13) % 251 for j in range(128 + (i % 5) * 64)])
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                kind,
                bytearray(content),
                ("application/octet-stream", None, None, 5000 if kind == "video" else None),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
