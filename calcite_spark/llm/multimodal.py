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

_FAKE_CODEC = False  # tests flip this to use the deterministic fake


def _require_codec(use_fake: bool):
    if use_fake:
        return None
    try:
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image codec not available in this environment; install Pillow "
            "or enable the deterministic fake (tests do)"
        ) from e


def _decode_image_impl(content: bytes, use_fake: bool = False):
    """Return (width, height, mean_luma). Fake: derive deterministically
    from the bytes so plumbing tests have stable expectations."""
    codec = _require_codec(use_fake)
    if codec is None:
        if content is None or len(content) < 2:
            return (0, 0, 0.0)
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
    return media.select("media_id", "content").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


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
