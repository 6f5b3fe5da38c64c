"""Multimodal columns: images/audio/video as opaque binary + typed metadata
(north-star multimodal surface).

Data model: a multimodal asset is a row with
  - ``content: binary``  — the raw encoded bytes (opaque to the engine)
  - ``media_type: string`` — MIME-ish discriminator (image/png, audio/wav…)
  - ``meta: struct<width int, height int, n_channels int, duration_ms int>``
    — typed, nullable per modality

Processing model: decode / feature-extract / resize / frame-sample run as
**Arrow-batched Pandas functions over mapInPandas** — the only sane shape
for Python-side media work at scale: each task pulls one Arrow batch,
decodes in bulk, and emits an Arrow batch, so Python crossing cost is per
batch, not per row, and the operation parallelizes per partition exactly
like any narrow map.

The actual codec calls are STUBBED (``NotImplementedError`` or a
deterministic fake) because this container has no image/audio libraries —
the Spark-side plumbing (schemas, batch iteration, partitioning) is real
and tested.  Swap ``_decode_image_stub`` for PIL/torchvision in a real
deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ASSET_META = StructType(
    [
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", IntegerType(), False),
        StructField("media_type", StringType(), False),
        StructField("content", BinaryType(), False),
        StructField("meta", ASSET_META, True),
    ]
)

#: Output schema of the feature-extraction stage.
FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", IntegerType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("content_hash", StringType(), False),
        StructField("mean_byte", DoubleType(), True),  # null on decode error
        StructField("decode_status", StringType(), False),
    ]
)


def _decode_image_stub(content: bytes) -> dict:
    """STUB decode: deterministic fake 'decode' from the raw bytes.

    A real deployment replaces this with e.g. PIL.Image.open; the
    surrounding batch plumbing does not change.  Raises on empty content
    (exercises the per-row error channel).
    """
    if not content:
        raise NotImplementedError("empty asset: no codec available in this container")
    return {
        "mean_byte": float(sum(content) / len(content)),
    }


def extract_features(assets: DataFrame) -> DataFrame:
    """Decode + feature-extract every asset via Arrow-batched mapInPandas.

    Per-row decode failures are captured in ``decode_status`` instead of
    failing the task — at 100 TB a single corrupt file must not kill a
    stage."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["content"].map(len),
                "content_hash": pdf["content"].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
            }
            means, statuses = [], []
            for content in pdf["content"]:
                try:
                    feat = _decode_image_stub(bytes(content))
                    means.append(feat["mean_byte"])
                    statuses.append("ok")
                except NotImplementedError as e:
                    means.append(None)
                    statuses.append(f"error: {e}")
            out["mean_byte"] = means
            out["decode_status"] = statuses
            yield pd.DataFrame(out)

    return assets.mapInPandas(_batches, schema=FEATURES_SCHEMA)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage: STUB (no codec in container) — the real signature and
    batch shape, with the pixel work behind NotImplementedError."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires an image codec (PIL/opencv) not present "
            "in this container; plug it into this mapInPandas body"
        )
        yield  # pragma: no cover

    return assets.mapInPandas(_batches, schema=assets.schema)


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stage for video assets: STUB with real plumbing.

    Emits one row per sampled frame (deterministic fake frame ids derived
    from duration metadata; the actual frame-grab is the stubbed part)."""
    frames_schema = StructType(
        [
            StructField("asset_id", IntegerType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("ts_ms", IntegerType(), False),
        ]
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "frame_idx": [], "ts_ms": []}
            for _, r in pdf.iterrows():
                duration = r["meta"]["duration_ms"] if r["meta"] is not None else None
                if duration is None:
                    continue
                for i, ts in enumerate(range(0, int(duration), every_ms)):
                    rows["asset_id"].append(r["asset_id"])
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(ts)
            yield pd.DataFrame(rows, dtype="int32")

    # Only the columns the sampler needs cross into Python (column pruning
    # matters double for Arrow transfer).
    return assets.select("asset_id", "meta").mapInPandas(_batches, schema=frames_schema)


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake asset table for tests/demos (no external data)."""
    rows = []
    for i in range(n):
        content = bytes((i * 7 + j) % 256 for j in range(100 + (i % 5) * 50))
        if i % 13 == 0:
            content = b""  # corrupt asset → decode error channel
        media = ["image/png", "audio/wav", "video/mp4"][i % 3]
        meta = (
            64 + i % 128,
            64 + (i * 3) % 128,
            3,
            (i % 10) * 1000 if media == "video/mp4" else None,
        )
        rows.append((i, media, content, meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
