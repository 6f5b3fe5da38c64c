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

Codecs are pluggable: every decode-touching stage takes a ``codec``
object with ``decode(content, width, height, n_channels) -> ndarray`` and
``encode(ndarray) -> bytes``.  The default is ``FakeNumpyCodec`` — a
deterministic pure-numpy stand-in (this container has no image/audio
libraries) that fabricates pixels by tiling the asset's own bytes, so the
whole decode → features → resize → frame-sample pipeline runs end-to-end
and is pytest-verified.  A real deployment swaps in a PIL/opencv/ffmpeg
codec with the same two methods; none of the Spark-side plumbing
(schemas, Arrow batching, partitioning, error channel) changes.
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
        # every field nullable: a non-nullable Arrow field holding a
        # NULL (e.g. a NULL asset id flowing through mapInPandas)
        # crashes the downstream ColumnVector reader with an
        # IllegalStateException instead of behaving like data
        # (r11 robustness sweep)
        StructField("asset_id", IntegerType(), True),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("content_hash", StringType(), True),
        StructField("mean_byte", DoubleType(), True),  # null on decode error
        StructField("decode_status", StringType(), True),
    ]
)


class FakeNumpyCodec:
    """Deterministic pure-numpy stand-in codec.

    ``decode`` fabricates a (height, width, n_channels) uint8 pixel array
    by tiling the asset's own bytes — fake pixels, but a REAL array with
    real dims, bit-identical on every run/partitioning, so resize and
    frame-sampling exercise genuine numpy work end-to-end.  ``encode`` is
    the raw C-order bytes.  Raises ``ValueError`` on empty content
    (exercises the per-row decode-error channel).

    A real deployment swaps this object for one backed by PIL / opencv /
    ffmpeg with the same two methods; the mapInPandas plumbing is
    codec-agnostic.
    """

    def decode(self, content: bytes, width: int, height: int, n_channels: int):
        import numpy as np

        if not content:
            raise ValueError("empty asset: nothing to decode")
        buf = np.frombuffer(bytes(content), dtype=np.uint8)
        need = width * height * n_channels
        reps = -(-need // len(buf))
        return np.tile(buf, reps)[:need].reshape(height, width, n_channels)

    def encode(self, arr) -> bytes:
        import numpy as np

        return np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


DEFAULT_CODEC = FakeNumpyCodec()

#: Fallback dims when an asset carries no metadata.
_DEFAULT_DIMS = (16, 16, 3)


def _dims(meta) -> tuple[int, int, int]:
    if meta is None:
        return _DEFAULT_DIMS
    return (
        meta["width"] or _DEFAULT_DIMS[0],
        meta["height"] or _DEFAULT_DIMS[1],
        meta["n_channels"] or _DEFAULT_DIMS[2],
    )


def _decode_image_stub(content: bytes) -> dict:
    """Byte-level 'decode' for the feature stage: raw-byte statistics only
    (no pixel fabrication needed).  Raises on empty content (exercises the
    per-row error channel)."""
    if not content:
        raise ValueError("empty asset: nothing to decode")
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
                # NULL content is a missing asset, not a task killer:
                # NULL features + an error status, same per-row error
                # philosophy as a corrupt asset (r11 robustness sweep —
                # .map(len) on None aborted the whole Arrow batch)
                "n_bytes": pdf["content"].map(
                    lambda b: None if b is None else len(b)
                ),
                "content_hash": pdf["content"].map(
                    lambda b: None if b is None else hashlib.md5(bytes(b)).hexdigest()
                ),
            }
            means, statuses = [], []
            for content in pdf["content"]:
                if content is None:
                    means.append(None)
                    statuses.append("error: missing content")
                    continue
                try:
                    feat = _decode_image_stub(bytes(content))
                    means.append(feat["mean_byte"])
                    statuses.append("ok")
                except (ValueError, NotImplementedError) as e:
                    means.append(None)
                    statuses.append(f"error: {e}")
            out["mean_byte"] = means
            out["decode_status"] = statuses
            yield pd.DataFrame(out)

    return assets.mapInPandas(_batches, schema=FEATURES_SCHEMA)


def resize_images(
    assets: DataFrame, width: int, height: int, codec=None
) -> DataFrame:
    """Resize every decodable asset to (width, height) via Arrow-batched
    mapInPandas: codec.decode → nearest-neighbour resample (pure numpy,
    codec-agnostic) → codec.encode, with updated meta.

    Undecodable assets (empty content) pass through unchanged rather than
    killing the stage — same error philosophy as extract_features.  Swap
    ``codec`` for a real image library in deployment; the resample and all
    Spark plumbing stay as-is."""
    cdc = codec or DEFAULT_CODEC

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            contents, metas = [], []
            for _, r in pdf.iterrows():
                w0, h0, nc = _dims(r["meta"])
                try:
                    img = cdc.decode(bytes(r["content"]), w0, h0, nc)
                except (ValueError, NotImplementedError):
                    contents.append(bytes(r["content"]))
                    metas.append(r["meta"])
                    continue
                # Nearest-neighbour resample: pixel-center index mapping.
                rows = np.minimum(
                    (np.floor((np.arange(height) + 0.5) * h0 / height)).astype(int),
                    h0 - 1,
                )
                cols = np.minimum(
                    (np.floor((np.arange(width) + 0.5) * w0 / width)).astype(int),
                    w0 - 1,
                )
                contents.append(cdc.encode(img[rows][:, cols]))
                meta = dict(r["meta"]) if r["meta"] is not None else {
                    "width": None, "height": None, "n_channels": nc, "duration_ms": None
                }
                meta["width"], meta["height"] = width, height
                metas.append(meta)
            out = pdf.copy()
            out["content"] = contents
            out["meta"] = metas
            yield out

    return assets.mapInPandas(_batches, schema=assets.schema)


def sample_frames(
    assets: DataFrame, every_ms: int = 1000, grab: bool = False, codec=None
) -> DataFrame:
    """Frame-sampling stage for video assets.

    Default (``grab=False``): emits one (asset_id, frame_idx, ts_ms) row
    per sampled timestamp from duration metadata alone — only those two
    columns cross into Python (column pruning matters double for Arrow
    transfer).

    ``grab=True`` additionally decodes each sampled frame through the
    codec (frame i = the asset bytes rotated by i, then decoded — the
    deterministic fake's notion of seeking; a real ffmpeg codec seeks for
    real) and emits its md5 as ``frame_hash``, so the full
    decode-per-frame path runs end-to-end."""
    cdc = codec or DEFAULT_CODEC
    fields = [
        StructField("asset_id", IntegerType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
    ]
    if grab:
        fields.append(StructField("frame_hash", StringType(), True))
    frames_schema = StructType(fields)

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            rows = {f.name: [] for f in fields}
            for _, r in pdf.iterrows():
                duration = r["meta"]["duration_ms"] if r["meta"] is not None else None
                if duration is None:
                    continue
                for i, ts in enumerate(range(0, int(duration), every_ms)):
                    rows["asset_id"].append(r["asset_id"])
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(ts)
                    if grab:
                        w0, h0, nc = _dims(r["meta"])
                        try:
                            buf = np.frombuffer(bytes(r["content"]), dtype=np.uint8)
                            frame = cdc.decode(
                                np.roll(buf, -i).tobytes(), w0, h0, nc
                            )
                            rows["frame_hash"].append(
                                hashlib.md5(cdc.encode(frame)).hexdigest()
                            )
                        except (ValueError, NotImplementedError):
                            rows["frame_hash"].append(None)
            out = pd.DataFrame({
                k: pd.Series(v, dtype="object" if k == "frame_hash" else "int32")
                for k, v in rows.items()
            })
            yield out

    cols = ["asset_id", "meta"] + (["content"] if grab else [])
    return assets.select(*cols).mapInPandas(_batches, schema=frames_schema)


# ---------------------------------------------------------------------------
# Binary-column expressions (r13 verdict task 2): JVM-side, whole-stage-
# codegen byte arithmetic over opaque `binary` content — magic-number
# container sniffing and image-dims-from-header parsing.  These are the
# metadata-extraction half of the multimodal pillar that needs NO codec
# at all: at 100 TB the type/dims/hash profile of an asset lake is
# computed from the first bytes of each object, never a full decode, so
# it must stay out of Python entirely (pyspark.sql.functions only).
# ---------------------------------------------------------------------------

#: Container magic numbers (public file-format specs).
PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"  # PNG spec §5.2, 8 bytes
RIFF_MAGIC = b"RIFF"  # WAV: RIFF container, bytes 1-4
WAVE_FORM = b"WAVE"  # WAV form type, bytes 9-12
FTYP_BOX = b"ftyp"  # MP4/ISO-BMFF: first box type, bytes 5-8
PDF_MAGIC = b"%PDF-"  # PDF header, bytes 1-5


def be32(col) -> "F.Column":
    """Pack an int column into 4 big-endian bytes (binary), codegen-side:
    hex → zero-pad to 8 nibbles → unhex."""
    return F.unhex(F.lpad(F.hex(col.cast("long")), 8, "0"))


def read_be32(content, pos: int) -> "F.Column":
    """Parse the 4 bytes at 1-indexed ``pos`` as a big-endian unsigned
    int (codegen: binary slice → hex → base-16 conv)."""
    return F.conv(F.hex(F.substring(content, pos, 4)), 16, 10).cast("int")


def pack_png_header(width, height) -> "F.Column":
    """A well-formed PNG signature + IHDR prefix with the given dims:
    signature (8B) · IHDR length 13 (4B) · 'IHDR' (4B) · width BE32 ·
    height BE32 — dims land at byte offsets 17-24 exactly as in a real
    PNG, so :func:`png_width`/``png_height`` parse genuine files too."""
    return F.concat(
        F.lit(PNG_SIGNATURE), be32(F.lit(13)), F.lit(b"IHDR"), be32(width), be32(height)
    )


def is_png(content) -> "F.Column":
    return F.substring(content, 1, 8) == F.lit(PNG_SIGNATURE)


def png_width(content) -> "F.Column":
    """IHDR width (bytes 17-20, big-endian); NULL for non-PNG content."""
    return F.when(is_png(content), read_be32(content, 17))


def png_height(content) -> "F.Column":
    """IHDR height (bytes 21-24, big-endian); NULL for non-PNG content."""
    return F.when(is_png(content), read_be32(content, 21))


def sniff_media_type(content) -> "F.Column":
    """Magic-number container sniff over the first bytes: PNG, WAV
    (RIFF····WAVE), MP4 (····ftyp), PDF, else application/octet-stream
    (NULL content → NULL).  Pure codegen byte compares — the scan reads
    only the leading bytes' worth of work per asset, no Python."""
    return (
        F.when(content.isNull(), F.lit(None).cast("string"))
        .when(is_png(content), F.lit("image/png"))
        .when(
            (F.substring(content, 1, 4) == F.lit(RIFF_MAGIC))
            & (F.substring(content, 9, 4) == F.lit(WAVE_FORM)),
            F.lit("audio/wav"),
        )
        .when(F.substring(content, 5, 4) == F.lit(FTYP_BOX), F.lit("video/mp4"))
        .when(F.substring(content, 1, 5) == F.lit(PDF_MAGIC), F.lit("application/pdf"))
        .otherwise(F.lit("application/octet-stream"))
    )


def read_u8(content, pos: int) -> "F.Column":
    """The byte at 1-indexed ``pos`` as an int (codegen slice → hex →
    conv); NULL-safe (slice past the end yields empty → NULL conv)."""
    return F.conv(F.hex(F.substring(content, pos, 1)), 16, 10).cast("long")


def read_le32(content, pos: int) -> "F.Column":
    """Parse the 4 bytes at 1-indexed ``pos`` as a little-endian
    unsigned int — RIFF/WAV (and most audio/video containers) store
    sizes and rates little-endian, the opposite of PNG's network
    order.  Four byte slices recombined with shifts, all codegen."""
    return (
        read_u8(content, pos)
        + read_u8(content, pos + 1) * F.lit(1 << 8)
        + read_u8(content, pos + 2) * F.lit(1 << 16)
        + read_u8(content, pos + 3) * F.lit(1 << 24)
    ).cast("long")


def read_le16(content, pos: int) -> "F.Column":
    return (read_u8(content, pos) + read_u8(content, pos + 1) * F.lit(1 << 8)).cast(
        "int"
    )


def le16(col) -> "F.Column":
    """Pack an int column into 2 little-endian bytes (binary)."""
    padded = F.lpad(F.hex(col.cast("long")), 4, "0")
    return F.unhex(F.concat(F.substring(padded, 3, 2), F.substring(padded, 1, 2)))


def le32(col) -> "F.Column":
    """Pack an int column into 4 little-endian bytes (binary)."""
    padded = F.lpad(F.hex(col.cast("long")), 8, "0")
    return F.unhex(
        F.concat(
            F.substring(padded, 7, 2),
            F.substring(padded, 5, 2),
            F.substring(padded, 3, 2),
            F.substring(padded, 1, 2),
        )
    )


def pack_wav_header(n_channels, sample_rate) -> "F.Column":
    """A spec-layout WAV prefix: RIFF size placeholder · WAVE · fmt
    chunk (PCM) with channels/rates at their real offsets — channels
    LE16 @23, sample rate LE32 @25, byte rate LE32 @29, block align
    LE16 @33, bits-per-sample LE16 @35 — so the ``wav_*`` parsers below
    read genuine files identically."""
    byte_rate = (sample_rate * n_channels * F.lit(2)).cast("long")
    return F.concat(
        F.lit(RIFF_MAGIC),
        le32(F.lit(0)),  # riff size: unused by the parsers
        F.lit(WAVE_FORM),
        F.lit(b"fmt "),
        le32(F.lit(16)),  # PCM fmt chunk length
        le16(F.lit(1)),  # audio format: PCM
        le16(n_channels),
        le32(sample_rate),
        le32(byte_rate),
        le16((n_channels * F.lit(2)).cast("int")),  # block align
        le16(F.lit(16)),  # bits per sample
    )


#: Total bytes of the pack_wav_header prefix (RIFF..bits-per-sample).
WAV_HEADER_LEN = 36


def is_wav(content) -> "F.Column":
    return (F.substring(content, 1, 4) == F.lit(RIFF_MAGIC)) & (
        F.substring(content, 9, 4) == F.lit(WAVE_FORM)
    )


def wav_channels(content) -> "F.Column":
    return F.when(is_wav(content), read_le16(content, 23))


def wav_sample_rate(content) -> "F.Column":
    return F.when(is_wav(content), read_le32(content, 25))


def wav_byte_rate(content) -> "F.Column":
    return F.when(is_wav(content), read_le32(content, 29))


def asset_metadata_rows(binfiles: DataFrame) -> DataFrame:
    """Silver metadata rows for a ``read_binary_files`` frame: one row
    per object with ``(path, n_bytes, content_hash, media_type, width,
    height)`` — hash for exact dedup, sniffed container type, and
    header-parsed image dims.  The bytes themselves are NOT stored:
    at lake scale the silver table is metadata-only (a few hundred
    bytes/asset), the blobs stay in object storage addressed by path.
    Narrow codegen map over the binary scan; no shuffle, no Python."""
    c = F.col("content")
    return binfiles.select(
        F.col("path"),
        F.col("length").cast("long").alias("n_bytes"),
        F.md5(c).alias("content_hash"),
        sniff_media_type(c).alias("media_type"),
        png_width(c).alias("width"),
        png_height(c).alias("height"),
    )


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
