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
``encode(ndarray) -> bytes``.  The default is ``AutoCodec`` (r15):
genuine PNG bytes decode through :class:`PngCodec` — a REAL stdlib-only
PNG implementation (IDAT zlib inflate + all five scanline filters in
numpy; encode emits spec-complete files any viewer opens) — while the
non-PNG modalities fall back to ``FakeNumpyCodec``, a deterministic
pure-numpy stand-in that fabricates pixels by tiling the asset's own
bytes.  Audio gets its own REAL codec too: :class:`WavCodec` decodes /
encodes PCM-16 RIFF/WAVE bit-exactly (chunk walk + numpy, cross-checked
against stdlib ``wave``), leaving mp4 as the only simulated modality
(no stdlib-decodable payload).  A real deployment swaps in a
PIL/opencv/ffmpeg codec with the same methods; none of the Spark-side
plumbing (schemas, Arrow batching, partitioning, error channel)
changes.
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


#: Bound at the END of the module: AutoCodec (real stdlib-zlib PNG
#: decode for genuine PNG bytes, deterministic fake for the non-PNG
#: modalities this environment cannot decode).
DEFAULT_CODEC = None

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
                    raw = bytes(content)
                    if raw[:8] == PNG_SIGNATURE:
                        # r15: REAL pixels for the PNG quarter — IDAT
                        # inflate + unfilter (PngCodec, stdlib zlib);
                        # mean over decoded pixel values, and a corrupt/
                        # truncated PNG lands in the error channel
                        # instead of fabricating statistics.
                        import zlib  # noqa: PLC0415

                        try:
                            arr = PngCodec().decode(raw, 0, 0, 0)
                        except zlib.error as e:  # bad IDAT stream
                            raise ValueError(f"bad PNG deflate: {e}") from e
                        means.append(float(arr.mean()))
                    else:
                        feat = _decode_image_stub(raw)
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
                # The decoded array is the truth (a real PNG decode
                # reads its dims from IHDR and may disagree with stale
                # metadata) — resample indices must come from it, not
                # from the hint dims.
                h0, w0, nc = img.shape
                # Nearest-neighbour resample: pixel-center index mapping.
                rows = np.minimum(
                    (np.floor((np.arange(height) + 0.5) * h0 / height)).astype(int),
                    h0 - 1,
                )
                cols = np.minimum(
                    (np.floor((np.arange(width) + 0.5) * w0 / width)).astype(int),
                    w0 - 1,
                )
                resized = img[rows][:, cols]
                # encode_like (AutoCodec): re-encode in the SOURCE
                # container — a real PNG resizes to a real PNG, fake-
                # decoded modalities stay raw arrays.  Plain two-method
                # codecs keep the old symmetric encode.
                if hasattr(cdc, "encode_like"):
                    contents.append(cdc.encode_like(bytes(r["content"]), resized))
                else:
                    contents.append(cdc.encode(resized))
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
    wrap mod 2^32 → hex → zero-pad to 8 nibbles → unhex.  The pmod mask
    (r14 ADVICE item 3) makes out-of-range and negative inputs wrap to
    their two's-complement field value instead of being silently
    corrupted — ``lpad`` TRUNCATES a too-long hex string to its FIRST n
    chars, which would keep the high-order nibbles."""
    return F.unhex(F.lpad(F.hex(F.pmod(col.cast("long"), F.lit(1 << 32))), 8, "0"))


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
    """IHDR width (bytes 17-20, big-endian); NULL for non-PNG content
    AND for content too short to hold the IHDR dims (r14 ADVICE item 1:
    an intact signature on a <24-byte truncated file would otherwise
    parse a short hex slice into a garbage non-NULL value — the
    maintained ``corpus_assets`` path has no query-level length guard,
    so the floor must live in the parser)."""
    return F.when(is_png(content) & (F.length(content) >= 24), read_be32(content, 17))


def png_height(content) -> "F.Column":
    """IHDR height (bytes 21-24, big-endian); NULL for non-PNG or
    truncated (<24B) content — see :func:`png_width`."""
    return F.when(is_png(content) & (F.length(content) >= 24), read_be32(content, 21))


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
    """Pack an int column into 2 little-endian bytes (binary); input
    wraps mod 2^16 (see :func:`be32` on why the mask must precede
    ``lpad``)."""
    padded = F.lpad(F.hex(F.pmod(col.cast("long"), F.lit(1 << 16))), 4, "0")
    return F.unhex(F.concat(F.substring(padded, 3, 2), F.substring(padded, 1, 2)))


def le32(col) -> "F.Column":
    """Pack an int column into 4 little-endian bytes (binary); input
    wraps mod 2^32."""
    padded = F.lpad(F.hex(F.pmod(col.cast("long"), F.lit(1 << 32))), 8, "0")
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
    """Deterministic asset table for tests/demos (no external data).

    r15: the ``image/png`` third carries REAL PNG files (deterministic
    pixel ramp, encoded by :class:`PngCodec`), so the decode stages
    exercise genuine IDAT inflate + unfilter end-to-end; wav/mp4 assets
    keep synthetic raw bytes (no decoder for them in this env)."""
    import numpy as np

    rows = []
    png = PngCodec()
    for i in range(n):
        media = ["image/png", "audio/wav", "video/mp4"][i % 3]
        w, h = 64 + i % 128, 64 + (i * 3) % 128
        if media == "image/png":
            yy, xx = np.mgrid[0:h, 0:w]
            arr = np.stack(
                [(yy + i) % 256, (xx * 3 + i) % 256, (yy + xx) % 256], axis=-1
            ).astype(np.uint8)
            content = png.encode(arr)
        else:
            content = bytes((i * 7 + j) % 256 for j in range(100 + (i % 5) * 50))
        if i % 13 == 0:
            content = b""  # corrupt asset → decode error channel
        meta = (w, h, 3, (i % 10) * 1000 if media == "video/mp4" else None)
        rows.append((i, media, content, meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


# ---------------------------------------------------------------------------
# Real PNG codec (r14 verdict task 4): stdlib-only decode/encode — PNG
# needs nothing beyond zlib (IDAT is a zlib stream; scanline unfilter is
# byte arithmetic), so the PNG quarter of the asset lake gets GENUINE
# pixels while the codec seam (mapInPandas plumbing, error channel,
# batch shape) stays exactly as the pluggable-codec design specified.
# FakeNumpyCodec is hereby demoted to the non-PNG modalities (no
# wav/mp4 decoder exists in this environment).
# Format reference: the public PNG specification (RFC 2083 / ISO 15948)
# — 8-byte signature, length-type-data-crc chunks, IHDR layout, filter
# types 0-4 with per-byte mod-256 arithmetic.
# ---------------------------------------------------------------------------

#: channels per PNG color type (bit depth 8, non-interlaced).
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngCodec:
    """Real PNG decode/encode on stdlib ``zlib`` + numpy.

    ``decode`` parses the chunk stream (IHDR dims/color type win over
    the caller's metadata hints — the FILE is the truth), inflates the
    concatenated IDATs, and unfilters scanlines (all five filter types)
    with mod-256 numpy arithmetic into a ``(h, w, channels)`` uint8
    array.  ``encode`` emits a spec-complete PNG (signature, IHDR,
    filter-0 scanlines deflated into one IDAT, IEND, CRCs) that decodes
    back bit-identically — and that any external viewer can open.

    Supported: bit depth 8, color types 0/2/4/6, non-interlaced — the
    shapes a training-data lake normalizes to.  Palette (3), 16-bit and
    interlaced files raise ``ValueError`` into the per-row error
    channel rather than fabricating pixels.
    """

    def decode(self, content: bytes, width: int, height: int, n_channels: int):
        import zlib

        import numpy as np

        content = bytes(content)
        if not content:
            raise ValueError("empty asset: nothing to decode")
        if content[:8] != PNG_SIGNATURE:
            raise ValueError("not a PNG: bad signature")
        pos, ihdr, idats = 8, None, []
        while pos + 8 <= len(content):
            clen = int.from_bytes(content[pos : pos + 4], "big")
            ctyp = content[pos + 4 : pos + 8]
            data = content[pos + 8 : pos + 8 + clen]
            if len(data) < clen:
                raise ValueError("truncated PNG chunk")
            if ctyp == b"IHDR":
                ihdr = data
            elif ctyp == b"IDAT":
                idats.append(data)
            elif ctyp == b"IEND":
                break
            pos += 12 + clen  # len + type + data + crc
        if ihdr is None or len(ihdr) < 13:
            raise ValueError("PNG missing IHDR")
        w = int.from_bytes(ihdr[0:4], "big")
        h = int.from_bytes(ihdr[4:8], "big")
        depth, color, _comp, _filt, interlace = ihdr[8:13]
        if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
            raise ValueError(
                f"unsupported PNG (depth={depth}, color={color}, "
                f"interlace={interlace})"
            )
        ch = _PNG_CHANNELS[color]
        if not idats:
            raise ValueError("PNG missing IDAT")
        raw = np.frombuffer(zlib.decompress(b"".join(idats)), dtype=np.uint8)
        stride = w * ch
        if raw.size != h * (stride + 1):
            raise ValueError("PNG pixel data length mismatch")
        raw = raw.reshape(h, stride + 1)
        filters, lines = raw[:, 0], raw[:, 1:]
        out = np.empty((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(h):
            f, line = int(filters[y]), lines[y]
            if f == 0:  # None
                rec = line.copy()
            elif f == 1:  # Sub: uint8 accumulate wraps mod 256 per spec
                rec = np.add.accumulate(
                    line.reshape(w, ch), axis=0, dtype=np.uint8
                ).reshape(stride)
            elif f == 2:  # Up
                rec = line + prev  # uint8 wrap
            elif f == 3:  # Average: sequential in x (needs left pixel)
                rec = np.empty(stride, dtype=np.uint8)
                lp = line.reshape(w, ch).astype(np.int16)
                pp = prev.reshape(w, ch).astype(np.int16)
                left = np.zeros(ch, dtype=np.int16)
                rv = rec.reshape(w, ch)
                for x in range(w):
                    left = (lp[x] + ((left + pp[x]) >> 1)) & 0xFF
                    rv[x] = left
            elif f == 4:  # Paeth: sequential in x
                rec = np.empty(stride, dtype=np.uint8)
                lp = line.reshape(w, ch).astype(np.int16)
                pp = prev.reshape(w, ch).astype(np.int16)
                left = np.zeros(ch, dtype=np.int16)
                ul = np.zeros(ch, dtype=np.int16)
                rv = rec.reshape(w, ch)
                for x in range(w):
                    p = left + pp[x] - ul
                    pa, pb, pc = (
                        np.abs(p - left),
                        np.abs(p - pp[x]),
                        np.abs(p - ul),
                    )
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, pp[x], ul)
                    )
                    left = (lp[x] + pred) & 0xFF
                    rv[x] = left
                    ul = pp[x]
            else:
                raise ValueError(f"unknown PNG filter {f}")
            out[y] = rec
            prev = rec
        return out.reshape(h, w, ch)

    def encode(self, arr) -> bytes:
        import zlib

        import numpy as np

        a = np.ascontiguousarray(arr, dtype=np.uint8)
        if a.ndim == 2:
            a = a[:, :, None]
        if a.ndim != 3:
            raise ValueError(f"expected (h, w[, ch]) array, got shape {arr.shape}")
        h, w, ch = a.shape
        color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
        if color is None:
            raise ValueError(f"unsupported channel count {ch}")
        ihdr = (
            w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + bytes([8, color, 0, 0, 0])
        )
        scan = np.zeros((h, w * ch + 1), dtype=np.uint8)
        scan[:, 1:] = a.reshape(h, w * ch)  # filter byte 0 per line
        idat = zlib.compress(scan.tobytes(), 6)
        return (
            PNG_SIGNATURE
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat)
            + _png_chunk(b"IEND", b"")
        )


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


class AutoCodec:
    """Signature-dispatch codec: genuine PNG bytes decode through
    :class:`PngCodec` (real pixels), everything else through the
    deterministic :class:`FakeNumpyCodec` stand-in (this environment
    has no wav/mp4 decoder).  ``encode_like(content, arr)`` re-encodes
    in the same container the source bytes used, so a resize stage
    emits real PNGs for real PNGs and raw arrays for fake-decoded
    modalities — symmetric per row, stateless, executor-serializable.
    """

    def __init__(self):
        self._png = PngCodec()
        self._fake = FakeNumpyCodec()

    def _of(self, content):
        return (
            self._png
            if content is not None and bytes(content[:8]) == PNG_SIGNATURE
            else self._fake
        )

    def decode(self, content, width, height, n_channels):
        if not content:
            raise ValueError("empty asset: nothing to decode")
        return self._of(content).decode(content, width, height, n_channels)

    def encode(self, arr) -> bytes:
        return self._fake.encode(arr)

    def encode_like(self, content, arr) -> bytes:
        return self._of(content).encode(arr)


#: The engine default (bound here so the classes above exist): real PNG
#: decode for PNG bytes, deterministic fake elsewhere.
DEFAULT_CODEC = AutoCodec()


class WavCodec:
    """Real PCM WAV decode/encode on stdlib ``struct``-free byte
    arithmetic + numpy (r15, companion to :class:`PngCodec` — with it,
    the fabricated-pixel stand-in is needed only for mp4, the one
    container with no stdlib-decodable payload).

    ``decode(content) -> (samples, sample_rate)`` walks the RIFF chunk
    stream (tolerating LIST/fact/other chunks in any order), requires
    PCM (format 1) at 16 bits, and returns an ``(n_frames, n_channels)``
    int16 array.  ``encode(samples, sample_rate) -> bytes`` emits a
    spec-complete RIFF/WAVE file (fmt + data, correct sizes) that any
    audio tool opens.  Unsupported shapes (compressed formats, 8/24/32
    bit) raise ``ValueError`` into the same per-row error channel the
    image codecs use.

    Audio is not image-shaped, so this codec is NOT part of
    :class:`AutoCodec`'s resize path — it serves audio-specific stages
    (duration/energy features, resampling) and is cross-verified in
    tests against the independent stdlib ``wave`` module.
    """

    def decode(self, content: bytes):
        import numpy as np

        content = bytes(content)
        if not content:
            raise ValueError("empty asset: nothing to decode")
        if len(content) < 12 or content[:4] != RIFF_MAGIC or content[8:12] != WAVE_FORM:
            raise ValueError("not a WAV: bad RIFF/WAVE header")
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(content):
            ctyp = content[pos : pos + 4]
            clen = int.from_bytes(content[pos + 4 : pos + 8], "little")
            body = content[pos + 8 : pos + 8 + clen]
            if ctyp == b"fmt ":
                fmt = body
            elif ctyp == b"data":
                data = body
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if fmt is None or len(fmt) < 16:
            raise ValueError("WAV missing fmt chunk")
        audio_format = int.from_bytes(fmt[0:2], "little")
        n_channels = int.from_bytes(fmt[2:4], "little")
        sample_rate = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if audio_format != 1 or bits != 16:
            raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
        if n_channels < 1:
            raise ValueError("WAV with zero channels")
        if data is None:
            raise ValueError("WAV missing data chunk")
        usable = len(data) - (len(data) % (2 * n_channels))
        samples = np.frombuffer(data[:usable], dtype="<i2")
        return samples.reshape(-1, n_channels), sample_rate

    def encode(self, samples, sample_rate: int) -> bytes:
        import numpy as np

        a = np.ascontiguousarray(samples, dtype="<i2")
        if a.ndim == 1:
            a = a[:, None]
        if a.ndim != 2:
            raise ValueError(f"expected (frames[, channels]) array, got {samples.shape}")
        n_frames, n_channels = a.shape
        data = a.tobytes()
        block_align = n_channels * 2
        byte_rate = sample_rate * block_align
        fmt = (
            (1).to_bytes(2, "little")
            + n_channels.to_bytes(2, "little")
            + int(sample_rate).to_bytes(4, "little")
            + byte_rate.to_bytes(4, "little")
            + block_align.to_bytes(2, "little")
            + (16).to_bytes(2, "little")
        )
        body = (
            WAVE_FORM
            + b"fmt "
            + len(fmt).to_bytes(4, "little")
            + fmt
            + b"data"
            + len(data).to_bytes(4, "little")
            + data
        )
        return RIFF_MAGIC + len(body).to_bytes(4, "little") + body
