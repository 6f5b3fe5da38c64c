"""Multimodal asset-lake analytics under the hash gate (r13 verdict
task 2: "give multimodal a real family").

The multimodal pillar's metadata half — exact dedup by content hash,
magic-number container sniffing, image-dims-from-header parsing — is
pure byte arithmetic over opaque ``binary`` columns and therefore
DuckDB-mirrorable, unlike the codec-backed decode stages (which stay
pytest-verified behind ``textops/multimodal.py``'s pluggable codec).
Documents' UTF-8 bytes stand in as deterministic blob payloads, wrapped
in REAL container headers (PNG signature + IHDR, RIFF/WAVE, ISO-BMFF
ftyp, %PDF-) so the sniffer and the dims parser run against genuine
byte layouts; a production asset lake swaps the synthesized content
column for ``read_binary_files(...)["content"]`` and every expression
here — all JVM-side codegen, no Python — applies unchanged.  The
maintained silver form of the same metadata is the corpus pipeline's
``corpus_assets`` table (pipelines/corpus.py).

Scale shape: each query is one narrow codegen map over the scan
followed by a single keyed aggregation — content bytes never shuffle
(hashes and parsed metadata do), which is the only workable plan when
the binary column is the petabyte."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.plans.catalog import register
from unicargo_medallion_data_pipeline_spark.plans.universes import SQL_DOCS1, docs_with_text
from unicargo_medallion_data_pipeline_spark.textops.multimodal import (
    FTYP_BOX,
    PDF_MAGIC,
    RIFF_MAGIC,
    WAV_HEADER_LEN,
    WAVE_FORM,
    be32,
    is_png,
    pack_png_header,
    pack_wav_header,
    png_height,
    png_width,
    sniff_media_type,
    wav_byte_rate,
    wav_channels,
    wav_sample_rate,
)

#: DuckDB mirror of Spark's pmod for possibly-negative ids.
_PMOD = "(((doc_id % {m}) + {m}) % {m})"


@register(
    "asset_content_dedup",
    sql=f"""
    WITH docs1 AS ({SQL_DOCS1}),
    assets AS (
        SELECT 'assets/orig/' || doc_id AS path, text FROM docs1
        UNION ALL
        SELECT 'assets/mirror/' || doc_id AS path, text FROM docs1
        WHERE {_PMOD.format(m=3)} = 0
    )
    SELECT md5(text) AS content_hash,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           count(*) AS n_copies,
           min(path) AS canonical_path,
           CAST((count(*) - 1) * octet_length(encode(text)) AS BIGINT)
               AS redundant_bytes
    FROM assets
    GROUP BY md5(text), octet_length(encode(text))
    ORDER BY content_hash
    """,
    operators=("P10", "A13"),
)
def asset_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of an asset lake by content hash: every canonical
    document's bytes are stored at an original path, and one in three
    also at a mirrored path (the classic same-blob-many-paths shape a
    crawler produces); group by md5(content) to find the copy count,
    the canonical (min) path, and the bytes reclaimable by keeping one
    copy.  At sf0.1 the corpus additionally carries cross-doc duplicate
    texts, so groups of size 2 AND 4 occur — the gate covers both the
    path-level and the content-level collapse.

    Plan: narrow map (hash per asset, bytes never shuffle) → one keyed
    aggregation on the 16-byte hash → order.  At 10^9 assets the hash
    groupBy is the textbook balanced shuffle (md5 keys are uniform —
    no salting needed), identical to the reference's exact-dedup shape
    but with the blob column pruned out before the exchange."""
    docs = docs_with_text(spark, sf_dir)
    content = F.encode(F.col("text"), "UTF-8")
    base = docs.select(
        F.concat(F.lit("assets/orig/"), F.col("doc_id")).alias("path"),
        content.alias("content"),
    )
    mirror = docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == 0).select(
        F.concat(F.lit("assets/mirror/"), F.col("doc_id")).alias("path"),
        content.alias("content"),
    )
    assets = base.unionByName(mirror)
    n_bytes = F.length("content").cast("long")
    return (
        assets.groupBy(
            F.md5("content").alias("content_hash"), n_bytes.alias("n_bytes")
        )
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("path").alias("canonical_path"),
        )
        .withColumn(
            "redundant_bytes", (F.col("n_copies") - F.lit(1)) * F.col("n_bytes")
        )
        .orderBy("content_hash")
    )


def _typed_content(fixed_png_dims: bool = True) -> F.Column:
    """Deterministic typed blob per document: a REAL container header
    chosen by pmod(doc_id, 4) — PNG signature+IHDR, RIFF/WAVE, ftyp
    box, %PDF- — followed by the document's UTF-8 bytes."""
    t = F.pmod(F.col("doc_id"), F.lit(4))
    if fixed_png_dims:
        png_w, png_h = F.lit(64), F.lit(48)
    else:
        png_w = (F.lit(16) + F.pmod(F.col("doc_id"), F.lit(1024))).cast("int")
        png_h = (F.lit(16) + F.pmod(F.col("doc_id"), F.lit(977))).cast("int")
    header = (
        F.when(t == 0, pack_png_header(png_w, png_h))
        .when(t == 1, F.concat(F.lit(RIFF_MAGIC), be32(F.lit(0)), F.lit(WAVE_FORM)))
        .when(t == 2, F.concat(be32(F.lit(0)), F.lit(FTYP_BOX)))
        .otherwise(F.lit(PDF_MAGIC))
    )
    return F.concat(header, F.encode(F.col("text"), "UTF-8"))


@register(
    "asset_type_profile",
    sql=f"""
    WITH docs1 AS ({SQL_DOCS1}),
    typed AS (
        SELECT CASE {_PMOD.format(m=4)}
                 WHEN 0 THEN 'image/png'
                 WHEN 1 THEN 'audio/wav'
                 WHEN 2 THEN 'video/mp4'
                 ELSE 'application/pdf'
               END AS media_type,
               CASE {_PMOD.format(m=4)}
                 WHEN 0 THEN 24 WHEN 1 THEN 12 WHEN 2 THEN 8 ELSE 5
               END + octet_length(encode(text)) AS n_bytes,
               text
        FROM docs1
    )
    SELECT media_type,
           count(*) AS n_assets,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(sum(n_bytes) AS DOUBLE) / count(*) AS avg_bytes,
           count(DISTINCT text) AS n_distinct_contents
    FROM typed
    GROUP BY media_type
    ORDER BY media_type
    """,
    operators=("A13", "A14", "P4"),
    bench=True,
)
def asset_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-container-type size/dedup profile of an asset lake, with the
    type taken from the BYTES (magic-number sniff), not from metadata:
    synthesize one typed blob per canonical document (header chosen by
    pmod(doc_id,4), real PNG/RIFF/ftyp/%PDF- layouts), then sniff each
    asset's container from its leading bytes and aggregate per sniffed
    type.  The oracle derives the type from the assignment arithmetic,
    so the hash gate proves sniff ∘ construct ≡ assignment — a wrong
    prefix compare or offset misclassifies a whole family and fails.

    ``n_distinct_contents`` is computed Spark-side over md5(content)
    (hash-distinct — blobs never shuffle); within a type group the
    header is constant, so it equals the oracle's count(DISTINCT text).
    ``avg_bytes`` is one IEEE division of exact integer sums.  Plan:
    narrow codegen map → single keyed agg on the 4-value type key."""
    docs = docs_with_text(spark, sf_dir)
    assets = docs.select(_typed_content(fixed_png_dims=True).alias("content"))
    n_bytes = F.length("content").cast("long")
    return (
        assets.groupBy(sniff_media_type(F.col("content")).alias("media_type"))
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(n_bytes).alias("total_bytes"),
            F.countDistinct(F.md5("content")).alias("n_distinct_contents"),
        )
        .withColumn(
            "avg_bytes",
            F.col("total_bytes").cast("double") / F.col("n_assets").cast("double"),
        )
        .select(
            "media_type", "n_assets", "total_bytes", "avg_bytes", "n_distinct_contents"
        )
        .orderBy("media_type")
    )


@register(
    "asset_image_dims",
    sql=f"""
    WITH docs1 AS ({SQL_DOCS1}),
    dims AS (
        SELECT doc_id,
               CAST(16 + {_PMOD.format(m=1024)} AS INTEGER) AS width,
               CAST(16 + {_PMOD.format(m=977)} AS INTEGER) AS height
        FROM docs1
        WHERE {_PMOD.format(m=4)} = 0
    )
    SELECT doc_id, width, height,
           CAST(width AS BIGINT) * height AS n_pixels,
           CASE WHEN width > height THEN 'landscape'
                WHEN width < height THEN 'portrait'
                ELSE 'square' END AS orientation
    FROM dims
    ORDER BY doc_id
    """,
    operators=("P4", "P5", "P7"),
)
def asset_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dims extracted FROM THE HEADER BYTES: the PNG quarter of
    the synthesized asset lake packs doc_id-derived width/height into a
    spec-layout IHDR (big-endian 32-bit at byte offsets 17-24), and the
    query recovers them by byte arithmetic alone (binary slice → hex →
    base-16 conv — ``textops.multimodal.png_width/png_height``).  The
    oracle computes the dims from the id arithmetic directly, so the
    hash gate proves parse ∘ pack ≡ identity: any offset, endianness,
    or slice-length defect in the parser shifts every value and fails.

    This is the no-decode path a 100 TB image lake uses for dims
    profiling: scan reads leading bytes, parser is codegen, the blob
    column never reaches an exchange."""
    docs = docs_with_text(spark, sf_dir).filter(
        F.pmod(F.col("doc_id"), F.lit(4)) == 0
    )
    content = _typed_content(fixed_png_dims=False)
    parsed = docs.select(
        F.col("doc_id"),
        png_width(content).alias("width"),
        png_height(content).alias("height"),
    )
    return parsed.select(
        "doc_id",
        "width",
        "height",
        (F.col("width").cast("long") * F.col("height")).alias("n_pixels"),
        F.when(F.col("width") > F.col("height"), F.lit("landscape"))
        .when(F.col("width") < F.col("height"), F.lit("portrait"))
        .otherwise(F.lit("square"))
        .alias("orientation"),
    ).orderBy("doc_id")


@register(
    "asset_audio_profile",
    sql=f"""
    WITH docs1 AS ({SQL_DOCS1}),
    wav AS (
        SELECT doc_id,
               CAST(1 + {_PMOD.format(m=2)} AS INTEGER) AS n_channels,
               CAST(8000 + 100 * {_PMOD.format(m=80)} AS BIGINT) AS sample_rate,
               CAST(octet_length(encode(text)) AS BIGINT) AS data_bytes
        FROM docs1
        WHERE {_PMOD.format(m=4)} = 1
    )
    SELECT doc_id, n_channels, sample_rate,
           CAST(sample_rate * n_channels * 2 AS BIGINT) AS byte_rate,
           CAST(data_bytes * 1000 AS DOUBLE) / (sample_rate * n_channels * 2)
               AS duration_ms
    FROM wav
    ORDER BY doc_id
    """,
    operators=("P4", "P5"),
)
def asset_audio_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio metadata FROM THE HEADER BYTES, little-endian: the WAV
    quarter of the asset lake packs doc_id-derived channel count and
    sample rate into a spec-layout fmt chunk (LE16 @23, LE32 @25/29 —
    ``pack_wav_header``), and the query recovers them with the LE
    parsers (byte slices recombined by shifts) plus the PCM duration
    from data size / byte rate.  RIFF is little-endian where PNG is
    network order, so this gates the OTHER byte order end-to-end:
    a swapped shift or off-by-one offset moves every value.

    The oracle derives the same numbers from the id arithmetic —
    parse ∘ pack ≡ identity for the LE path.  ``duration_ms`` is one
    IEEE division of exact integers.  All codegen; no Python."""
    docs = docs_with_text(spark, sf_dir).filter(
        F.pmod(F.col("doc_id"), F.lit(4)) == 1
    )
    ch = (F.lit(1) + F.pmod(F.col("doc_id"), F.lit(2))).cast("int")
    rate = (F.lit(8000) + F.lit(100) * F.pmod(F.col("doc_id"), F.lit(80))).cast("long")
    content = F.concat(pack_wav_header(ch, rate), F.encode(F.col("text"), "UTF-8"))
    parsed = docs.select(
        F.col("doc_id"),
        wav_channels(content).alias("n_channels"),
        wav_sample_rate(content).alias("sample_rate"),
        wav_byte_rate(content).alias("byte_rate"),
        (F.length(content) - F.lit(WAV_HEADER_LEN)).cast("long").alias("data_bytes"),
    )
    return parsed.select(
        "doc_id",
        "n_channels",
        "sample_rate",
        "byte_rate",
        (
            (F.col("data_bytes") * F.lit(1000)).cast("double") / F.col("byte_rate")
        ).alias("duration_ms"),
    ).orderBy("doc_id")


@register(
    "asset_integrity_audit",
    sql=f"""
    WITH docs1 AS ({SQL_DOCS1}),
    audit AS (
        SELECT doc_id,
               CASE WHEN {_PMOD.format(m=7)} = 0 THEN 'truncated_header'
                    WHEN {_PMOD.format(m=11)} = 0 THEN 'bad_magic'
                    ELSE 'ok' END AS status,
               CASE WHEN {_PMOD.format(m=7)} = 0 THEN 19
                    ELSE 24 + octet_length(encode(text)) END AS n_bytes
        FROM docs1
        WHERE {_PMOD.format(m=4)} = 0
    )
    SELECT doc_id, status, CAST(n_bytes AS INTEGER) AS n_bytes,
           CASE WHEN status = 'ok' THEN 64 END AS width
    FROM audit
    ORDER BY doc_id
    """,
    operators=("P4", "P6", "Q1"),
)
def asset_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corruption audit over the PNG quarter of the asset lake, decided
    from the bytes: one in seven assets arrives truncated mid-IHDR (19
    bytes — signature intact, dims cut off), one in eleven with a
    clobbered magic byte.  The audit classifies each asset from its
    content alone (signature compare + declared-header-length check)
    and parses dims only for intact files — the per-row error-channel
    philosophy of ``extract_features``, but fully declarative.

    The oracle re-derives the statuses from the corruption assignment
    arithmetic, so the gate proves classify ∘ corrupt ≡ assignment:
    a lax length floor or a sloppy prefix compare misclassifies every
    truncated or clobbered asset.  Scale shape: narrow codegen map,
    no shuffle before the presentation sort — integrity audits must
    not cost more than the scan that feeds them."""
    docs = docs_with_text(spark, sf_dir).filter(
        F.pmod(F.col("doc_id"), F.lit(4)) == 0
    )
    full = _typed_content(fixed_png_dims=True)
    trunc = F.pmod(F.col("doc_id"), F.lit(7)) == 0
    badmagic = (~trunc) & (F.pmod(F.col("doc_id"), F.lit(11)) == 0)
    content = (
        F.when(trunc, F.substring(full, 1, 19))
        .when(badmagic, F.concat(F.lit(b"\x00"), F.substring(full, 2, 2147483640)))
        .otherwise(full)
    )
    status = (
        F.when(is_png(content) & (F.length(content) >= 24), F.lit("ok"))
        .when(is_png(content), F.lit("truncated_header"))
        .otherwise(F.lit("bad_magic"))
    )
    audited = docs.select(
        F.col("doc_id"),
        status.alias("status"),
        F.length(content).alias("n_bytes"),
        F.when(status == "ok", png_width(content)).alias("width"),
    )
    return audited.orderBy("doc_id")


@register(
    "corpus_assets_maintained_profile",
    sql=f"""
    WITH docs1 AS ({SQL_DOCS1}),
    typed AS (
        SELECT doc_id,
               CASE {_PMOD.format(m=4)}
                 WHEN 0 THEN 'image/png'
                 WHEN 1 THEN 'audio/wav'
                 WHEN 2 THEN 'video/mp4'
                 ELSE 'application/pdf'
               END AS media_type,
               CASE {_PMOD.format(m=4)}
                 WHEN 0 THEN 24 WHEN 1 THEN 12 WHEN 2 THEN 8 ELSE 5
               END + octet_length(encode(text)) AS n_bytes,
               CASE WHEN {_PMOD.format(m=4)} = 0
                    THEN CAST(16 + {_PMOD.format(m=1024)} AS INTEGER)
               END AS width,
               CASE WHEN {_PMOD.format(m=4)} = 0
                    THEN CAST(16 + {_PMOD.format(m=977)} AS INTEGER)
               END AS height,
               CASE WHEN {_PMOD.format(m=4)} = 0
                    THEN CAST(16 + {_PMOD.format(m=1024)} AS VARCHAR)
                         || ':' || CAST(16 + {_PMOD.format(m=977)} AS VARCHAR)
                         || ':' || text
                    ELSE text
               END AS content_key
        FROM docs1
    )
    SELECT media_type,
           count(*) AS n_assets,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           count(DISTINCT content_key) AS n_distinct_contents,
           CAST(sum(CAST(width AS BIGINT) * height) AS BIGINT) AS total_pixels
    FROM typed
    GROUP BY media_type
    ORDER BY media_type
    """,
    operators=("S6", "P10", "A13"),
)
def corpus_assets_maintained_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MAINTAINED ``corpus_assets`` silver table under the hash
    gate (r14 verdict task 3 — the pre-r15 asset family synthesized its
    blobs per query; this query instead drives the corpus pipeline's
    batch admission and aggregates what the TABLE holds).

    Flow: synthesize the typed asset lake (same byte layouts as the
    rest of the family, PNG dims doc_id-derived) as a binaryFile-shaped
    frame, ingest it through ``pipelines.corpus.apply_corpus_batch``
    in TWO batches where the second batch REPLAYS every path of the
    first plus delivers the rest — the path-keyed anti-join admission
    (plus the r15 intra-batch canonical dedup) must drop all
    re-deliveries — then read the maintained parquet table back and
    profile per media type.  The oracle recomputes the per-type counts
    / bytes / distinct contents / PNG pixel sum from the id arithmetic
    on the raw documents table, so a green row proves the pipeline's
    admission is exactly-once AND its metadata extraction
    (sniff + header-dims at the ``asset_metadata_rows`` layer, not the
    query layer) is value-exact end-to-end through the maintained
    state.

    Scale shape: admission is one left-anti join keyed by path per
    batch (sized by batch x table-keys, never blob bytes — the content
    column feeds only codegen hash/sniff/dims before the append);
    the profile is one keyed aggregation over the metadata table.
    ``n_distinct_contents`` compares md5-distinct (Spark, over real
    bytes) with key-distinct (oracle, over the injective (w,h,text)
    construction)."""
    import os as _os

    from unicargo_medallion_data_pipeline_spark.pipelines.corpus import (
        ASSETS_TABLE,
        apply_corpus_batch,
    )
    from unicargo_medallion_data_pipeline_spark.sources.readers import (
        read_parquet_or_empty,
    )
    from unicargo_medallion_data_pipeline_spark.sources.staging import scratch_dir
    from unicargo_medallion_data_pipeline_spark.textops.multimodal import (
        asset_metadata_rows,
    )

    docs = docs_with_text(spark, sf_dir)
    binlike = docs.select(
        F.concat(F.lit("assets/"), F.col("doc_id").cast("string")).alias("path"),
        _typed_content(fixed_png_dims=False).alias("content"),
    ).withColumn("length", F.length("content").cast("long"))

    out_dir = scratch_dir("corpus_assets_q_")
    first = binlike.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == 0)
    apply_corpus_batch(spark, out_dir, new_assets=first)
    # Batch 2 = the FULL lake: every batch-1 path is a re-delivery the
    # exactly-once admission must drop; the rest is new.
    apply_corpus_batch(spark, out_dir, new_assets=binlike)

    assets = read_parquet_or_empty(
        spark,
        _os.path.join(out_dir, f"{ASSETS_TABLE}.parquet"),
        like=asset_metadata_rows(binlike),
    )
    return (
        assets.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("content_hash").alias("n_distinct_contents"),
            F.sum(F.col("width").cast("long") * F.col("height")).alias(
                "total_pixels"
            ),
        )
        .orderBy("media_type")
    )
