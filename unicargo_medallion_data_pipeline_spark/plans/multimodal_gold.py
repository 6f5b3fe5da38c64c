"""Multimodal binary plumbing under the hash gate (round 6).

The multimodal surface (``textops/multimodal.py`` — opaque binary
content + typed metadata, Arrow-batched mapInPandas decode/feature/
resize stages) was pytest-only: real media codecs can't run here, so no
value-level oracle existed.  This module closes the gap for the part
that CAN be value-verified: the Arrow plumbing itself.  Documents'
UTF-8 bytes stand in as deterministic binary payloads; the feature
stage's byte statistics (length, md5, mean byte, error channel) are
exactly SQL-expressible, so the ENTIRE binary → mapInPandas → features
path gets a bit-level DuckDB oracle.  A real image/audio codec swaps
into the same stage without touching any of the verified plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.plans.catalog import register
from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
from unicargo_medallion_data_pipeline_spark.textops.multimodal import extract_features


@register(
    "doc_binary_asset_features",
    sql="""
    SELECT CAST(doc_id AS INTEGER) AS doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS content_hash,
           CASE WHEN octet_length(encode(text)) = 0 THEN NULL
                ELSE CAST(list_aggregate(
                       list_transform(string_split(text, ''), x -> ascii(x)),
                       'sum') AS DOUBLE)
                     / octet_length(encode(text))
           END AS mean_byte,
           CASE WHEN octet_length(encode(text)) = 0
                THEN 'error: empty asset: nothing to decode'
                ELSE 'ok'
           END AS decode_status
    FROM documents
    -- ASCII universe: the oracle's per-char code-point sum equals the
    -- Python byte sum only when bytes == chars; non-ASCII and NULL
    -- assets are covered by the pytest error channels (r11 sweep)
    WHERE text IS NOT NULL AND octet_length(encode(text)) = length(text)
    ORDER BY doc_id
    """,
    operators=("P4", "P5"),
)
def doc_binary_asset_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal feature stage (Arrow-batched ``mapInPandas``
    byte-level decode) under the hash gate: documents' UTF-8 bytes as
    binary assets → ``textops.multimodal.extract_features`` → per-asset
    n_bytes / md5 / mean-byte / decode-status, hash-verified against a
    DuckDB byte-level oracle (the corpus is pure ASCII, so DuckDB's
    per-char code-point sum equals the Python byte sum; md5 hashes the
    same UTF-8 bytes on both sides; the mean is exact-int-sum ÷ length,
    one IEEE division).

    What this proves that pytest alone couldn't: the Python batch
    boundary is value-exact — Arrow binary round-trip, per-batch
    vectorization, and the per-row error channel produce bit-identical
    results to a declarative recomputation.  Scale shape: one narrow
    map over Arrow batches, no shuffle until the final presentation
    sort; a real codec swaps into the identical stage."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & (F.octet_length("text") == F.length("text"))  # ASCII universe
    )
    assets = docs.select(
        F.col("doc_id").cast("int").alias("asset_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    return (
        extract_features(assets)
        .select(
            F.col("asset_id").alias("doc_id"),
            "n_bytes",
            "content_hash",
            "mean_byte",
            "decode_status",
        )
        .orderBy("doc_id")
    )
