"""Streaming near-duplicate detection against a maintained signature
table (north-star: content-level dedup as a CONTINUOUS process).

``streaming/dedup.py`` guards the ingestion key space (exact re-delivery
dedup); this module runs the content tier on the same feed: every
micro-batch MinHash-signs its NEW documents only, finds near-dup pairs
against the ACCUMULATED signature table via the band-bucket equi-join
(``textops.dedup.incremental_near_dup_pairs`` — the batch-incremental
operator, reused verbatim), appends the pairs, and appends its
signatures.  Signatures are computed once per document ever; per-batch
work is sized by the batch, not the corpus — the only shape that
survives a petabyte corpus fed by a daily crawl.

Exactly-once boundaries: document admission is exactly-once (an
anti-join against the signature table drops re-deliveries of an id the
table already holds, so a crash between the two appends cannot
double-sign a document).  The PAIRS output is at-least-once across
crash replays (two non-atomic appends per batch); consumers that need
set semantics dedup on (a_id, b_id) — the rows are deterministic, so
duplicates are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from unicargo_medallion_data_pipeline_spark.sources.readers import read_parquet_or_empty
from unicargo_medallion_data_pipeline_spark.textops import dedup as dd


def start_streaming_near_dup(
    docs: DataFrame,
    signature_path: str,
    pairs_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.3,
    trigger: dict | None = None,
    await_termination: bool = True,
) -> StreamingQuery:
    """Start the continuous near-dup detector over a streaming document
    frame.  ``signature_path`` is the maintained ``(id, sh, sig)`` table
    (created on the first batch); ``pairs_path`` accumulates
    ``(a_id, b_id, jaccard)`` with a_id < b_id, exact-Jaccard rescored,
    filtered at ``threshold``."""

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs_clean = batch_df.filter(
            F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
        ).dropDuplicates([id_col])
        payload = dd.minhash_payload(
            docs_clean, id_col=id_col, text_col=text_col, k=k, shingle_n=shingle_n
        )
        existing = read_parquet_or_empty(spark, signature_path, like=payload)
        # Admission is exactly-once: ids the table already holds are
        # re-deliveries (at-least-once source or a crash replay of this
        # batch) and must not re-sign or re-pair.
        new_payload = payload.join(
            existing.select("id"), "id", "left_anti"
        ).localCheckpoint(eager=True)
        if new_payload.isEmpty():
            return
        all_payload = existing.unionByName(new_payload)
        pairs = dd.incremental_near_dup_pairs(
            new_payload, all_payload, k=k, bands=bands, threshold=threshold
        )
        # Pairs BEFORE signatures: the pair computation lazily reads the
        # pre-append signature table, so its action must run first.
        pairs.write.mode("append").parquet(pairs_path)
        new_payload.write.mode("append").parquet(signature_path)

    writer = (
        docs.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    query = writer.start()
    if await_termination:
        query.awaitTermination()
    return query
