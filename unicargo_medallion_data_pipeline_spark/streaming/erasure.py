"""Streaming key-erasure: consume a stream of deletion requests
(GDPR/CCPA "forget me" events) and propagate each micro-batch of keys
into a stored table, appending the per-partition audit to a compliance
log.

Composition of two engine pieces the reference has neither of:
``operators/deletes.propagate_deletes`` (partition-scoped rewrite +
audit) driven through the S11-style ``foreachBatch`` sink
(``streaming/writers.write_stream_with_merge``).  The request stream is
typically tiny (human-initiated events), so the per-batch cost is the
rewrite of the partitions containing the requested keys — the same
bounded work a scheduled batch job would do, but with seconds-grade
latency.

Delivery semantics — stated precisely (r5 advisory review):

* the DELETE is exactly-once: the checkpoint makes request consumption
  exactly-once, and ``propagate_deletes`` is idempotent (a replayed
  key matches nothing), so crash-replay cannot delete twice;
* the AUDIT is at-most-once under crash replay: a crash in the window
  after the partition rewrite completes but before the audit append
  replays the batch against already-deleted keys, producing an empty
  audit — the original batch's audit rows are lost.  The audit can
  never over-claim (no row is logged for a delete that didn't happen);
  it can under-claim across a crash.  Upgrading it to exactly-once
  requires the delete and its audit to share one atomic commit — i.e.
  a :class:`~unicargo_medallion_data_pipeline_spark.sources.acid.ManifestTable`
  target whose manifest carries both the surviving file list and the
  batch-fenced audit metadata; for a plain partitioned-parquet target
  the two writes cannot be made atomic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from unicargo_medallion_data_pipeline_spark.operators.deletes import propagate_deletes
from unicargo_medallion_data_pipeline_spark.streaming.writers import _apply_trigger


def write_stream_erasure(
    requests: DataFrame,
    target_path: str,
    audit_path: str,
    checkpoint: str,
    key_cols: list[str],
    partition_col: str,
    trigger: dict | None = None,
    await_termination: bool = True,
) -> StreamingQuery:
    """Apply each micro-batch of ``requests`` (rows carrying
    ``key_cols``) as a key-erasure against the table at ``target_path``;
    append the operator's audit (stamped with ``batch_id``) to
    ``audit_path``.

    Empty batches are skipped entirely — no table read, no audit row.
    The audit parquet accumulates one row per (batch, touched
    partition): the artifact a data-protection officer replays to prove
    WHEN each subject's rows left the table.
    """

    def _erase_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        audit = propagate_deletes(
            spark,
            target_path,
            batch_df.select(*key_cols),
            key_cols=key_cols,
            partition_col=partition_col,
        )
        rows = audit.withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        if rows.isEmpty():
            return
        rows.write.mode("append").parquet(audit_path)

    writer = (
        requests.writeStream.foreachBatch(_erase_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    writer = _apply_trigger(writer, trigger)
    query = writer.start()
    if await_termination:
        query.awaitTermination()
    return query
