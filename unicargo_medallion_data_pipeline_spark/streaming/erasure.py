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

import json

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


def write_stream_erasure_manifest(
    requests: DataFrame,
    table,
    checkpoint: str,
    key_cols: list[str],
    trigger: dict | None = None,
    await_termination: bool = True,
) -> StreamingQuery:
    """Exactly-once erasure INCLUDING the audit: the target is a
    manifest-committed table
    (:class:`~unicargo_medallion_data_pipeline_spark.sources.acid.ManifestTable`),
    and each micro-batch's delete and its audit rows travel in ONE
    atomic manifest commit — the upgrade path the plain-parquet variant
    above documents as impossible for itself.

    Per batch: anti-join the current version against the batch's keys,
    commit the survivors as the next version with
    ``meta = {"erasure_batch_id": N, "erasure_audit": [...]}`` pinned to
    the version read.  Crash anywhere before the manifest rename →
    nothing happened (staged files are invisible); crash after → the
    replayed batch is FENCED by the recorded ``erasure_batch_id`` (max
    over all versions, so interleaved non-erasure commits can't mask
    it).  Audit rows are therefore exactly-once: they exist iff their
    delete is visible.

    Read the accumulated audit back with :func:`erasure_audit_frame`.
    Audit volume is human-scale (one row per (batch, key_grain)), so
    carrying it in manifest metadata keeps O(files + versions) driver
    metadata.
    """
    from pyspark.sql import functions as FX

    def _erase_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if _max_erasure_batch(table) >= batch_id:
            return  # replay of a committed erasure batch: fenced
        vs = table.versions()
        if not vs:
            raise FileNotFoundError(
                f"no committed version at {table.path} — erasure needs an "
                "initialized target table"
            )
        base = vs[-1]
        current = table.read(version=base)
        keys = batch_df.select(*key_cols).distinct()
        # NULL-keyed deletion requests would silently delete nothing
        # (NULL never equi-joins) and leave NO audit row — the same
        # compliance hazard propagate_deletes raises for; enforce it
        # here too rather than diverging from the parquet sibling.
        null_cond = None
        for kc in key_cols:
            c = FX.col(kc).isNull()
            null_cond = c if null_cond is None else (null_cond | c)
        if keys.filter(null_cond).limit(1).count():
            raise ValueError(
                f"erasure request batch {batch_id} contains NULL values "
                f"in {key_cols}; a NULL key never matches and would "
                "silently skip the deletion"
            )
        survivors = current.join(keys, key_cols, "left_anti")
        # audit BEFORE the commit, from the same pinned version
        hit = (
            current.join(keys, key_cols, "left_semi")
            .groupBy(*key_cols)
            .agg(FX.count(FX.lit(1)).alias("rows_deleted"))
            .collect()
        )
        # manifest meta is JSON: serialize key values through the SAME
        # function the manifest uses for stats (dates/timestamps → ISO,
        # decimals → exact text), so one value never carries two formats
        # in one file; str() only for anything _json_safe passes through
        def _safe(v):
            from unicargo_medallion_data_pipeline_spark.sources.acid import _json_safe

            v = _json_safe(v)
            return v if isinstance(v, (int, float, str, bool, type(None))) else str(v)

        audit = [
            {
                **{k: _safe(r[k]) for k in key_cols},
                "rows_deleted": r["rows_deleted"],
            }
            for r in hit
        ]
        table.commit(
            survivors,
            mode="overwrite",
            base_version=base,
            meta={"erasure_batch_id": batch_id, "erasure_audit": audit},
        )

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


def _max_erasure_batch(table) -> int:
    """Highest committed erasure batch id across ALL versions (-1 if
    none): the fence must survive interleaved non-erasure commits that
    would reset ``latest_meta``.  Delegates to the shared fence
    primitive ``ManifestTable.max_meta_int`` (also used by the CDC
    sink's ``cdc_batch_id`` fence)."""
    return table.max_meta_int("erasure_batch_id")


def erasure_audit_frame(spark, table) -> DataFrame:
    """The exactly-once audit: one row per (version, batch, key, count),
    reconstructed from manifest metadata.

    RETENTION: the audit lives in per-version manifests, so
    ``ManifestTable.vacuum`` expiring a version deletes its audit rows
    too (the replay FENCE survives via ``meta_max``; the per-batch
    history does not).  A compliance archive must therefore EXPORT this
    frame to a durable log table before vacuuming — the same contract
    as Delta, where ``VACUUM``/log retention bounds how far back the
    history/CDF audit reaches."""
    rows = []
    for v in table.versions():
        m = table._read_manifest(v).get("meta", {})
        if "erasure_batch_id" in m:
            for a in m.get("erasure_audit", []):
                rows.append((v, m["erasure_batch_id"], json.dumps(a, sort_keys=True)))
    if not rows:
        return spark.createDataFrame(
            [], "version int, batch_id bigint, audit_json string"
        )
    return spark.createDataFrame(
        rows, "version int, batch_id bigint, audit_json string"
    )
