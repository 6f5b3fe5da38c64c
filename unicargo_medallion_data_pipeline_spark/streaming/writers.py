"""Streaming sinks (SURVEY §2.1 S10-S11, §2.9 T1-T5).

Reference counterpart: ``src/streaming/writers.py:12-131``:
  - ``write_stream_to_table``: configurable trigger (availableNow default /
    processingTime / once), output mode, checkpoint, optional
    awaitTermination.
  - ``write_stream_with_merge``: foreachBatch upsert.  The reference has a
    bug here (SURVEY T4): it creates the temp view from ``batch_df`` but
    merges ``streaming_df`` — this engine merges the micro-batch, which is
    the only correct exactly-once shape.

Checkpointing: one checkpoint dir per (table, operation) — reusing a
checkpoint across different queries corrupts offsets (reference keeps the
same convention, ``src/streaming/checkpoints.py``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from unicargo_medallion_data_pipeline_spark.sources.merge import merge_upsert_partitioned
from unicargo_medallion_data_pipeline_spark.sources.writers import delta_available


# Shared type guard: the hash family and sort orders reject map/variant
# (functions/hashing.py is the single definition all full-row-hash
# sites use; the local name survives for this module's callers).
from unicargo_medallion_data_pipeline_spark.functions.hashing import (  # noqa: E402
    md5_row_json as _md5_row_json,
    xxhashable as _xxhashable,
)


def _apply_trigger(writer, trigger: dict | None):
    """T1 — trigger config: {'availableNow': True} (default),
    {'processingTime': '10 seconds'}, or {'once': True}."""
    if trigger is None:
        trigger = {"availableNow": True}
    return writer.trigger(**trigger)


def write_stream_to_table(
    df: DataFrame,
    table: str,
    checkpoint: str,
    output_mode: str = "append",
    trigger: dict | None = None,
    file_format: str | None = None,
    query_name: str | None = None,
    partition_by: list[str] | None = None,
    await_termination: bool = True,
) -> StreamingQuery:
    """S10 — writeStream → managed table with checkpointed progress.

    With the default availableNow trigger this is incremental batch:
    process everything new, then stop — the reference's ingestion shape.
    """
    fmt = file_format or ("delta" if delta_available() else "parquet")
    writer = (
        df.writeStream.format(fmt)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if query_name:
        writer = writer.queryName(query_name)
    writer = _apply_trigger(writer, trigger)
    query = writer.toTable(table)
    if await_termination:
        query.awaitTermination()
    return query


def write_stream_to_path(
    df: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "append",
    trigger: dict | None = None,
    file_format: str | None = None,
    partition_by: list[str] | None = None,
    await_termination: bool = True,
) -> StreamingQuery:
    """S10 variant — writeStream → path sink."""
    fmt = file_format or ("delta" if delta_available() else "parquet")
    writer = (
        df.writeStream.format(fmt)
        .option("checkpointLocation", checkpoint)
        .option("path", path)
        .outputMode(output_mode)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer = _apply_trigger(writer, trigger)
    query = writer.start()
    if await_termination:
        query.awaitTermination()
    return query


def write_stream_with_merge(
    df: DataFrame,
    target_path: str,
    checkpoint: str,
    merge_keys: list[str],
    partition_col: str,
    seq_col: str | None = None,
    trigger: dict | None = None,
    await_termination: bool = True,
) -> StreamingQuery:
    """S11/T4 — foreachBatch upsert: each micro-batch MERGEs into the
    target (batch_df, not the unbounded streaming frame — fixing the
    reference's T4 bug).  Exactly-once comes from the checkpoint +
    idempotent per-key merge.

    The batch is reduced to ONE winner per key before the merge (same
    rule as the CDC sink): an at-least-once feed routinely delivers two
    updates for a key in one micro-batch, and unreduced duplicates
    either kill a Delta MERGE ("multiple source rows matched…") or land
    as duplicate key rows through the parquet fallback's union.
    ``seq_col`` names a monotonic per-key sequence for the tiebreak
    (LSN-like); without one the winner is the row greatest under the
    non-key columns — deterministic, but supply a sequence when a key
    can genuinely change twice in a batch."""

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Pin the micro-batch: the merge references batch_df from
        # several actions (emptiness gate, winner reduction, touched-
        # partition collect, anti-join, union-write), and a foreachBatch
        # frame re-evaluates — re-reading the batch's source files —
        # per action (round-10 streaming bench measured ~2.8x input
        # re-reads on the CDC twin of this sink).  Spill-safe persist;
        # released in the finally.
        batch_df = batch_df.persist()
        try:
            _merge_batch_pinned(batch_df)
        finally:
            batch_df.unpersist()

    def _merge_batch_pinned(batch_df: DataFrame) -> None:
        if batch_df.isEmpty():
            return
        # No-seq tiebreak: greatest under the ORDERABLE non-key columns.
        # Maps (and variants) are not orderable in Spark — including them
        # fails analysis on the first map-carrying batch (same defect
        # class as the CDC tiebreak's r8 ADVICE fix; orderability and
        # hashability share the map/variant restriction set).  Dropping
        # them from the ordering silently made two rows differing ONLY
        # in a map column tie — an md5 of the full payload JSON (which
        # CAN render maps) breaks those ties last, so the pick stays
        # deterministic over the whole row image (round-10 ADVICE item 1,
        # mirroring apply_cdc_batch).
        non_keys = [c for c in batch_df.columns if c not in merge_keys]
        order = (
            [F.col(seq_col).desc()]
            if seq_col
            else [
                F.col(f.name).desc()
                for f in batch_df.schema.fields
                if f.name not in merge_keys and _xxhashable(f.dataType)
            ]
            + ([_md5_row_json(non_keys).desc()] if non_keys else [])
        ) or [F.lit(1)]
        w = Window.partitionBy(*merge_keys).orderBy(*order)
        winners = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        merge_upsert_partitioned(
            batch_df.sparkSession,
            target_path,
            winners,
            merge_keys=merge_keys,
            partition_col=partition_col,
            # winners are already one row per key (the window above) —
            # skip the merge's per-batch duplicate-key agg job
            check_duplicate_keys=False,
        )

    writer = (
        df.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    writer = _apply_trigger(writer, trigger)
    query = writer.start()
    if await_termination:
        query.awaitTermination()
    return query


def write_stream_to_manifest(
    df: DataFrame,
    table,
    checkpoint: str,
    mode: str = "append",
    trigger: dict | None = None,
    await_termination: bool = True,
) -> StreamingQuery:
    """Exactly-once streaming sink over a manifest-committed table
    (``sources/acid.ManifestTable``): each micro-batch is ONE atomic
    commit, fenced by the batch id.

    Two independent mechanisms give exactly-once:

    * the streaming checkpoint replays a batch at most from its last
      uncommitted offset, and
    * the manifest records the running max committed ``batch_id``
      (``max_meta_int`` — one manifest read, robust to interleaved
      non-stream commits like compaction or erasure that would reset
      ``latest_meta``); a replayed batch with ``batch_id`` ≤ the
      recorded one is SKIPPED — so even a crash between the manifest
      rename and the checkpoint write (the classic foreachBatch
      double-apply window) cannot append the same batch twice.

    The fence is PERMANENT (survives compaction, erasure, restore,
    vacuum) — so an intentional rebuild with a fresh checkpoint, whose
    batch ids restart at 0, must first call
    ``table.reset_fence("batch_id")`` or its batches are silently
    skipped as replays.  A reader never observes a torn batch: commits
    are single renames.

    ``mode="overwrite"`` pairs with ``outputMode("complete")``: each
    batch then carries the FULL result (aggregated streams only — Spark
    rejects complete mode otherwise) and the commit replaces the table
    with it.  Update mode would be WRONG here: it emits only the groups
    the batch changed, so an overwrite commit would silently drop every
    unchanged group from the table.
    """

    def _commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if table.max_meta_int("batch_id") >= batch_id:
            return  # replay of an already-committed batch
        table.commit(batch_df, mode=mode, meta={"batch_id": batch_id})

    writer = (
        df.writeStream.foreachBatch(_commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("complete" if mode == "overwrite" else "append")
    )
    writer = _apply_trigger(writer, trigger)
    query = writer.start()
    if await_termination:
        query.awaitTermination()
    return query


def write_stream_cdc_apply(
    changes: DataFrame,
    table,
    checkpoint: str,
    key_cols: list[str],
    op_col: str = "op",
    trigger: dict | None = None,
    await_termination: bool = True,
) -> StreamingQuery:
    """Exactly-once CDC apply (the Debezium-sink shape): each micro-batch
    carries row images tagged ``op`` ∈ {'u', 'd'} ('u' = upsert full row,
    'd' = delete by key); the batch's upserts AND deletes land in ONE
    atomic manifest commit, fenced by batch id.

    Within-batch semantics: the LAST op per key wins (CDC streams are
    ordered per key; ties inside one batch resolve by a deterministic
    monotonic sequence column ``_seq`` if present, else arbitrarily —
    upstream CDC readers provide LSN-like sequence numbers, and the
    docstring contract requires one when a key can change twice in a
    batch).  Apply = current state, minus all touched keys, plus the
    winning upsert rows.  Crash anywhere: either the whole batch's
    effect is visible (fence skips the replay) or none of it is.

    The fence reads the MAX ``cdc_batch_id`` across ALL versions
    (``table.max_meta_int``), not just the latest manifest: an
    interleaved non-CDC commit (append, compaction, erasure, restore)
    replaces ``latest_meta`` and would otherwise erase the fence,
    letting a checkpoint replay re-apply a stale CDC batch on top of
    newer table state (stale upserts resurrecting old values, deletes
    re-firing) — same hazard and same fix as the erasure sink's
    ``_max_erasure_batch``.  The fence is permanent by design;
    intentional reprocessing from a fresh checkpoint requires
    ``table.reset_fence("cdc_batch_id")`` first.
    """
    def _apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Pin the micro-batch: apply_cdc_batch references it from
        # several actions (emptiness gate, winner window, touched-key
        # anti-join, commit write), and an unpinned foreachBatch frame
        # re-reads its source files per action — the round-10 sf0.1
        # streaming bench measured ~2.8x input re-reads before this pin.
        batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            if table.max_meta_int("cdc_batch_id") >= batch_id:
                return  # replay of a committed CDC batch: fenced
            apply_cdc_batch(
                table, batch_df, key_cols, op_col=op_col, batch_id=batch_id
            )
        finally:
            batch_df.unpersist()

    writer = (
        changes.writeStream.foreachBatch(_apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    writer = _apply_trigger(writer, trigger)
    query = writer.start()
    if await_termination:
        query.awaitTermination()
    return query


def apply_cdc_batch(
    table,
    batch_df: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    batch_id: int | None = None,
) -> int:
    """Apply ONE batch of CDC rows (op 'u' = upsert full row image,
    'd' = delete by key; last op per key wins, ordered by ``_seq`` when
    present) into a manifest table as a single atomic base-pinned
    commit.  Shared by :func:`write_stream_cdc_apply` (which adds the
    batch-id fence around it) and batch/backfill callers.  Returns the
    committed version."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    vs = table.versions()
    if not vs:
        raise FileNotFoundError(
            f"no committed version at {table.path} — CDC apply needs an "
            "initialized target table (commit a seed/empty version first)"
        )
    base = vs[-1]
    current = table.read(version=base)
    # No-_seq tiebreak is a FULL-ROW HASH, not monotonically_increasing_id:
    # the mono id depends on partition order, so a retried task could pick
    # a DIFFERENT winner than the original attempt mid-write (the
    # SPARK-23207 class the engine's W2 design-out and skew.py both ban).
    # The hash pick is still arbitrary among ties — the docstring contract
    # requires `_seq` when a key can change twice per batch — but it is
    # the SAME arbitrary pick on every attempt at any parallelism.
    # xxhash64 rejects MapType (analysis error), so only hashable columns
    # feed the hash; an all-unhashable row falls back to its JSON
    # rendering.  A 64-bit collision between two distinct tied rows would
    # silently reintroduce nondeterminism, so a 128-bit md5 of the JSON
    # row image breaks those ties second (r8 ADVICE item 2).
    if "_seq" in batch_df.columns:
        order = [F.col("_seq").desc()]
    else:
        hashable = [
            f.name for f in batch_df.schema.fields if _xxhashable(f.dataType)
        ]
        row_json = F.to_json(F.struct(*[F.col(c) for c in batch_df.columns]))
        primary = (
            F.xxhash64(*[F.col(c) for c in hashable])
            if hashable
            else F.xxhash64(row_json)
        )
        order = [primary.desc(), F.md5(row_json).desc()]
    winners = (
        batch_df.withColumn(
            "_rn", F.row_number().over(W.partitionBy(*key_cols).orderBy(*order))
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    touched = winners.select(*key_cols).distinct()
    survivors = current.join(touched, key_cols, "left_anti")
    upserts = winners.filter(F.col(op_col) == "u").select(*current.columns)
    meta = {"cdc_batch_id": batch_id} if batch_id is not None else None
    return table.commit(
        survivors.unionByName(upserts),
        mode="overwrite",
        base_version=base,
        meta=meta,
    )
