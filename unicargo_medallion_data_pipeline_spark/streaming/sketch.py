"""Streaming KMV sketch-table maintenance: a foreachBatch sink that
keeps a per-grain bottom-k distinct sketch (operators/sketch.py) up to
date as events arrive, committed atomically through a ManifestTable.

The lake pattern this implements: facts stream in once, and a tiny
mergeable summary table (≤ |grains|·k rows) answers distinct-count
questions over any grain subset forever — no fact rescan, no unbounded
streaming state.  Spark's own streaming dropDuplicates would need state
proportional to |distinct ids|; this sink's state is the SKETCH itself,
bounded by construction.

Exactly-once WITHOUT idempotency tricks: the merge
(stored ∪ batch → distinct → re-cut bottom-k) is itself idempotent —
replaying a crashed batch re-unions rows that are already present and
the re-cut lands on the same bottom-k (set union is idempotent;
bottom-k of a set is a function of the set).  The ManifestTable commit
makes each version atomic and time-travelable, so a reader never sees a
half-merged sketch and the sketch's own history is queryable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from unicargo_medallion_data_pipeline_spark.operators.sketch import (
    KMV_K,
    kmv_bottom_k,
)
from unicargo_medallion_data_pipeline_spark.sources.acid import ManifestTable
from unicargo_medallion_data_pipeline_spark.streaming.writers import _apply_trigger


def write_stream_kmv_sketch(
    events: DataFrame,
    table_path: str,
    checkpoint: str,
    key_col: str = "event_type",
    id_col: str = "user_id",
    k: int = KMV_K,
    trigger: dict | None = None,
    await_termination: bool = True,
) -> StreamingQuery:
    """Maintain the per-``key_col`` KMV sketch table under streaming
    ingest.  Each micro-batch: cut the batch to its own bottom-k rows
    (map-side tiny), union with the stored sketch, re-cut, commit one
    new ManifestTable version.  Merge soundness = the KMV mergeability
    theorem (operators/sketch.py), so the maintained table equals the
    from-scratch sketch over all data seen so far — asserted exactly in
    tests/test_stream_sketch.py.
    """
    spark = events.sparkSession

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_sk = kmv_bottom_k(batch_df, [key_col], id_col, k)
        t = ManifestTable(spark, table_path)
        vs = t.versions()
        if vs:
            base = vs[-1]
            stored = t.read(version=base)
            merged = kmv_bottom_k(
                stored.unionByName(batch_sk), [key_col], id_col, k
            )
        else:
            base = -1  # "table must not exist yet" pin
            merged = batch_sk
        # Pin before the overwrite: `merged` reads the CURRENT version's
        # files, which the new commit supersedes (same crash-window
        # reasoning as the SCD2 manifest variant).
        merged = merged.localCheckpoint(eager=True)
        # base-pinned: an interleaved commit (backfill, second stream)
        # raises ConcurrentCommitError instead of being silently
        # overwritten by a merge derived from the stale read; the query
        # restart then replays the batch over the winner's state (the
        # KMV merge is idempotent under replay).
        t.commit(merged, mode="overwrite", base_version=base)

    writer = events.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint
    )
    writer = _apply_trigger(writer, trigger or {"availableNow": True})
    q = writer.start()
    if await_termination:
        q.awaitTermination()
    return q
