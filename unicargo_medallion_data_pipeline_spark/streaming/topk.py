"""Streaming per-window top-k ("trending items"): watermarked tumbling
aggregation → rank within each FINALIZED window → append sink.

Rank/row_number are not allowed directly on a streaming DataFrame (state
for a window function over an unbounded stream is unbounded), so the
standard shape is: watermarked window aggregate in APPEND mode — whose
micro-batches contain only windows the watermark has closed — then the
rank runs INSIDE ``foreachBatch`` on the finalized, finite batch.  The
batch mirror of this exact computation is the oracle-verified
`events_window_top_types` catalog query (plans/analytics_gold3.py).

State stays bounded by the watermark; each emitted window is ranked once
and never revised.  Replay safety: ``foreachBatch`` is at-least-once —
a crash between the sink write and the checkpoint commit replays the
batch — so each batch writes its OWN ``_b=<batch_id>`` partition under
dynamic overwrite: the replay rewrites the same partition with the same
(deterministic) rows instead of appending duplicates.  Readers see the
micro-batch id as a ``_b`` column and may ignore it."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from unicargo_medallion_data_pipeline_spark.sources.staging import (
    write_dynamic_overwrite,
)
from unicargo_medallion_data_pipeline_spark.streaming.writers import _apply_trigger


def write_stream_window_topk(
    events: DataFrame,
    out_path: str,
    checkpoint: str,
    key_col: str = "event_type",
    window_width: str = "5 minutes",
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
    k: int = 1,
    trigger: dict | None = None,
    await_termination: bool = True,
) -> StreamingQuery:
    """Per tumbling window, append the top-``k`` keys by event count
    (ties kept via RANK — same tie semantics as the batch mirror).

    Output columns: window_start, window_end, <key_col>, n_events, rk.
    Only finalized windows are emitted (append mode + watermark), so a
    window's top-k is computed exactly once from its complete counts.
    """
    agg = (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_width).alias("win"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )

    def _rank_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        w = Window.partitionBy("window_start").orderBy(F.col("n_events").desc())
        top = (
            batch_df.withColumn("rk", F.rank().over(w))
            .filter(F.col("rk") <= k)
        )
        # idempotent under foreachBatch replay: overwrite THIS batch's
        # partition only (a bare append would duplicate every finalized
        # window when a crash lands between this write and the
        # checkpoint commit); dynamic mode is a per-WRITE option so a
        # concurrent full overwrite elsewhere in the session is unaffected
        write_dynamic_overwrite(
            top.withColumn("_b", F.lit(batch_id)), out_path, "_b"
        )

    writer = (
        agg.writeStream.foreachBatch(_rank_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    writer = _apply_trigger(writer, trigger)
    query = writer.start()
    if await_termination:
        query.awaitTermination()
    return query
