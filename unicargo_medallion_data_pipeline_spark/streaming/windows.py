"""Event-time windowed aggregation with watermarks (SURVEY §2.9 T6 — the
reference's streaming gap: it streams table→table with no event-time
logic, so these semantics are designed from Spark's public streaming
model, not ported).

All three window shapes over a watermarked event-time column:
  - tumbling: fixed, non-overlapping buckets
  - sliding: overlapping buckets (slide < width)
  - session: gap-based dynamic windows (``F.session_window``)

The watermark bounds state: rows later than ``watermark_delay`` behind the
max seen event time are dropped and their windows finalized — that bound
is what makes unbounded streams aggregable with finite memory at any
scale.  These functions accept either a streaming or a batch DataFrame
(the expressions are identical; watermarks no-op in batch), which is also
how they are tested deterministically."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    window_width: str = "5 minutes",
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Counts + value sums per (tumbling window, event_type)."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_width).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window_width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Overlapping windows: each event lands in width/slide buckets."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_width, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessions per user: a session closes after ``gap`` of
    inactivity.  The streaming-native form of the batch sessionization in
    plans/tpch_gold2.events_sessionization."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(ts_col, gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )
