"""Streaming deduplication (north-star: exactly-once semantics over
at-least-once feeds — the ingestion-side guard every training-data
pipeline needs before content-level dedup runs downstream).

Two tiers, both state-bounded:

- ``dedup_stream_within_watermark`` — drops re-deliveries of the same
  business key arriving within the watermark horizon
  (``dropDuplicatesWithinWatermark``): state for a key is freed once the
  watermark passes its event time + delay, so state is O(keys per
  horizon), not O(all keys ever).
- ``dedup_stream_exact`` — classic ``dropDuplicates`` on a streaming
  DataFrame: exact forever-dedup, state grows with distinct keys (use
  only for bounded key domains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Keep the first arrival of each key within the watermark horizon."""
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        keys
    )


def dedup_stream_exact(events: DataFrame, keys: list[str]) -> DataFrame:
    """Exact streaming dedup; unbounded state — bounded key domains only."""
    return events.dropDuplicates(keys)
