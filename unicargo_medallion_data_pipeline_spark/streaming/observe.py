"""Streaming rate/latency observability: micro-batch progress → log table.

Reference counterpart: ``src/logging_utils/task_logger_utils.py:69,118``
captures per-task timings and row counts into a log table for BATCH
steps.  The engine's batch analogue is ``quality/observe.py`` (Spark
Observation API — metrics piggyback on the producing job).  This module
closes the STREAMING side of that asymmetry: Structured Streaming
already computes per-micro-batch rate and latency metrics
(StreamingQueryProgress — input rows, rows/s in and out, per-phase
durations, watermark, state-store size); it only needs to be captured
and persisted.

Two capture paths, both normalizing to the same flat schema:

* :func:`capture_progress` — pull-based: after a checkpointed
  ``availableNow`` run terminates, drain ``query.recentProgress``.
  Synchronous and complete for incremental-batch pipelines (the
  engine's default trigger shape), no listener lifecycle to manage.
* :class:`ProgressLogListener` — push-based ``StreamingQueryListener``
  for always-on queries: buffers each progress event as it is
  delivered; :meth:`ProgressLogListener.flush` appends the buffer to
  the log table.  Listener delivery is asynchronous (a dedicated
  daemon thread), so flush AFTER ``awaitTermination`` and treat the
  log as eventually-complete — the contract continuous monitoring
  wants, not a commit barrier.

The log is one narrow row per (query_id, batch_id): append-only,
human-scale volume (one row per trigger, not per task), partitionable
by date at lake scale.  Lag diagnosis reads directly off it:
``input_rows_per_sec > processed_rows_per_sec`` sustained means the
query is falling behind; ``state_rows_total`` growth without bound
means a missing watermark.
"""

from __future__ import annotations

import json
import math
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

try:  # PySpark >= 3.4 exposes the Python listener API
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover - ancient PySpark
    StreamingQueryListener = object  # type: ignore[assignment,misc]

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("query_name", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("batch_ts", T.StringType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("input_rows_per_sec", T.DoubleType()),
        T.StructField("processed_rows_per_sec", T.DoubleType()),
        T.StructField("trigger_execution_ms", T.LongType()),
        T.StructField("add_batch_ms", T.LongType()),
        T.StructField("get_batch_ms", T.LongType()),
        T.StructField("commit_offsets_ms", T.LongType()),
        T.StructField("watermark", T.StringType()),
        T.StructField("state_rows_total", T.LongType()),
        T.StructField("state_memory_bytes", T.LongType()),
        T.StructField("n_sources", T.IntegerType()),
        T.StructField("sink_description", T.StringType()),
    ]
)


def _to_dict(p: Any) -> dict:
    """Normalize a progress payload: dict (recentProgress), an object
    with a ``json`` str property (listener events), or a JSON string."""
    if isinstance(p, dict):
        return p
    if isinstance(p, str):
        return json.loads(p)
    j = getattr(p, "json", None)
    if j is not None:
        return json.loads(j() if callable(j) else j)
    raise TypeError(f"unsupported progress payload: {type(p)!r}")


def _opt_long(v) -> int | None:
    return None if v is None else int(v)


def progress_row(p: Any) -> dict:
    """Flatten one StreamingQueryProgress payload onto PROGRESS_SCHEMA.

    Rate fields can be absent or non-numeric ("NaN") on the first
    trigger; duration phases differ by trigger type — absent keys map
    to NULL, never to a crash."""
    d = _to_dict(p)
    dur = d.get("durationMs") or {}
    state = d.get("stateOperators") or []
    ev = d.get("eventTime") or {}

    def _rate(key: str) -> float | None:
        v = d.get(key)
        try:
            v = None if v is None else float(v)
        except (TypeError, ValueError):
            return None
        # First-trigger payloads carry the literal string "NaN";
        # float("NaN") is a real NaN that would poison threshold
        # comparisons over the log table — map non-finite to NULL as the
        # docstring promises.
        return v if v is not None and math.isfinite(v) else None

    return {
        "query_id": str(d.get("id")),
        "run_id": str(d.get("runId")),
        "query_name": d.get("name"),
        "batch_id": _opt_long(d.get("batchId")),
        "batch_ts": d.get("timestamp"),
        "num_input_rows": _opt_long(d.get("numInputRows")),
        "input_rows_per_sec": _rate("inputRowsPerSecond"),
        "processed_rows_per_sec": _rate("processedRowsPerSecond"),
        "trigger_execution_ms": _opt_long(dur.get("triggerExecution")),
        "add_batch_ms": _opt_long(dur.get("addBatch")),
        "get_batch_ms": _opt_long(dur.get("getBatch")),
        "commit_offsets_ms": _opt_long(
            dur.get("commitOffsets", dur.get("walCommit"))
        ),
        "watermark": ev.get("watermark"),
        "state_rows_total": (
            sum(int(s.get("numRowsTotal", 0)) for s in state) if state else None
        ),
        "state_memory_bytes": (
            sum(int(s.get("memoryUsedBytes", 0)) for s in state) if state else None
        ),
        "n_sources": len(d.get("sources") or []),
        "sink_description": (d.get("sink") or {}).get("description"),
    }


def capture_progress(query) -> list[dict]:
    """All progress rows a (finished or running) query retains —
    ``recentProgress`` holds the last
    ``spark.sql.streaming.numRecentProgressUpdates`` (default 100)
    triggers, which covers an ``availableNow`` incremental-batch run
    completely."""
    return [progress_row(p) for p in query.recentProgress]


def write_progress_log(
    spark: SparkSession, rows: list[dict], path: str
) -> DataFrame:
    """Append progress rows to the parquet log table at ``path`` and
    return the appended frame.  Volume is one row per trigger — driver
    memory is never the constraint; the write is one tiny file per
    flush, compactable like any log table."""
    df = spark.createDataFrame(rows, PROGRESS_SCHEMA)
    df.write.mode("append").parquet(path)
    return df


def read_progress_log(spark: SparkSession, path: str) -> DataFrame:
    """The accumulated progress log."""
    return spark.read.schema(PROGRESS_SCHEMA).parquet(path)


class ProgressLogListener(StreamingQueryListener):
    """Push-based capture for always-on queries: buffer every progress
    event; :meth:`flush` appends the buffer to the log table.

    Delivery is asynchronous — Spark invokes listeners on a daemon
    thread after each trigger.  ``flush`` is therefore the observation
    boundary, not the trigger itself.  Register with
    ``spark.streams.addListener(listener)``; remove with
    ``spark.streams.removeListener(listener)`` when done."""

    def __init__(self, spark: SparkSession, log_path: str):
        self._spark = spark
        self._log_path = log_path
        self._buffer: list[dict] = []

    # -- StreamingQueryListener contract ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        self._buffer.append(progress_row(event.progress))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- capture ----------------------------------------------------------
    @property
    def pending(self) -> int:
        return len(self._buffer)

    def flush(self) -> int:
        """Append buffered rows to the log table; returns how many."""
        rows, self._buffer = self._buffer, []
        if rows:
            write_progress_log(self._spark, rows, self._log_path)
        return len(rows)
