"""Streaming progress observability (streaming/observe.py): per-micro-
batch rate/latency rows captured from a checkpointed availableNow run
and persisted to a parquet log table — the streaming analogue of the
reference's task-timing log (src/logging_utils/task_logger_utils.py)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.streaming.observe import (
    PROGRESS_SCHEMA,
    ProgressLogListener,
    capture_progress,
    progress_row,
    read_progress_log,
    write_progress_log,
)
from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path

SRC_SCHEMA = "k int, v string"


def _run_available_now(spark, tmp_path, name=None):
    src = os.path.join(tmp_path, "src")
    out = os.path.join(tmp_path, "out")
    ckpt = os.path.join(tmp_path, "ckpt")
    spark.createDataFrame([(i, f"r{i}") for i in range(100)], SRC_SCHEMA).write.mode(
        "append"
    ).parquet(src)
    writer = (
        read_streaming_path(spark, src, schema=SRC_SCHEMA)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if name:
        writer = writer.queryName(name)
    q = writer.start()
    q.awaitTermination()
    return q


def test_capture_progress_availablenow(spark, tmp_path):
    q = _run_available_now(spark, str(tmp_path))
    rows = capture_progress(q)
    assert rows, "an availableNow run over 100 rows must report progress"
    data_batches = [r for r in rows if (r["num_input_rows"] or 0) > 0]
    assert data_batches, "at least one micro-batch carried the input rows"
    b = data_batches[0]
    assert sum(r["num_input_rows"] or 0 for r in rows) == 100
    assert b["trigger_execution_ms"] is not None and b["trigger_execution_ms"] >= 0
    assert b["query_id"] and b["run_id"]
    assert b["batch_id"] is not None
    assert b["n_sources"] == 1
    assert "FileSink" in (b["sink_description"] or "")

    # persist → read back under the pinned schema
    log_path = os.path.join(str(tmp_path), "progress_log")
    write_progress_log(spark, rows, log_path)
    back = read_progress_log(spark, log_path)
    assert back.schema == PROGRESS_SCHEMA
    got = back.agg(F.sum("num_input_rows").cast("long").alias("n")).first()["n"]
    assert got == 100


def test_progress_listener_buffers_and_flushes(spark, tmp_path):
    log_path = os.path.join(str(tmp_path), "listener_log")
    listener = ProgressLogListener(spark, log_path)
    spark.streams.addListener(listener)
    try:
        _run_available_now(spark, str(tmp_path), name="observed_stream")
        # listener delivery is async (daemon thread): poll
        deadline = time.time() + 60
        while listener.pending == 0 and time.time() < deadline:
            time.sleep(0.5)
        assert listener.pending > 0, "no progress event delivered within 60s"
        n = listener.flush()
        assert n > 0 and listener.pending == 0
    finally:
        spark.streams.removeListener(listener)
    back = read_progress_log(spark, log_path)
    named = back.filter(F.col("query_name") == "observed_stream")
    assert named.count() > 0
    assert (
        named.agg(F.sum("num_input_rows").cast("long").alias("n")).first()["n"] == 100
    )


def test_progress_row_handles_sparse_payloads():
    """First-trigger payloads lack rates/eventTime/state; NaN rates and
    missing duration phases map to NULL, never to a crash."""
    minimal = {
        "id": "abc",
        "runId": "def",
        "batchId": 0,
        "numInputRows": 0,
        "inputRowsPerSecond": "NaN",
        "durationMs": {},
        "sources": [],
        "sink": {},
    }
    r = progress_row(minimal)
    assert r["query_id"] == "abc"
    # "NaN" maps to NULL — a real NaN row would poison threshold
    # comparisons (input_rows_per_sec > processed_rows_per_sec) in the
    # log table
    assert r["input_rows_per_sec"] is None
    assert progress_row({**minimal, "inputRowsPerSecond": "Infinity"})[
        "input_rows_per_sec"
    ] is None
    assert progress_row({**minimal, "inputRowsPerSecond": 12.5})[
        "input_rows_per_sec"
    ] == 12.5
    assert r["trigger_execution_ms"] is None
    assert r["watermark"] is None
    assert r["state_rows_total"] is None
    # JSON-string payload (listener .json property) round-trips too
    import json

    r2 = progress_row(json.dumps(minimal))
    assert r2["query_id"] == "abc"
