"""Streaming per-window top-k (streaming/topk.py): finalized windows
only, ranks match the batch mirror, ties kept, replay-safe."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
from unicargo_medallion_data_pipeline_spark.streaming.topk import write_stream_window_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dirs(spark):
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

    d = {k: tempfile.mkdtemp(prefix=f"topk_{k}_") for k in ("src", "out", "ckpt")}
    load_table(spark, SF, "events").write.mode("overwrite").parquet(d["src"])
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def test_stream_topk_matches_batch_mirror(spark, dirs):
    schema = spark.read.parquet(dirs["src"]).schema

    def run():
        write_stream_window_topk(
            read_streaming_path(spark, dirs["src"], schema),
            out_path=dirs["out"],
            checkpoint=dirs["ckpt"],
            k=1,
            await_termination=True,
        )

    run()
    got = spark.read.parquet(dirs["out"])
    n_streamed = got.count()
    assert n_streamed > 0
    # Append mode emits only watermark-finalized windows; every emitted
    # window's top types must equal the batch computation over the full
    # data (a finalized window saw all its events).
    ev = spark.read.parquet(dirs["src"])
    counts = ev.groupBy(
        F.window("ts", "5 minutes").alias("win"), "event_type"
    ).count()
    batch = (
        counts.select(
            F.col("win.start").alias("window_start"), "event_type", "count"
        )
        .withColumn(
            "mx", F.max("count").over(Window.partitionBy("window_start"))
        )
        .filter(F.col("count") == F.col("mx"))
    )
    j = got.join(batch, ["window_start", "event_type"], "left")
    assert j.filter(F.col("mx").isNull()).count() == 0, (
        "streamed top-1 rows must all be batch-verified window maxima"
    )
    assert j.filter(F.col("n_events") != F.col("count")).count() == 0

    # Replay with the same checkpoint: no duplicate windows appended.
    run()
    assert spark.read.parquet(dirs["out"]).count() == n_streamed


def test_stream_topk_keeps_ties(spark, dirs):
    """rk uses RANK: a window where two keys tie at the max emits both."""
    # construct a tiny source with a forced tie and a flusher event that
    # advances the watermark past the tied window
    src = tempfile.mkdtemp(prefix="topk_tie_src_")
    out = tempfile.mkdtemp(prefix="topk_tie_out_")
    ckpt = tempfile.mkdtemp(prefix="topk_tie_ckpt_")
    try:
        rows = [
            (1, "2024-01-01 00:01:00", "click"),
            (2, "2024-01-01 00:02:00", "view"),
            (3, "2024-01-01 00:03:00", "click"),
            (4, "2024-01-01 00:03:30", "view"),
            # flusher: one event far past the watermark horizon
            (5, "2024-01-01 09:00:00", "view"),
        ]
        df = spark.createDataFrame(rows, "event_id int, ts_s string, event_type string")
        df.select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
        ).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        write_stream_window_topk(
            read_streaming_path(spark, src, schema),
            out_path=out,
            checkpoint=ckpt,
            k=1,
            await_termination=True,
        )
        got = spark.read.parquet(out).collect()
        tied = [r for r in got if str(r["window_start"]).startswith("2024-01-01 00:00")]
        assert {r["event_type"] for r in tied} == {"click", "view"}
        assert all(r["rk"] == 1 and r["n_events"] == 2 for r in tied)
    finally:
        for p in (src, out, ckpt):
            shutil.rmtree(p, ignore_errors=True)


def test_topk_replay_does_not_duplicate(spark, dirs):
    """foreachBatch is at-least-once: a replayed batch (fresh
    checkpoint, same source) must OVERWRITE its own _b partition, not
    append a second copy of every finalized window."""
    import shutil
    import tempfile

    from unicargo_medallion_data_pipeline_spark.streaming.topk import (
        write_stream_window_topk,
    )

    src, out = dirs["src"], tempfile.mkdtemp(prefix="topk_replay_out_")
    ckpt1 = tempfile.mkdtemp(prefix="topk_ck1_")
    ckpt2 = tempfile.mkdtemp(prefix="topk_ck2_")
    try:
        schema = spark.read.parquet(src).schema

        def run(ckpt):
            write_stream_window_topk(
                spark.readStream.schema(schema).parquet(src),
                out_path=out,
                checkpoint=ckpt,
                k=3,
                window_width="5 minutes",
                watermark_delay="1 minute",
                await_termination=True,
            )

        run(ckpt1)
        n1 = spark.read.parquet(out).count()
        assert n1 > 0
        # simulate the crash-replay: wipe the checkpoint, same source
        run(ckpt2)
        assert spark.read.parquet(out).count() == n1, (
            "replayed batches appended duplicates"
        )
    finally:
        for p in (out, ckpt1, ckpt2):
            shutil.rmtree(p, ignore_errors=True)
