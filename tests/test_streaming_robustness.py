"""Streaming paths under the round-11 adversarial datasets.

The batch catalog's robustness gate (sweep_robustness.py) cannot drive
Structured Streaming, so the three most scale-exposed streaming paths
get their own hostile-input checks: the watermarked tumbling aggregate,
the custom stateful sessionizer, and the exactly-once CDC sink, each
fed the same mutated events (NULL timestamps and keys, unicode /
multi-line / 400-char event types, duplicate rows, zero values) the
batch sweep uses.  The point is the r10 lesson repeated: streaming
robustness defects (the behind-watermark crash, the foreachBatch
re-read) only surface when the paths actually RUN on hostile data.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def hostile_events_dir(spark):
    """The r11 adversarial events table staged as a streaming source."""
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
    from unicargo_medallion_data_pipeline_spark.testing.datagen import (
        write_mutated_dataset,
    )

    gen = tempfile.mkdtemp(prefix="rb_stream_gen_")
    write_mutated_dataset(SF, gen, seed="r11stream")
    src = tempfile.mkdtemp(prefix="rb_stream_src_")
    load_table(spark, gen, "events").write.mode("overwrite").parquet(src)
    yield src
    shutil.rmtree(gen, ignore_errors=True)
    shutil.rmtree(src, ignore_errors=True)


def _schema(spark, path):
    return spark.read.parquet(path).schema


def test_tumbling_window_survives_hostile_events(spark, hostile_events_dir):
    """Watermarked tumbling agg over hostile events: no crash, and every
    EMITTED window row equals the batch aggregate for that key (windows
    the final watermark never closed may be absent — that is watermark
    semantics, not loss)."""
    from unicargo_medallion_data_pipeline_spark.streaming.readers import (
        read_streaming_path,
    )
    from unicargo_medallion_data_pipeline_spark.streaming.windows import (
        tumbling_window_agg,
    )
    from unicargo_medallion_data_pipeline_spark.streaming.writers import (
        write_stream_to_path,
    )

    out = tempfile.mkdtemp(prefix="rb_stream_out_")
    try:
        stream = tumbling_window_agg(
            read_streaming_path(
                spark, hostile_events_dir, _schema(spark, hostile_events_dir)
            )
        )
        write_stream_to_path(
            stream,
            os.path.join(out, "data"),
            checkpoint=os.path.join(out, "ckpt"),
            output_mode="append",
            trigger={"availableNow": True},
        )
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.read.parquet(os.path.join(out, "data")).collect()
        }
        batch = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in tumbling_window_agg(spark.read.parquet(hostile_events_dir))
            .filter(F.col("window_start").isNotNull())
            .collect()
        }
        assert got, "stream emitted nothing"
        for key, vals in got.items():
            assert key in batch, f"stream emitted a window batch never saw: {key}"
            assert vals == batch[key], (key, vals, batch[key])
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_stateful_sessionizer_survives_hostile_events(spark, hostile_events_dir):
    """The applyInPandasWithState sessionizer over hostile events: no
    crash, and every emitted session is internally consistent."""
    from unicargo_medallion_data_pipeline_spark.streaming.readers import (
        read_streaming_path,
    )
    from unicargo_medallion_data_pipeline_spark.streaming.stateful import (
        sessionize_with_state,
    )
    from unicargo_medallion_data_pipeline_spark.streaming.writers import (
        write_stream_to_path,
    )

    out = tempfile.mkdtemp(prefix="rb_sess_out_")
    try:
        stream = sessionize_with_state(
            read_streaming_path(
                spark, hostile_events_dir, _schema(spark, hostile_events_dir)
            )
        )
        write_stream_to_path(
            stream,
            os.path.join(out, "data"),
            checkpoint=os.path.join(out, "ckpt"),
            output_mode="append",
            trigger={"availableNow": True},
        )
        rows = spark.read.parquet(os.path.join(out, "data")).collect()
        assert rows, "sessionizer emitted nothing"
        for r in rows:
            assert r["n_events"] >= 1
            assert r["session_end"] >= r["session_start"]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_cdc_apply_survives_hostile_values(spark, hostile_events_dir):
    """The exactly-once CDC sink with hostile VALUES (unicode/multiline/
    long strings, duplicate keys within a batch): last op per key wins
    and the final state matches a per-key reduction."""
    from unicargo_medallion_data_pipeline_spark.sources.acid import ManifestTable
    from unicargo_medallion_data_pipeline_spark.streaming.readers import (
        read_streaming_path,
    )
    from unicargo_medallion_data_pipeline_spark.streaming.writers import (
        write_stream_cdc_apply,
    )

    work = tempfile.mkdtemp(prefix="rb_cdc_")
    try:
        ev = spark.read.parquet(hostile_events_dir)
        # change feed: upsert each (user, type) value; NULL keys are
        # outside the keyed-state contract (the engine's merge gate
        # raises on them by design), hostile PAYLOADS stay in
        changes = (
            ev.filter(F.col("user_id").isNotNull() & F.col("event_id").isNotNull())
            .select(
                "user_id",
                "event_type",
                "value",
                F.lit("u").alias("op"),
                F.col("event_id").cast("long").alias("_seq"),
            )
        )
        feed_dir = os.path.join(work, "feed")
        changes.write.mode("overwrite").parquet(feed_dir)
        t = ManifestTable(spark, os.path.join(work, "t"))
        t.commit(changes.drop("op", "_seq").limit(0))  # initialized, empty v0
        stream = read_streaming_path(spark, feed_dir, _schema(spark, feed_dir))
        write_stream_cdc_apply(
            stream,
            t,
            checkpoint=os.path.join(work, "ckpt"),
            key_cols=["user_id"],
            trigger={"availableNow": True},
        )
        got = {r["user_id"]: r["value"] for r in t.read().collect()}
        # expected: per user, the row with the highest _seq wins
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(
            F.desc("_seq"), F.desc_nulls_last("value")
        )
        want = {
            r["user_id"]: r["value"]
            for r in changes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .collect()
        }
        assert set(got) == set(want)
        for k in want:
            g, x = got[k], want[k]
            assert (g is None and x is None) or g == x, (k, g, x)
    finally:
        shutil.rmtree(work, ignore_errors=True)
