"""Python DataSource connector: deterministic synthetic-events generator.

The contract under test is the one that makes the source safe at scale:
values are a pure function of (seed, row_index) — independent of
partition count, task scheduling, and restarts — and the streaming form
is an offset-tracked replayable source that drains to its cap under
availableNow and resumes from a checkpoint without duplicating rows.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

ROWS = 2_000


def _read(spark, **opts):
    from unicargo_medallion_data_pipeline_spark.sources.synthetic import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def _fingerprint(df):
    return (
        df.select(F.md5(F.concat_ws("|", *df.columns)).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")))
        .collect()[0][0]
    )


def test_batch_schema_count_and_bounds(spark):
    df = _read(spark, rows=ROWS, seed=7, users=50, partitions=8)
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value",
    ]
    assert df.count() == ROWS
    row = df.agg(
        F.countDistinct("event_id").alias("ids"),
        F.max("user_id").alias("max_u"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    ).collect()[0]
    assert row["ids"] == ROWS  # event_id is the row index: unique
    assert row["max_u"] < 50 and 0.0 <= row["min_v"] and row["max_v"] < 100.0


def test_partition_count_and_slice_independence(spark):
    """Same (seed, rows) must generate identical data regardless of how
    the row space is sliced into partitions — the retry/rescale safety
    property."""
    a = _read(spark, rows=ROWS, seed=3, partitions=2)
    b = _read(spark, rows=ROWS, seed=3, partitions=13)
    assert a.rdd.getNumPartitions() == 2
    assert b.rdd.getNumPartitions() == 13
    assert _fingerprint(a) == _fingerprint(b)
    # ...and a different seed must actually change the data.
    c = _read(spark, rows=ROWS, seed=4, partitions=2)
    assert _fingerprint(a) != _fingerprint(c)


def test_generated_events_run_existing_operators(spark):
    """The schema mirrors the driver's events table, so events-family
    operators run unchanged on generated data."""
    from unicargo_medallion_data_pipeline_spark.streaming.windows import (
        tumbling_window_agg,
    )

    df = _read(spark, rows=ROWS, seed=1)
    out = tumbling_window_agg(df, window_width="5 minutes")
    assert out.count() > 0


def test_stream_drains_to_cap_and_resumes_without_duplicates(spark):
    from unicargo_medallion_data_pipeline_spark.sources.synthetic import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    root = tempfile.mkdtemp(prefix="synth_stream_")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")

    def drain(total):
        # The parquet file sink binds its metadata log to ONE output dir
        # per checkpoint, so the resumed drain writes to the same path.
        q = (
            spark.readStream.format("synthetic_events")
            .option("seed", 9)
            .option("total_rows", total)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain(total=1_000)
    first = spark.read.parquet(out)
    assert first.count() == 1_000
    assert first.select(F.countDistinct("event_id")).collect()[0][0] == 1_000

    # Restart with a raised cap and the SAME checkpoint: exactly the new
    # rows [1000, 1500) are appended — offsets replay, nothing duplicates.
    drain(total=1_500)
    both = spark.read.parquet(out)
    ids = sorted(r[0] for r in both.select("event_id").collect())
    assert ids == list(range(1_500))

    # The full drained output is byte-identical to a batch read of the
    # same row range (stream and batch share the generation contract).
    assert _fingerprint(both) == _fingerprint(_read(spark, rows=1_500, seed=9))


def test_adjacent_seed_channels_not_correlated():
    """Regression: with seed*2+{1,2,3} channel salts, seed N's value salt
    (2N+3) equaled seed N+1's base salt (2(N+1)+1), so seed N's
    (value*100) % 4 reproduced seed N+1's event_type code row-for-row.
    Striding salts by 4 removes the overlap."""
    import numpy as np

    from unicargo_medallion_data_pipeline_spark.sources.synthetic import (
        EVENT_TYPES,
        _gen_batch,
    )

    a = _gen_batch(5, 0, 400, 37)
    b = _gen_batch(6, 0, 400, 37)
    a_value_mod4 = (
        np.rint(np.asarray(a["value"], dtype=np.float64) * 100).astype(np.int64) % 4
    )
    b_codes = np.array([EVENT_TYPES.index(t) for t in b["event_type"].to_pylist()])
    assert (a_value_mod4 == b_codes).mean() < 0.5  # ~0.25 when independent


def test_gen_batch_slice_independence_property():
    """Property (no Spark needed): concatenating _gen_batch over ANY
    partitioning of [0, n) equals one whole-range batch — the retry /
    rescale safety contract at its core."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from unicargo_medallion_data_pipeline_spark.sources.synthetic import _gen_batch

    import pyarrow as pa

    @settings(max_examples=50, deadline=None)
    @given(
        seed=st.integers(min_value=0, max_value=2**31),
        n=st.integers(min_value=1, max_value=500),
        cuts=st.sets(st.integers(min_value=1, max_value=499), max_size=6),
    )
    def check(seed, n, cuts):
        bounds = [0, *sorted(c for c in cuts if c < n), n]
        whole = pa.Table.from_batches([_gen_batch(seed, 0, n, 37)])
        sliced = pa.Table.from_batches(
            [_gen_batch(seed, lo, hi, 37) for lo, hi in zip(bounds, bounds[1:])]
        )
        assert whole.equals(sliced)

    check()
