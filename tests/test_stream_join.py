"""Stream-stream interval join: batch equivalence, cross-micro-batch
matching through checkpointed state, and the state-bound guardrails."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from unicargo_medallion_data_pipeline_spark.streaming.joins import interval_join_streams

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)

CLICK_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("click_ts", TimestampType()),
        StructField("page", StringType()),
    ]
)
BUY_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("buy_ts", TimestampType()),
        StructField("item", StringType()),
    ]
)


def _ts(seconds: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


def test_interval_join_batch_equivalence(spark):
    """Same code, batch frames: the interval condition is an ordinary
    range join — matches within [click_ts, click_ts + window] only."""
    clicks = spark.createDataFrame(
        [(1, _ts(0), "home"), (2, _ts(10), "search"), (3, _ts(20), "home")],
        CLICK_SCHEMA,
    )
    buys = spark.createDataFrame(
        [
            (1, _ts(30), "hat"),     # within 60s of click -> match
            (2, _ts(100), "shoe"),   # 90s after click, window 60s -> no match
            (4, _ts(5), "sock"),     # no click -> no match
        ],
        BUY_SCHEMA,
    )
    out = interval_join_streams(
        clicks, buys, on="user_id", left_ts="click_ts", right_ts="buy_ts",
        window="60 seconds",
    ).collect()
    assert [(r.user_id, r.item) for r in out] == [(1, "hat")]

    outer = interval_join_streams(
        clicks, buys, on="user_id", left_ts="click_ts", right_ts="buy_ts",
        window="60 seconds", how="left_outer",
    ).collect()
    assert sorted((r.user_id, r.item) for r in outer) == [
        (1, "hat"), (2, None), (3, None),
    ]


def test_interval_join_rejects_ambiguous_columns(spark):
    a = spark.createDataFrame([(1, _ts(0), "x")], CLICK_SCHEMA)
    b = spark.createDataFrame([(1, _ts(0), "x")], CLICK_SCHEMA)
    with pytest.raises(ValueError, match="ambiguous"):
        interval_join_streams(
            a, b, on="user_id", left_ts="click_ts", right_ts="click_ts"
        )
    with pytest.raises(ValueError, match="supports"):
        interval_join_streams(
            a,
            b.selectExpr("user_id", "click_ts AS buy_ts", "page AS item"),
            on="user_id", left_ts="click_ts", right_ts="buy_ts", how="full",
        )


def test_interval_join_matches_across_micro_batch_runs(spark):
    """A click whose purchase arrives in a LATER availableNow run still
    matches: both sides' state lives in the checkpoint."""
    click_src = tempfile.mkdtemp(prefix="ssj_clicks_")
    buy_src = tempfile.mkdtemp(prefix="ssj_buys_")
    ckpt = tempfile.mkdtemp(prefix="ssj_ckpt_")
    out_dir = tempfile.mkdtemp(prefix="ssj_out_")

    def write(src, schema, name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, name))

    def run_once():
        clicks = (
            spark.readStream.schema(CLICK_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(click_src)
        )
        buys = (
            spark.readStream.schema(BUY_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(buy_src)
        )
        joined = interval_join_streams(
            clicks, buys, on="user_id", left_ts="click_ts", right_ts="buy_ts",
            window="60 seconds", max_delay="2 minutes",
        )
        q = (
            joined.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r.user_id, r.item)
            for r in spark.read.parquet(out_dir).collect()
        )

    # Run 1: two clicks, one purchase -> one match; user 2's purchase
    # has not arrived yet.
    write(click_src, CLICK_SCHEMA, "b1", [(1, _ts(0), "home"), (2, _ts(10), "search")])
    write(buy_src, BUY_SCHEMA, "b1", [(1, _ts(30), "hat")])
    assert run_once() == [(1, "hat")]

    # Run 2: user 2's purchase arrives (in-window vs the stored click)
    # -> matched against run 1's state.  No re-emit of pair (1, hat).
    write(buy_src, BUY_SCHEMA, "b2", [(2, _ts(40), "shoe")])
    assert run_once() == [(1, "hat"), (2, "shoe")]


def test_interval_join_plan_is_streaming_symmetric(spark):
    """The streaming plan must be the symmetric-hash stream-stream join
    operator with watermarks on both sides (state-bounded), not a batch
    join that happens to compile."""
    clicks = (
        spark.readStream.schema(CLICK_SCHEMA)
        .parquet(tempfile.mkdtemp(prefix="ssj_p1_"))
    )
    buys = (
        spark.readStream.schema(BUY_SCHEMA)
        .parquet(tempfile.mkdtemp(prefix="ssj_p2_"))
    )
    joined = interval_join_streams(
        clicks, buys, on="user_id", left_ts="click_ts", right_ts="buy_ts"
    )
    assert joined.isStreaming
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
