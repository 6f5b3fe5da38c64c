"""applyInPandasWithState sessionization: in-batch gap closes, watermark
event-time timeout closes, state freed, payloads correct."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _write_batch(spark, src_dir: str, name: str, rows):
    df = spark.createDataFrame(
        [(u, T0 + dt.timedelta(seconds=s), e, v) for u, s, e, v in rows], EVENTS_SCHEMA
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, name))


def _run_once(spark, src_dir: str, ckpt: str, out_dir: str, seen_before: list):
    """One availableNow pass; returns rows emitted BY THIS RUN.

    The sink is a parquet directory (the memory sink cannot recover from
    a checkpoint across restarts); emissions accumulate, so this diffs
    against the rows seen so far.
    """
    from unicargo_medallion_data_pipeline_spark.streaming.stateful import sessionize_with_state

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    sessions = sessionize_with_state(
        stream, gap_seconds=60, watermark_delay="10 seconds"
    )
    q = (
        sessions.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.schema(
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events int, total_value double, first_event_type string, "
        "last_event_type string"
    ).parquet(out_dir).collect()
    new = [r for r in rows if r not in seen_before]
    seen_before.extend(new)
    return new


@pytest.fixture(scope="module")
def dirs():
    return (
        tempfile.mkdtemp(prefix="sess_src_"),
        tempfile.mkdtemp(prefix="sess_ckpt_"),
        tempfile.mkdtemp(prefix="sess_out_"),
    )


def test_sessionization_lifecycle(spark, dirs):
    src, ckpt, out_dir = dirs
    seen: list = []

    # Batch 1: user 1 has three events inside one session; user 2 has one.
    _write_batch(
        spark,
        src,
        "b1",
        [
            (1, 0, "login", 1.0),
            (1, 10, "click", 2.0),
            (1, 20, "buy", 3.5),
            (2, 0, "login", 9.0),
        ],
    )
    out1 = _run_once(spark, src, ckpt, out_dir, seen)
    assert out1 == [], "nothing should close before any gap/watermark passes"

    # Batch 2: user 1 returns 10 minutes later.  Two closes this run:
    #   - user 1's first session closes IN-BATCH (gap exceeded between
    #     consecutive events of the same key);
    #   - user 2's closes via EVENT-TIME TIMEOUT: availableNow keeps
    #     micro-batching until no work remains, and the new data advances
    #     the watermark to t0+590s, past user 2's t0+60s timeout.
    _write_batch(spark, src, "b2", [(1, 600, "login", 1.0)])
    out2 = {r["user_id"]: r for r in _run_once(spark, src, ckpt, out_dir, seen)}
    assert sorted(out2) == [1, 2]
    s = out2[1]
    assert s["n_events"] == 3
    assert s["total_value"] == pytest.approx(6.5)
    assert s["first_event_type"] == "login" and s["last_event_type"] == "buy"
    assert (s["session_end"] - s["session_start"]).total_seconds() == 20
    assert out2[2]["n_events"] == 1
    assert out2[2]["total_value"] == pytest.approx(9.0)

    # Batch 3: an unrelated user advances the watermark past user 1's
    # second-session timeout (t0+660s) -> timeout close; user 3's own
    # session (timeout t0+1260s) stays open.
    _write_batch(spark, src, "b3", [(3, 1200, "login", 0.0)])
    out3 = _run_once(spark, src, ckpt, out_dir, seen)
    assert [r["user_id"] for r in out3] == [1]
    assert out3[0]["n_events"] == 1

    # Batch 4: watermark moves past user 3's timeout; users 1/2 emit
    # nothing again, proving timed-out state was removed.
    _write_batch(spark, src, "b4", [(4, 2400, "login", 0.0)])
    out4 = _run_once(spark, src, ckpt, out_dir, seen)
    users4 = sorted(r["user_id"] for r in out4)
    assert users4 == [3], f"only user 3 should close here, got {users4}"


def test_batch_mirror_matches_session_window(spark):
    """The stateful operator's session boundaries agree with
    F.session_window on the same batch data (count/sum per session)."""
    rows = [
        (1, 0, "a", 1.0),
        (1, 30, "b", 1.0),
        (1, 200, "c", 1.0),  # > 60s gap -> second session
        (2, 0, "a", 5.0),
    ]
    df = spark.createDataFrame(
        [(u, T0 + dt.timedelta(seconds=s), e, v) for u, s, e, v in rows], EVENTS_SCHEMA
    )
    ref = (
        df.groupBy("user_id", F.session_window("ts", "60 seconds"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .select("user_id", "n", "tv")
        .collect()
    )
    assert sorted((r["user_id"], r["n"], r["tv"]) for r in ref) == [
        (1, 1, 1.0),
        (1, 2, 2.0),
        (2, 1, 5.0),
    ]


def test_late_event_extends_session_start_backwards(spark):
    """A late-but-within-watermark event EARLIER than the open session
    must pull session_start (and first_event_type) backwards — the old
    forward-only fold absorbed it but kept the later start."""
    src = tempfile.mkdtemp(prefix="sess2_src_")
    ckpt = tempfile.mkdtemp(prefix="sess2_ckpt_")
    out_dir = tempfile.mkdtemp(prefix="sess2_out_")
    seen: list = []

    # batch 1: the session opens at t0+100
    _write_batch(spark, src, "b1", [(5, 100, "mid", 1.0)])
    assert _run_once(spark, src, ckpt, out_dir, seen) == []
    # batch 2: t0+95 — above the watermark (90) but BEFORE the session
    _write_batch(spark, src, "b2", [(5, 95, "early", 2.0)])
    assert _run_once(spark, src, ckpt, out_dir, seen) == []
    # batch 3: far-future event advances the watermark past the timeout
    _write_batch(spark, src, "b3", [(5, 600, "later", 0.0)])
    out = _run_once(spark, src, ckpt, out_dir, seen)
    (s,) = [r for r in out if r["n_events"] == 2]
    assert s["session_start"] == T0 + dt.timedelta(seconds=95)
    assert s["session_end"] == T0 + dt.timedelta(seconds=100)
    assert s["first_event_type"] == "early"
    assert s["last_event_type"] == "mid"
    assert s["total_value"] == pytest.approx(3.0)


def test_events_behind_watermark_close_immediately():
    """Round-10 find (hit live by the sf0.1 streaming bench): a key
    whose merged session ends more than `gap` before the current
    watermark cannot be extended by any future event, and
    setTimeoutTimestamp rejects past timestamps
    (INVALID_TIMEOUT_TIMESTAMP) — the query crashed.  The function must
    emit such a session immediately instead of registering a timeout.
    Unit-level pin (whether behind-watermark rows reach the UDF depends
    on Spark's late-filter path — continuous runs differ from
    checkpoint restarts; the bench's continuous run delivered them)."""
    import pandas as pd

    from unicargo_medallion_data_pipeline_spark.streaming.stateful import (
        make_session_fn,
    )

    class _FakeState:
        def __init__(self, watermark_ms):
            self._wm = watermark_ms
            self.exists = False
            self.hasTimedOut = False
            self.removed = False
            self.updated = None
            self.timeout_set = None

        def getCurrentWatermarkMs(self):
            return self._wm

        def remove(self):
            self.removed = True

        def update(self, tup):
            self.updated = tup

        def setTimeoutTimestamp(self, ts_ms):
            if ts_ms <= self._wm:
                raise ValueError("INVALID_TIMEOUT_TIMESTAMP (would crash)")
            self.timeout_set = ts_ms

    fn = make_session_fn(gap_seconds=60)
    rows = pd.DataFrame(
        {
            "ts": [T0 + dt.timedelta(seconds=10), T0 + dt.timedelta(seconds=20)],
            "event_type": ["c", "c"],
            "value": [1.0, 2.0],
        }
    )
    # watermark three days past the session close: emit now, free state
    wm_ms = int((T0 + dt.timedelta(days=3)).timestamp() * 1000)
    state = _FakeState(wm_ms)
    out = list(fn((3,), iter([rows]), state))
    assert state.removed and state.timeout_set is None
    assert len(out) == 1
    emitted = out[0].iloc[0]
    assert emitted["n_events"] == 2 and emitted["total_value"] == 3.0

    # watermark BEFORE the close time: normal path — state kept, timeout set
    state2 = _FakeState(int(T0.timestamp() * 1000) - 10_000)
    out2 = list(fn((3,), iter([rows]), state2))
    assert not state2.removed and state2.timeout_set is not None
    assert out2 == []  # open session not emitted
