"""Per-key quota enforcement: running counts survive micro-batch
boundaries, overflow is flagged not dropped, and the v1/v2 state APIs
share one semantics contract (v2 runs only where its protobuf runtime
dependency exists; this container lacks it, so v2 paths auto-skip)."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pytest
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

OUT_SCHEMA = (
    "user_id long, ts timestamp, event_type string, value double, "
    "seq long, accepted boolean"
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _v2_available() -> bool:
    from unicargo_medallion_data_pipeline_spark.streaming.quota import state_v2_available

    return state_v2_available()


def _rows(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(seconds=s), e, v) for u, s, e, v in rows],
        EVENTS_SCHEMA,
    )


def _drain(spark, src, out, ckpt, name, rows, **quota_kwargs):
    from unicargo_medallion_data_pipeline_spark.streaming.quota import enforce_quota

    _rows(spark, rows).coalesce(1).write.parquet(os.path.join(src, name))
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        enforce_quota(stream, **quota_kwargs)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_quota_counts_span_micro_batches(spark):
    root = tempfile.mkdtemp(prefix="quota_")
    src, out, ckpt = (os.path.join(root, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)

    # Batch 1: user 1 sends 2 events, user 2 sends 1.
    _drain(spark, src, out, ckpt, "b1",
           [(1, 0, "click", 1.0), (1, 1, "click", 2.0), (2, 0, "view", 3.0)],
           limit=3)
    # Batch 2: user 1 sends 3 more — seq continues 3,4,5; 4 and 5 overflow.
    _drain(spark, src, out, ckpt, "b2",
           [(1, 2, "click", 4.0), (1, 3, "click", 5.0), (1, 4, "click", 6.0)],
           limit=3)

    got = {
        (r["user_id"], r["ts"]): (r["seq"], r["accepted"])
        for r in spark.read.schema(OUT_SCHEMA).parquet(out).collect()
    }
    t = lambda s: T0 + dt.timedelta(seconds=s)
    assert got == {
        (1, t(0)): (1, True),
        (1, t(1)): (2, True),
        (2, t(0)): (1, True),
        (1, t(2)): (3, True),
        (1, t(3)): (4, False),
        (1, t(4)): (5, False),
    }


def test_in_batch_ordering_follows_event_time_not_arrival(spark):
    """Rows arriving out of event-time order within one micro-batch are
    sequenced by ts (the operator's order_cols), so admission is
    deterministic under shuffled input."""
    root = tempfile.mkdtemp(prefix="quota_")
    src, out, ckpt = (os.path.join(root, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    _drain(spark, src, out, ckpt, "b1",
           [(7, 5, "late", 1.0), (7, 1, "early", 2.0), (7, 3, "mid", 3.0)],
           limit=2)
    rows = sorted(
        spark.read.schema(OUT_SCHEMA).parquet(out).collect(),
        key=lambda r: r["seq"],
    )
    assert [r["event_type"] for r in rows] == ["early", "mid", "late"]
    assert [r["accepted"] for r in rows] == [True, True, False]


def test_string_key_carries_through_with_own_counter(spark):
    """A non-numeric key (string tenant id) must key its own quota
    counter with its original name/type — regression for the cast-to-
    long projection that collapsed non-numeric keys to one NULL
    counter (or failed under ANSI)."""
    from unicargo_medallion_data_pipeline_spark.streaming.quota import enforce_quota

    schema = StructType(
        [
            StructField("tenant", StringType()),
            StructField("ts", TimestampType()),
            StructField("payload", StringType()),
        ]
    )
    root = tempfile.mkdtemp(prefix="quota_str_")
    src, out, ckpt = (os.path.join(root, d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)
    rows = [
        ("acme", T0 + dt.timedelta(seconds=s), f"a{s}") for s in range(3)
    ] + [("beta", T0 + dt.timedelta(seconds=s), f"b{s}") for s in range(2)]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        os.path.join(src, "b1")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        enforce_quota(stream, limit=2, key_col="tenant")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.schema(
        "tenant string, ts timestamp, payload string, seq long, accepted boolean"
    ).parquet(out)
    by_tenant = {}
    for r in got.collect():
        assert r["tenant"] is not None  # never NULL-collapsed
        by_tenant.setdefault(r["tenant"], []).append((r["seq"], r["accepted"]))
    assert sorted(by_tenant["acme"]) == [(1, True), (2, True), (3, False)]
    assert sorted(by_tenant["beta"]) == [(1, True), (2, True)]


def test_quota_validates_columns_at_api_boundary(spark):
    from unicargo_medallion_data_pipeline_spark.streaming.quota import enforce_quota

    df = _rows(spark, [(1, 0, "x", 1.0)])
    with pytest.raises(ValueError, match="missing quota columns"):
        enforce_quota(df, limit=1, key_col="tenant")
    with pytest.raises(ValueError, match="collide with quota output"):
        enforce_quota(df.withColumn("seq", df.user_id), limit=1)


def test_v1_rejects_ttl_rather_than_leaking(spark):
    from unicargo_medallion_data_pipeline_spark.streaming.quota import enforce_quota

    with pytest.raises(ValueError, match="TTL requires the v2"):
        enforce_quota(_rows(spark, [(1, 0, "x", 1.0)]), limit=1,
                      ttl_ms=1000, api="v1")


@pytest.mark.skipif(not _v2_available(), reason="protobuf runtime absent")
def test_v2_batch_mode_matches_v1_stream_semantics(spark):
    """transformWithState on a batch frame = one stream pass from empty
    state (runs only where google.protobuf is installed)."""
    from unicargo_medallion_data_pipeline_spark.streaming.quota import (
        enforce_quota,
        use_rocksdb_state,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(key, None)
    use_rocksdb_state(spark)
    try:
        rows = [(u, s, "click", float(s)) for u in (1, 2, 3) for s in range(5)]
        out = enforce_quota(_rows(spark, rows), limit=2, api="v2").collect()
        assert len(out) == 15
        per_user = {}
        for r in out:
            per_user.setdefault(r["user_id"], []).append(r)
        for rs in per_user.values():
            rs.sort(key=lambda r: r["seq"])
            assert [r["seq"] for r in rs] == [1, 2, 3, 4, 5]
            assert [r["accepted"] for r in rs] == [True, True, False, False, False]
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)


#: TTL differential scenario, encoded as data so the expectation is
#: pinned NOW and provable the moment a protobuf-enabled environment
#: appears (same auto-activation posture as tests/test_delta_activation).
#: With ttl_ms well under the inter-batch gap, user 1's accepted-counter
#: must EXPIRE between drains: batch 2 restarts at seq 1 (accepted again)
#: rather than continuing 4,5 (rejected).  Without TTL the continuation
#: behavior is what test_stream_quota_counts_span_micro_batches pins.
TTL_SCENARIO = {
    "limit": 2,
    "ttl_ms": 1_000,
    "gap_seconds": 5.0,
    "batch1": [(1, 0, "a", 1.0), (1, 1, "b", 2.0), (1, 2, "c", 3.0)],
    "batch2": [(1, 10, "d", 4.0), (1, 11, "e", 5.0)],
    "expected": {  # event_type -> (seq, accepted)
        "a": (1, True),
        "b": (2, True),
        "c": (3, False),
        "d": (1, True),  # state expired → counter reset
        "e": (2, True),
    },
}


@pytest.mark.skipif(not _v2_available(), reason="protobuf runtime absent")
def test_v2_ttl_expires_idle_counters(spark):
    """State-v2 TTL semantics against the recorded TTL_SCENARIO vector."""
    import time

    from unicargo_medallion_data_pipeline_spark.streaming.quota import (
        use_rocksdb_state,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(key, None)
    use_rocksdb_state(spark)
    try:
        root = tempfile.mkdtemp(prefix="quota_ttl_")
        src, out, ckpt = (os.path.join(root, d) for d in ("src", "out", "ckpt"))
        os.makedirs(src)
        _drain(spark, src, out, ckpt, "b1", TTL_SCENARIO["batch1"],
               limit=TTL_SCENARIO["limit"], ttl_ms=TTL_SCENARIO["ttl_ms"],
               api="v2")
        time.sleep(TTL_SCENARIO["gap_seconds"])
        _drain(spark, src, out, ckpt, "b2", TTL_SCENARIO["batch2"],
               limit=TTL_SCENARIO["limit"], ttl_ms=TTL_SCENARIO["ttl_ms"],
               api="v2")
        got = {
            r["event_type"]: (r["seq"], r["accepted"])
            for r in spark.read.schema(OUT_SCHEMA).parquet(out).collect()
        }
        assert got == TTL_SCENARIO["expected"]
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)


def test_admission_order_spans_arrow_chunk_boundaries(spark):
    """A key's micro-batch rows arrive as multiple Arrow chunks when they
    exceed arrow.maxRecordsPerBatch; admission must still follow event
    time across ALL chunks (regression: a per-chunk sort made seq depend
    on the chunking)."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prior = spark.conf.get(key, None)
    spark.conf.set(key, "7")
    try:
        root = tempfile.mkdtemp(prefix="quota_chunks_")
        src, out, ckpt = (os.path.join(root, d) for d in ("src", "out", "ckpt"))
        os.makedirs(src)
        # 30 rows for one user, timestamps shuffled so event-time order
        # disagrees with arrival order across chunk boundaries.
        secs = [(s * 13) % 30 for s in range(30)]
        _drain(spark, src, out, ckpt, "b1",
               [(1, s, f"e{s}", float(s)) for s in secs], limit=10)
        rows = sorted(
            spark.read.schema(OUT_SCHEMA).parquet(out).collect(),
            key=lambda r: r["seq"],
        )
        assert [r["ts"] for r in rows] == sorted(r["ts"] for r in rows)
        accepted = {r["event_type"] for r in rows if r["accepted"]}
        assert accepted == {f"e{s}" for s in range(10)}  # 10 earliest by ts
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
