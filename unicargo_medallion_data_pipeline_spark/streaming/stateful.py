"""Custom stateful streaming operator: arbitrary per-key session state via
``applyInPandasWithState`` (SURVEY §2.9 T6 north-star surface; no
reference counterpart — the reference has no stateful streaming at all).

``F.session_window`` (streaming/windows.py) covers gap-sessionization
when the aggregate is expressible as built-in functions.  This operator
is the escape hatch for session logic that is NOT: per-session event
caps, first/last-event payloads, custom close conditions.  It keeps the
scale shape right:

  - state is partitioned by the group key (user_id) — each executor holds
    only its keys' state, so state scales horizontally;
  - the watermark + event-time timeout bound state size: a session's
    state is freed the moment the watermark passes ``last_ts + gap``;
  - data crosses the JVM→Python boundary in Arrow batches (grouped
    iterator), not per row.

Used in batch tests via the same function run over a file-source stream
with ``availableNow`` + checkpoint (deterministic micro-batch replay).
"""

from __future__ import annotations

import datetime as _dt
from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Emitted once per CLOSED session.
SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
        StructField("first_event_type", StringType()),
        StructField("last_event_type", StringType()),
    ]
)

#: Open-session state carried between micro-batches (one tuple per key).
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
        StructField("first_type", StringType()),
        StructField("last_type", StringType()),
    ]
)

_US = 1_000_000


def _ts_to_us(ts: Any) -> int:
    return int(ts.value // 1000) if hasattr(ts, "value") else int(
        ts.replace(tzinfo=_dt.timezone.utc).timestamp() * _US
    )


def _us_to_ts(us: int) -> _dt.datetime:
    return _dt.datetime.fromtimestamp(us / _US, tz=_dt.timezone.utc).replace(tzinfo=None)


def make_session_fn(gap_seconds: int):
    """Build the per-key stateful function (closure over the gap).

    Contract (Spark's applyInPandasWithState): called per key with an
    iterator of Arrow-batched pandas frames for this micro-batch, or with
    an empty iterator and ``state.hasTimedOut`` when the event-time
    timeout fired.  Emits 0..n rows of SESSION_SCHEMA.
    """
    import pandas as pd  # executor-side import

    gap_us = gap_seconds * _US

    def fn(
        key: tuple, pdf_iter: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key

        def emit(tup) -> "pd.DataFrame":
            start_us, last_us, n, total, ftype, ltype = tup
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [_us_to_ts(start_us)],
                    "session_end": [_us_to_ts(last_us)],
                    "n_events": [n],
                    "total_value": [float(total)],
                    "first_event_type": [ftype],
                    "last_event_type": [ltype],
                }
            )

        if state.hasTimedOut:
            # Watermark passed last_ts + gap: close and free the state.
            tup = state.get
            state.remove()
            yield emit(tup)
            return

        # Merge this micro-batch into the state as an INTERVAL merge, not
        # a forward-only fold: a late-but-within-watermark event can
        # precede the open session (batches are not globally time-
        # ordered), and the old fold either mis-stamped session_start or
        # absorbed a far-earlier event into a session it was nowhere
        # near.  Items = one [start, end, n, total, first, last]
        # aggregate per batch event plus the stored session; sorted by
        # start, adjacent items within the gap merge.  All but the last
        # (still-open) session emit.
        rows = pd.concat(list(pdf_iter), ignore_index=True).sort_values("ts")
        items = [
            [
                _ts_to_us(ts),
                _ts_to_us(ts),
                1,
                float(value) if pd.notna(value) else 0.0,
                etype,
                etype,
            ]
            for ts, etype, value in zip(
                rows["ts"], rows["event_type"], rows["value"]
            )
        ]
        if state.exists:
            items.append(list(state.get))
        items.sort(key=lambda it: it[0])
        merged: list[list] = []
        for it in items:
            if merged and it[0] - merged[-1][1] <= gap_us:
                m = merged[-1]
                if it[1] >= m[1]:
                    m[1] = it[1]
                    m[5] = it[5]
                m[2] += it[2]
                m[3] += it[3]
            else:
                merged.append(list(it))
        for closed in merged[:-1]:
            yield emit(tuple(closed))
        cur = merged[-1]
        # Close when the watermark (not wall clock) passes last_ts + gap.
        # If the watermark has ALREADY passed it, the session is closed
        # by definition — no event that could extend it can still arrive
        # (anything older than the watermark is dropped upstream) — so
        # emit now instead of registering a timeout:
        # setTimeoutTimestamp rejects a timestamp at or before the
        # current watermark (INVALID_TIMEOUT_TIMESTAMP), which the
        # round-10 sf0.1 streaming bench hit live the first time a key's
        # whole batch arrived later than other keys had pushed the
        # watermark.
        close_at_ms = cur[1] // 1000 + gap_seconds * 1000
        if close_at_ms <= state.getCurrentWatermarkMs():
            state.remove()
            yield emit(tuple(cur))
            return
        state.update(tuple(cur))
        state.setTimeoutTimestamp(close_at_ms)

    return fn


def sessionize_with_state(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessions with custom per-session payloads, emitted when
    the event-time watermark closes them.

    Works on a streaming DataFrame (file/table source); the watermark is
    mandatory for event-time timeouts.  Output mode must be ``append``.
    """
    # NULL event times never belong to any session (same rationale as the
    # as-of join's right-side filter): unfiltered, pandas renders a NULL
    # ts as NaT whose .value is int64-min, so the interval merge would
    # fabricate a far-past "session" and emit it as closed immediately.
    prepared = (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).cast("long").alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.col("event_type"),
            F.col("value").cast("double").alias("value"),
        )
        .withWatermark("ts", watermark_delay)
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
