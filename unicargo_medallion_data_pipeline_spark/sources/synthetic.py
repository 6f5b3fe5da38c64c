"""Custom connector via Spark's Python DataSource API: a deterministic,
partition-parallel synthetic-events generator (batch + streaming).

Why an engine needs this: at 100 TB you cannot smoke-test a pipeline by
copying 100 TB of fixtures around — you generate load IN PLACE, on the
executors, in parallel, with zero input I/O and zero driver involvement
beyond planning.  This is the dsdgen/TPC pattern (each worker generates
its slice from a seed), expressed through Spark 4's Python DataSource
API (SPARK-44076) so it composes with everything else in the engine:
``spark.read.format("synthetic_events")`` yields an ordinary DataFrame
with pushdown-able columns, and ``spark.readStream`` yields an
offset-tracked, replayable micro-batch stream for exercising the
streaming surface (watermarks, dedup, stateful ops) without Kafka.

Determinism contract (the part that makes this a test oracle, not just a
firehose): every value is a pure function of ``(seed, row_index)`` —
NOT of partitioning, task scheduling, or retry count.  A task retry
regenerates byte-identical rows (the SPARK-23207 class of bugs that the
salting advisory flagged cannot occur), and the same (seed, rows)
options produce the same table on any cluster size.  Rows are produced
as Arrow RecordBatches (the API's vectorized path), generated per-slice
with numpy — no per-row Python loop.

Schema (mirrors the driver's ``events`` table so every existing
events-family operator runs unchanged on generated data):
``event_id bigint, ts timestamp, user_id bigint, event_type string,
value double``.

Reference parity note: the reference's sources are fixed CSV/Delta scans
(SURVEY §2.1 S1-S4); a pluggable generator source is beyond-reference
surface in the same family.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

#: Deterministic event-type vocabulary (index = code stored in the rng draw).
EVENT_TYPES = ("view", "click", "purchase", "error")

_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double"
)

#: 2024-01-01T00:00:00 UTC in epoch microseconds — generation epoch.
_T0_US = 1_704_067_200_000_000


def _gen_batch(seed: int, start: int, end: int, n_users: int):
    """Generate rows [start, end) as one Arrow RecordBatch.

    Counter-based, not stream-based randomness: values come from a
    stateless per-index hash (splitmix64 finalizer), never from a
    sequentially-advanced RNG — a sequential generator seeded per slice
    would make values depend on slice boundaries, and repartitioning or
    retrying would change the data.  Hashing row indices directly means
    ANY slicing of the row space yields identical values row-for-row.
    """
    import numpy as np
    import pyarrow as pa

    idx = np.arange(start, end, dtype=np.uint64)

    def mix(v: "np.ndarray", salt: int) -> "np.ndarray":
        # splitmix64 finalizer — stateless per-index hash, vectorized.
        # (salt offset reduced in Python ints: numpy scalar mul overflows)
        x = v + np.uint64((salt * 0x9E3779B97F4A7C15) % (1 << 64))
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return x

    # Channel salts stride by 4 (channels 1..3, slot 0 unused), so no two
    # (seed, channel) pairs ever share a salt: seed*2+{1,2,3} would give
    # seed N's value channel the same salt as seed N+1's base channel,
    # correlating nominally independent seeds.
    base = mix(idx, seed * 4 + 1)
    user = (mix(idx, seed * 4 + 2) % np.uint64(n_users)).astype(np.int64)
    etype_code = (base % np.uint64(len(EVENT_TYPES))).astype(np.int64)
    # value in [0, 100) with 2 decimals — same shape as events.value.
    value = ((mix(idx, seed * 4 + 3) % np.uint64(10_000)).astype(np.float64)) / 100.0
    # ~3 events/second arrival: monotone in event_id, jittered within.
    ts_us = (
        _T0_US
        + idx.astype(np.int64) * 333_333
        + (base % np.uint64(300_000)).astype(np.int64)
    )

    return pa.record_batch(
        {
            "event_id": pa.array(idx.astype(np.int64), pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(
                np.take(np.array(EVENT_TYPES), etype_code), pa.string()
            ),
            "value": pa.array(value, pa.float64()),
        }
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _opts(options) -> tuple[int, int, int]:
    rows = int(options.get("rows", 1000))
    seed = int(options.get("seed", 0))
    n_users = int(options.get("users", 100))
    if rows < 0 or n_users <= 0:
        raise ValueError("rows must be >= 0 and users > 0")
    return rows, seed, n_users


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows, self.seed, self.n_users = _opts(options)
        self.n_partitions = int(options.get("partitions", 8))
        if self.n_partitions <= 0:
            raise ValueError("partitions must be > 0")

    def partitions(self) -> Sequence[InputPartition]:
        per = -(-self.rows // self.n_partitions) if self.rows else 1
        return [
            _RangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, max(self.rows, 1), per)
        ]

    def read(self, partition: _RangePartition) -> Iterator:
        if partition.end > partition.start:
            yield _gen_batch(
                self.seed, partition.start, partition.end, self.n_users
            )


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Offset-tracked micro-batch generator.

    Offsets are row counts (``{"index": n}``): replayable and exact —
    restarting from a checkpoint regenerates precisely the uncommitted
    rows, byte-identical (the determinism contract above), giving
    exactly-once output through the same checkpointed-offset mechanism a
    file or Kafka source uses.  ``total_rows`` caps the stream:
    ``trigger(availableNow=True)`` drains to the cap and stops (the
    incremental-backfill pattern the engine's streaming writers default
    to), and a restart with a raised cap emits only the delta.

    ``latestOffset`` always reports the cap rather than paging — the
    Python DataSource API exposes no admission control (ReadLimit), and
    per-poll paging breaks under availableNow, which snapshots
    latestOffset exactly once per run.  Batch-size pacing, where needed,
    belongs to the writer's trigger cadence plus the cap.
    """

    def __init__(self, options):
        _, self.seed, self.n_users = _opts(options)
        self.total_rows = int(options.get("total_rows", 10_000))
        self.n_partitions = int(options.get("partitions", 4))
        if self.total_rows < 0 or self.n_partitions <= 0:
            raise ValueError("total_rows must be >= 0 and partitions > 0")

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": self.total_rows}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["index"], end["index"]
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        per = -(-(hi - lo) // self.n_partitions)
        return [
            _RangePartition(p, min(p + per, hi)) for p in range(lo, hi, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator:
        if partition.end > partition.start:
            yield _gen_batch(
                self.seed, partition.start, partition.end, self.n_users
            )

    def commit(self, end: dict) -> None:
        pass  # nothing to release — generation is stateless


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``.

    Options: ``rows`` (batch row count), ``seed``, ``users``,
    ``partitions``; streaming replaces ``rows`` with ``total_rows``
    (stream cap — availableNow drains to it; restarts emit the delta).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotently register the connector with a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
