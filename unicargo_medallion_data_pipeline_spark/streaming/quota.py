"""Per-key streaming quota enforcement (admission control).

The operator shape every ingest pipeline needs: each key (user, tenant,
device) carries a running accepted-count; events beyond ``limit`` are
emitted flagged ``accepted = false`` rather than silently dropped, so
downstream can route rejects to a quarantine table and replays stay
idempotent at the row level.

Two interchangeable engines behind one API:

- **state v2** (``transformWithStateInPandas``, Spark 4 / SPARK-49564):
  named typed state variables, per-state TTL, RocksDB-backed — the
  surface a long-lived pipeline should target, and the one that makes
  100-TB state feasible (executor-local RocksDB with changelog
  checkpointing, not JVM heap).  Its Python driver worker needs the
  ``protobuf`` package at runtime (``pyspark/sql/streaming/proto``), so
  environments without it cannot run this path.
- **state v1** (``applyInPandasWithState``): tuple-typed per-key state,
  no TTL/timers, but fully functional everywhere PySpark runs.

``enforce_quota(..., api="auto")`` picks v2 when ``protobuf`` is
importable, else v1.  Both engines implement the SAME determinism
contract: per key, events are processed in ``order_cols`` order WITHIN
each micro-batch; across batches, order is batch arrival order — the
same rule every streaming aggregation lives with.  State is one bigint
per key, the smallest possible footprint.

v2 additionally requires the RocksDB state store provider
(``use_rocksdb_state``); v1 runs on any provider.
"""

from __future__ import annotations

import importlib.util
from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Importable without protobuf (only the v2 RUNTIME workers need it);
# subclassing keeps the base's default handleExpiredTimer /
# handleInitialState implementations.
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

#: Per-key state: accepted-count so far.
STATE_SCHEMA = "n bigint"


def quota_output_schema(events: DataFrame) -> "StructType":
    """Output schema of :func:`enforce_quota`: the input schema (key kept
    with its original name and type — a string tenant id is as valid a
    quota key as a bigint user id) plus ``seq``/``accepted``."""
    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    return StructType(
        [*events.schema.fields,
         StructField("seq", LongType(), nullable=False),
         StructField("accepted", BooleanType(), nullable=False)]
    )


def state_v2_available() -> bool:
    """transformWithState's Python workers import google.protobuf."""
    try:
        # find_spec raises (rather than returning None) when the parent
        # 'google' namespace package itself is absent.
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def use_rocksdb_state(spark: SparkSession) -> None:
    """Switch the session's state store to RocksDB (v2-API requirement;
    also the right provider for large state generally)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )


def _annotate(pdfs: Iterator["pd.DataFrame"], n: int, limit: int,
              order_cols: list[str]):
    """Assign running seq from offset ``n``; the shared kernel of both
    engines.  The iterator is drained and CONCATENATED before sorting —
    both state APIs deliver one key's micro-batch rows as arbitrarily
    split Arrow chunks (``spark.sql.execution.arrow.maxRecordsPerBatch``
    boundaries), and a per-chunk sort would make admission depend on the
    chunking rather than on event time (same pattern as
    streaming/stateful.py's session fold)."""
    import numpy as np
    import pandas as pd

    chunks = list(pdfs)
    if not chunks:
        # Timer/timeout invocations deliver zero chunks; emit nothing
        # rather than crashing in pd.concat.
        return None, n
    rows = pd.concat(chunks, ignore_index=True).sort_values(
        order_cols, kind="mergesort"
    )
    seq = np.arange(1, len(rows) + 1, dtype="int64") + n
    out = rows.assign(seq=seq, accepted=seq <= limit)
    return out, (int(seq[-1]) if len(seq) else n)


def _make_v1_fn(limit: int, order_cols: tuple[str, ...]):
    cols = list(order_cols)

    def fn(
        key: Any, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        n = state.get[0] if state.exists else 0
        out, n = _annotate(pdfs, n, limit, cols)
        if out is not None:
            yield out
        state.update((n,))

    return fn


class QuotaProcessor(StatefulProcessor):
    """state-v2 processor: accepted-count in a named ValueState; ``ttl_ms``
    optionally expires idle keys' counters (the leak-prevention contract
    at unbounded key cardinality — the v1 API has no equivalent)."""

    def __init__(self, limit: int, order_cols: tuple[str, ...], ttl_ms: int | None):
        self._limit = limit
        self._order_cols = list(order_cols)
        self._ttl_ms = ttl_ms

    def init(self, handle: Any) -> None:
        self._count = handle.getValueState("accepted_count", STATE_SCHEMA, self._ttl_ms)

    def handleInputRows(
        self, key: Any, rows: Iterator["pd.DataFrame"], timerValues: Any
    ) -> Iterator["pd.DataFrame"]:
        state = self._count.get()
        n = int(state[0]) if state is not None else 0
        out, n = _annotate(rows, n, self._limit, self._order_cols)
        if out is not None:
            yield out
        self._count.update((n,))

    def close(self) -> None:
        pass


def enforce_quota(
    events: DataFrame,
    limit: int,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts",),
    ttl_ms: int | None = None,
    api: str = "auto",
) -> DataFrame:
    """Annotate a stream with per-key admission decisions.

    Every input event is emitted exactly once — all input columns pass
    through unchanged (``key_col`` keeps its original name AND type, so
    string tenant ids work) — with ``seq`` (1-based running order index
    per key) and ``accepted`` (seq within ``limit``) appended.
    ``api``: ``"v2"`` | ``"v1"`` | ``"auto"`` (v2 when its
    protobuf dependency is importable).  ``ttl_ms`` is honored by v2
    only (and switches the query to processing-time mode, which Spark
    requires for TTL state); v1 raises if it is set, rather than
    silently leaking state.

    Checkpoint pinning: the two engines are DIFFERENT stateful physical
    operators with incompatible checkpointed state.  ``"auto"`` is for
    new queries; a production query that must survive restarts should
    pin ``api`` explicitly, because an environment change (protobuf
    appearing) would otherwise re-resolve "auto" to an engine that
    cannot read the existing checkpoint.  The v2 path additionally
    requires the RocksDB provider (``use_rocksdb_state``) to be set
    before start — deliberately NOT auto-applied here, since mutating
    session conf inside an operator would leak far past this query.
    """
    if api == "auto":
        api = "v2" if state_v2_available() else "v1"
    if api not in ("v1", "v2"):
        raise ValueError(f"api must be v1|v2|auto, got {api!r}")
    if api == "v1" and ttl_ms is not None:
        raise ValueError("state TTL requires the v2 API (transformWithState)")

    # The key is carried through with its ORIGINAL name and type (never
    # cast): a string tenant id grouped as-is keys correctly, whereas a
    # cast-to-long would fail under ANSI or collapse every non-numeric
    # key to one NULL quota counter.  All other input columns pass
    # through untouched; the output schema is derived from the input.
    names = set(events.columns)
    missing = [c for c in (key_col, *order_cols) if c not in names]
    if missing:
        raise ValueError(f"input is missing quota columns: {missing}")
    clashes = [c for c in ("seq", "accepted") if c in names]
    if clashes:
        raise ValueError(f"input columns collide with quota output: {clashes}")

    out_schema = quota_output_schema(events)
    grouped = events.groupBy(key_col)
    if api == "v2":
        # Spark rejects TTL state unless the query runs in processing-
        # time mode (StateStoreErrors.cannotProvideTTLConfigForTimeMode),
        # so the time mode follows the TTL request.
        return grouped.transformWithStateInPandas(
            statefulProcessor=QuotaProcessor(limit, order_cols, ttl_ms),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="processingTime" if ttl_ms is not None else "none",
        )
    return grouped.applyInPandasWithState(
        _make_v1_fn(limit, order_cols),
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
