"""Task orchestration + run logging (SURVEY §3.1, §2.1 S7).

Reference counterparts:
  - task factory: ``unicargo_etl/scripts/01_bronze/task_factory.py:3-27``
    (read → transform → write closures per entity)
  - execution loop: ``bronze_orchestrator.py:140-221`` (sequential tasks,
    per-entity DataFrame threading, failure isolation)
  - task logger: ``src/logging_utils/task_logger_utils.py`` (timed context
    manager writing SUCCESS/FAILED rows to a partitioned log table)

Scale redesign: the reference writes ONE log row per task as its own
Spark job (``write_to_table_utils.py:99-140``) — a 1-row shuffle-free
write per task, but still a full Spark job each (job-launch overhead ×
tasks).  This engine buffers log rows in the driver and flushes them as
ONE partitioned write per pipeline run.
"""

from __future__ import annotations

import datetime as dt
import logging
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

log = logging.getLogger(__name__)

TASK_LOG_SCHEMA = StructType(
    [
        StructField("pipeline_id", StringType(), False),
        StructField("run_id", StringType(), False),
        StructField("entity", StringType(), True),
        StructField("task_name", StringType(), False),
        StructField("status", StringType(), False),  # SUCCESS | FAILED
        StructField("error_message", StringType(), True),
        StructField("execution_time_ms", LongType(), True),
        StructField("started_at", TimestampType(), False),
        StructField("environment", StringType(), False),
        StructField("log_date", StringType(), False),  # partition col
    ]
)


@dataclass
class Task:
    """One unit of work: a closure over (previous DataFrame) → DataFrame."""

    entity: str
    name: str
    fn: Callable[[DataFrame | None], DataFrame | None]


def create_entity_tasks(
    entity: str,
    read_fn: Callable[[], DataFrame],
    transform_fn: Callable[[DataFrame], DataFrame],
    write_fn: Callable[[DataFrame], None],
) -> list[Task]:
    """The reference's 3-task shape (read → transform → write) per entity."""
    return [
        Task(entity, f"read_{entity}", lambda _prev: read_fn()),
        Task(entity, f"transform_{entity}", lambda prev: transform_fn(prev)),
        Task(entity, f"write_{entity}", lambda prev: (write_fn(prev), prev)[1]),
    ]


@dataclass
class RunLog:
    """Buffered run log: rows accumulate in the driver, flushed once."""

    pipeline_id: str
    run_id: str
    environment: str = "dev"
    rows: list[tuple] = field(default_factory=list)

    def record(
        self,
        entity: str | None,
        task_name: str,
        status: str,
        error: str | None,
        started_at: dt.datetime,
        elapsed_ms: int,
    ) -> None:
        self.rows.append(
            (
                self.pipeline_id,
                self.run_id,
                entity,
                task_name,
                status,
                error,
                elapsed_ms,
                started_at,
                self.environment,
                started_at.date().isoformat(),
            )
        )

    def flush(self, spark: SparkSession, path: str) -> None:
        """S7 — ONE partitioned append for the whole run."""
        if not self.rows:
            return
        df = spark.createDataFrame(self.rows, TASK_LOG_SCHEMA)
        (
            df.coalesce(1)
            .write.mode("append")
            .partitionBy("environment", "log_date")
            .parquet(path)
        )
        self.rows.clear()


@dataclass
class RunResult:
    results: dict[str, DataFrame | None] = field(default_factory=dict)
    failures: dict[str, str] = field(default_factory=dict)
    statuses: list[tuple[str, str]] = field(default_factory=list)


def run_tasks(
    tasks: list[Task],
    run_log: RunLog | None = None,
) -> RunResult:
    """Sequential execution with per-entity DataFrame threading and
    failure isolation: a failed task marks its entity failed and skips its
    remaining tasks, but other entities continue
    (``bronze_orchestrator.py:216-217``)."""
    out = RunResult()
    last_df: dict[str, DataFrame | None] = {}
    failed_entities: set[str] = set()
    for task in tasks:
        if task.entity in failed_entities:
            out.statuses.append((task.name, "SKIPPED"))
            continue
        started = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        t0 = time.perf_counter()
        try:
            result = task.fn(last_df.get(task.entity))
            last_df[task.entity] = result
            out.results[task.entity] = result
            status, err = "SUCCESS", None
        except Exception as e:  # noqa: BLE001 — isolation is the contract
            status, err = "FAILED", f"{type(e).__name__}: {e}"
            failed_entities.add(task.entity)
            out.failures[task.name] = err
            # No partial data: a caller iterating results must never see a
            # failed entity's stale intermediate DataFrame (e.g. the read
            # output after its transform failed).
            out.results.pop(task.entity, None)
            log.warning("task %s failed: %s", task.name, err)
        elapsed_ms = int((time.perf_counter() - t0) * 1000)
        out.statuses.append((task.name, status))
        if run_log is not None:
            run_log.record(task.entity, task.name, status, err, started, elapsed_ms)
    return out
