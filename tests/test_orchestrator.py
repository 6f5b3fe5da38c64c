"""Orchestrator tests: task threading, failure isolation, batched logging."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def _tasks(spark, fail_transform_for=None):
    from unicargo_medallion_data_pipeline_spark.pipelines.orchestrator import Task, create_entity_tasks

    written = {}

    def make(entity):
        def read_fn():
            return spark.createDataFrame([(entity, 1), (entity, 2)], ["name", "v"])

        def transform_fn(df):
            if entity == fail_transform_for:
                raise ValueError(f"boom in {entity}")
            return df.withColumn("v2", F.col("v") * 10)

        def write_fn(df):
            written[entity] = df.count()

        return create_entity_tasks(entity, read_fn, transform_fn, write_fn)

    tasks: list[Task] = []
    for e in ("alpha", "beta"):
        tasks.extend(make(e))
    return tasks, written


def test_run_tasks_threads_dataframes(spark):
    from unicargo_medallion_data_pipeline_spark.pipelines.orchestrator import run_tasks

    tasks, written = _tasks(spark)
    result = run_tasks(tasks)
    assert not result.failures
    assert written == {"alpha": 2, "beta": 2}
    assert "v2" in result.results["alpha"].columns


def test_run_tasks_failure_isolation(spark):
    from unicargo_medallion_data_pipeline_spark.pipelines.orchestrator import run_tasks

    tasks, written = _tasks(spark, fail_transform_for="alpha")
    result = run_tasks(tasks)
    assert "transform_alpha" in result.failures
    # alpha's write skipped; beta unaffected
    assert "alpha" not in written and written["beta"] == 2
    statuses = dict(result.statuses)
    assert statuses["write_alpha"] == "SKIPPED"
    assert statuses["write_beta"] == "SUCCESS"


def test_run_log_batched_flush(spark):
    from unicargo_medallion_data_pipeline_spark.pipelines.orchestrator import RunLog, run_tasks

    tasks, _ = _tasks(spark, fail_transform_for="beta")
    run_log = RunLog("pipe1", "run42", environment="test")
    run_tasks(tasks, run_log)
    assert len(run_log.rows) == 5  # 3 alpha + read/transform beta (write skipped)
    path = tempfile.mkdtemp(prefix="runlog_")
    run_log.flush(spark, path)
    assert run_log.rows == []
    logs = spark.read.parquet(path)
    assert logs.count() == 5
    assert logs.filter(F.col("status") == "FAILED").count() == 1
    # partitioned by environment/log_date
    assert {"environment", "log_date"} <= set(logs.columns)
    failed = logs.filter(F.col("status") == "FAILED").collect()[0]
    assert "boom in beta" in failed["error_message"]
    assert failed["execution_time_ms"] >= 0
