"""Batch MERGE upsert tests (S12 — the reference's incremental flight
processing, ``src/incrementatl_processing/incremetal_flights.py:1-19``,
re-expressed as partition-scoped upsert)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_merge_updates_and_inserts_by_partition(spark):
    from unicargo_medallion_data_pipeline_spark.sources.merge import merge_upsert_partitioned

    target = tempfile.mkdtemp(prefix="fact_")
    base = spark.createDataFrame(
        [
            (1, "2015-01-01", 100.0),
            (2, "2015-01-01", 200.0),
            (3, "2015-01-02", 300.0),
            (4, "2015-01-03", 400.0),
        ],
        ["k", "day", "amount"],
    )
    base.write.mode("overwrite").partitionBy("day").parquet(target)

    updates = spark.createDataFrame(
        [
            (2, "2015-01-01", 999.0),  # update existing key
            (5, "2015-01-02", 500.0),  # insert new key into existing partition
        ],
        ["k", "day", "amount"],
    )
    merge_upsert_partitioned(spark, target, updates, merge_keys=["k"], partition_col="day")

    # partition values are type-inferred (string → date) on read-back;
    # stringify for comparison
    got = {
        r["k"]: (str(r["day"]), r["amount"]) for r in spark.read.parquet(target).collect()
    }
    assert got == {
        1: ("2015-01-01", 100.0),
        2: ("2015-01-01", 999.0),  # updated
        3: ("2015-01-02", 300.0),
        4: ("2015-01-03", 400.0),  # untouched partition survives
        5: ("2015-01-02", 500.0),  # inserted
    }


def test_merge_is_idempotent(spark):
    from unicargo_medallion_data_pipeline_spark.sources.merge import merge_upsert_partitioned

    target = tempfile.mkdtemp(prefix="fact_")
    base = spark.createDataFrame(
        [(1, "d1", 1.0), (2, "d2", 2.0)], ["k", "day", "amount"]
    )
    base.write.mode("overwrite").partitionBy("day").parquet(target)
    updates = spark.createDataFrame([(1, "d1", 10.0)], ["k", "day", "amount"])
    for _ in range(2):  # same batch twice → same result (exactly-once shape)
        merge_upsert_partitioned(spark, target, updates, ["k"], "day")
    out = spark.read.parquet(target)
    assert out.count() == 2
    assert out.filter(F.col("k") == 1).collect()[0]["amount"] == 10.0
