"""Continuous-aggregate maintenance: incremental additive refresh must
equal a full recompute, bootstrap, and reject non-mergeable shapes."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _hourly(events_df):
    """Fine-grain rollup: (hour, event_type) -> count, decimal-exact sum,
    min/max value."""
    hour = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    return events_df.groupBy(
        hour.alias("hour_s"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


MEASURES = {
    "n_events": "sum",
    "total_value": "sum",
    "min_value": "min",
    "max_value": "max",
}
KEYS = ["hour_s", "event_type"]


def test_incremental_refresh_equals_full_recompute(spark):
    from unicargo_medallion_data_pipeline_spark.operators.rollup import merge_additive_rollup

    ev = load_table(spark, SF, "events")
    # split the stream into three arbitrary arrival slices (overlapping
    # hours across slices - the additive path must combine, not replace)
    slices = [
        ev.filter(F.col("event_id") % 3 == i) for i in range(3)
    ]
    target = os.path.join(tempfile.mkdtemp(prefix="rollup_"), "hourly")
    for s in slices:
        merge_additive_rollup(
            spark, target, _hourly(s), KEYS, MEASURES, partition_col="hour_s"
        )
    got = {
        (r["hour_s"], r["event_type"]): (
            r["n_events"], r["total_value"], r["min_value"], r["max_value"]
        )
        for r in spark.read.parquet(target).collect()
    }
    want = {
        (r["hour_s"], r["event_type"]): (
            r["n_events"], r["total_value"], r["min_value"], r["max_value"]
        )
        for r in _hourly(ev).collect()
    }
    assert got == want  # decimal sums exact -> equality is bitwise


def test_rollup_rejects_unknown_combiner_and_bad_partition(spark):
    from unicargo_medallion_data_pipeline_spark.operators.rollup import merge_additive_rollup

    ev = load_table(spark, SF, "events").limit(10)
    with pytest.raises(ValueError, match="unsupported combine"):
        merge_additive_rollup(
            spark, "/tmp/x", _hourly(ev), KEYS, {"n_events": "avg"}, "hour_s"
        )
    with pytest.raises(ValueError, match="part of the rollup key"):
        merge_additive_rollup(
            spark, "/tmp/x", _hourly(ev), KEYS, MEASURES, "not_a_key"
        )


def test_rollup_touches_only_increment_partitions(spark):
    import glob

    from unicargo_medallion_data_pipeline_spark.operators.rollup import merge_additive_rollup

    target = os.path.join(tempfile.mkdtemp(prefix="rollup_"), "t")
    base = spark.createDataFrame(
        [(100, "a", 1, 1.0, 1.0, 1.0), (200, "a", 2, 2.0, 2.0, 2.0)],
        "hour_s long, event_type string, n_events long, total_value double,"
        " min_value double, max_value double",
    )
    merge_additive_rollup(spark, target, base, KEYS, MEASURES, "hour_s")
    untouched = sorted(glob.glob(target + "/hour_s=200/*.parquet"))
    inc = spark.createDataFrame(
        [(100, "a", 3, 0.5, 0.5, 9.0)],
        "hour_s long, event_type string, n_events long, total_value double,"
        " min_value double, max_value double",
    )
    merge_additive_rollup(spark, target, inc, KEYS, MEASURES, "hour_s")
    assert sorted(glob.glob(target + "/hour_s=200/*.parquet")) == untouched
    row = spark.read.parquet(target).filter(F.col("hour_s") == 100).collect()[0]
    assert row["n_events"] == 4 and row["total_value"] == 1.5
    assert row["min_value"] == 0.5 and row["max_value"] == 9.0
