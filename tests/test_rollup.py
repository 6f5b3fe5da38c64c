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


def test_hll_distinct_rollup_merge_equals_full_recompute(spark):
    """Mergeable distinct counts: the estimate read off an incrementally
    HLL-union-maintained rollup must EQUAL the full-recompute estimate
    (the represented hash set is order-independent; raw sketch bytes are
    not compared — low-cardinality list mode stores hashes in arrival
    order), and the estimate must be near-exact at this cardinality."""
    from unicargo_medallion_data_pipeline_spark.operators.rollup import (
        hll_estimate,
        hll_sketch,
        merge_additive_rollup,
    )

    ev = load_table(spark, SF, "events")
    hour = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")

    def hourly_users(df):
        return df.groupBy(hour.alias("hour_s"), "event_type").agg(
            hll_sketch("user_id").alias("users_hll")
        )

    target = os.path.join(tempfile.mkdtemp(prefix="rollup_hll_"), "hourly")
    for i in range(3):
        merge_additive_rollup(
            spark,
            target,
            hourly_users(ev.filter(F.col("event_id") % 3 == i)),
            KEYS,
            {"users_hll": "hll_union"},
            partition_col="hour_s",
        )

    def estimates(df):
        return {
            (r["hour_s"], r["event_type"]): r["est"]
            for r in df.select(
                "hour_s", "event_type", hll_estimate("users_hll").alias("est")
            ).collect()
        }

    got = estimates(spark.read.parquet(target))
    want = estimates(hourly_users(ev))
    assert got == want  # estimate equality is exact, not approximate

    # Coarse grain by unioning stored fine-grain sketches (no raw re-read),
    # estimate vs exact distinct: small cardinalities are near-exact.
    rolled = (
        spark.read.parquet(target)
        .groupBy("event_type")
        .agg(hll_estimate(F.hll_union_agg("users_hll")).alias("est_users"))
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    joined = {r["event_type"]: r for r in rolled.join(exact, "event_type").collect()}
    assert joined
    for r in joined.values():
        assert abs(r["est_users"] - r["n_users"]) <= max(2, 0.05 * r["n_users"])


def test_bitmap_distinct_rollup_is_exact_and_mergeable(spark):
    """Bitmap-based distinct counts: incremental bitmap-OR maintenance
    equals a full recompute EXACTLY, and both equal the true
    COUNT(DISTINCT) — no approximation anywhere."""
    from unicargo_medallion_data_pipeline_spark.operators.rollup import (
        BITMAP_BUCKET_COL,
        bitmap_distinct,
        bitmap_grain,
        merge_additive_rollup,
    )

    ev = load_table(spark, SF, "events")
    hour = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    keyed = ev.select(hour.alias("hour_s"), "event_type", "user_id")

    def grain(df):
        return bitmap_grain(df, ["hour_s", "event_type"], "user_id")

    target = os.path.join(tempfile.mkdtemp(prefix="rollup_bm_"), "hourly")
    for i in range(3):
        merge_additive_rollup(
            spark,
            target,
            grain(keyed.filter(F.col("user_id") % 3 == i)),
            ["hour_s", "event_type", BITMAP_BUCKET_COL],
            {"bitmap": "bitmap_or"},
            partition_col="hour_s",
        )

    got = {
        (r["hour_s"], r["event_type"]): r["n_distinct"]
        for r in bitmap_distinct(
            spark.read.parquet(target), ["hour_s", "event_type"]
        ).collect()
    }
    exact = {
        (r["hour_s"], r["event_type"]): r["n"]
        for r in keyed.groupBy("hour_s", "event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact  # exact equality, not within-error

    # Coarse grain from stored bitmaps only (no raw re-read): also exact.
    per_type = {
        r["event_type"]: r["n_distinct"]
        for r in bitmap_distinct(
            spark.read.parquet(target)
            .groupBy("event_type", BITMAP_BUCKET_COL)
            .agg(F.bitmap_or_agg("bitmap").alias("bitmap")),
            ["event_type"],
        ).collect()
    }
    exact_per_type = {
        r["event_type"]: r["n"]
        for r in keyed.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert per_type == exact_per_type


def test_bootstrap_rejects_null_partitions(spark, tmp_path):
    """The FIRST increment enforces the same null-partition rule as
    every later merge — bootstrapped NULLs would land in the Hive
    sentinel where isin()-scoped merges can never fold them."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from unicargo_medallion_data_pipeline_spark.operators.rollup import (
        merge_additive_rollup,
    )

    delta = spark.createDataFrame(
        [(None, 1), ("a", 2)], "day string, n long"
    ).groupBy("day").agg(F.sum("n").alias("n"))
    with pytest.raises(ValueError, match="NULL 'day'"):
        merge_additive_rollup(
            spark,
            os.path.join(tmp_path, "r"),
            delta,
            keys=["day"],
            measures={"n": "sum"},
            partition_col="day",
        )


def test_refresh_preserves_stored_measure_types(spark, tmp_path):
    """r11 sweep (seed e): SUM widens decimals, so an uncast combine
    rewrote only the TOUCHED partitions at the wider physical type —
    one increment that misses a partition later and the table holds
    mixed parquet decimal widths that no longer read as one schema.
    The combine must cast measures back to the stored contract."""
    import os as _os

    from unicargo_medallion_data_pipeline_spark.operators.rollup import (
        merge_additive_rollup,
    )

    target = _os.path.join(tmp_path, "rollup")

    from decimal import Decimal

    def delta(rows):
        return spark.createDataFrame(
            [(g, k, Decimal(v)) for g, k, v in rows],
            "grain string, k string, v decimal(28,2)",
        )

    measures = {"v": "sum"}
    # bootstrap writes partitions a and b at decimal(28,2)
    merge_additive_rollup(
        spark, target, delta([("a", "x", "1.00"), ("b", "x", "2.00")]),
        keys=["grain", "k"], measures=measures, partition_col="grain",
    )
    # increment touches ONLY partition a — without the contract cast its
    # rewrite lands at sum-widened decimal(38,2) while b stays (28,2)
    merge_additive_rollup(
        spark, target, delta([("a", "x", "3.00")]),
        keys=["grain", "k"], measures=measures, partition_col="grain",
    )
    back = spark.read.parquet(target)
    got = {r["grain"]: float(r["v"]) for r in back.collect()}  # must not raise
    assert got == {"a": 4.0, "b": 2.0}
    vtype = dict((f.name, f.dataType.simpleString()) for f in back.schema.fields)
    assert vtype["v"] == "decimal(28,2)", vtype
