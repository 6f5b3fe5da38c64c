"""Misra–Gries heavy hitters: exactness in the small-vocabulary regime,
classical guarantees in the adversarial (capacity < distinct) regime,
and merge soundness across partitionings."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F


def _zipf_stream(rng: random.Random, n: int, n_items: int):
    # heavy head + long tail: item i drawn with weight ~ 1/(i+1)
    weights = [1.0 / (i + 1) for i in range(n_items)]
    return rng.choices([f"item_{i:04d}" for i in range(n_items)], weights, k=n)


def test_exact_when_capacity_covers_distinct(spark):
    from unicargo_medallion_data_pipeline_spark.operators.freq import heavy_hitters

    rng = random.Random(11)
    vals = _zipf_stream(rng, 5000, 40)
    truth = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "token string").repartition(7)
    got = {r["item"]: r["count_lb"] for r in heavy_hitters(df, "token", k=10, capacity=64).collect()}
    expected = dict(sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10])
    assert got == expected


@pytest.mark.parametrize("n_parts", [1, 3, 8])
def test_mg_guarantees_when_capacity_below_distinct(spark, n_parts):
    """capacity << distinct: counts are lower bounds within the summed
    per-partition error N_p/(capacity+1), and every sufficiently-frequent
    item survives."""
    from unicargo_medallion_data_pipeline_spark.operators.freq import (
        heavy_hitters,
        misra_gries_summaries,
    )

    rng = random.Random(13)
    n, capacity = 8000, 16
    vals = _zipf_stream(rng, n, 400)  # 400 distinct >> 16 counters
    truth = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "token string").repartition(n_parts)

    merged = {
        r["item"]: r["count_lb"]
        for r in misra_gries_summaries(df, "token", capacity)
        .groupBy("item")
        .agg(F.sum("count_lb").alias("count_lb"))
        .collect()
    }
    # summed worst-case error over partitions
    max_err = n / (capacity + 1)
    for item, lb in merged.items():
        assert lb <= truth[item], f"{item}: lb {lb} exceeds truth {truth[item]}"
        assert truth[item] - lb <= max_err + 1e-9
    # survival: anything with true frequency above the merged error bound
    # must appear in the summary
    for item, cnt in truth.items():
        if cnt > max_err:
            assert item in merged, f"heavy item {item} (count {cnt}) evicted"

    # and the top-k output is drawn from the merged summary
    top = heavy_hitters(df, "token", k=5, capacity=capacity).collect()
    assert len(top) == 5
    assert all(r["item"] in merged for r in top)


def test_summary_size_is_capacity_bounded(spark):
    from unicargo_medallion_data_pipeline_spark.operators.freq import misra_gries_summaries

    rng = random.Random(17)
    vals = _zipf_stream(rng, 4000, 300)
    df = spark.createDataFrame([(v,) for v in vals], "token string").repartition(4)
    per_part = (
        misra_gries_summaries(df, "token", capacity=8)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert all(r["count"] <= 8 for r in per_part)


def test_capacity_validation():
    from unicargo_medallion_data_pipeline_spark.operators.freq import misra_gries_summaries

    with pytest.raises(ValueError, match="capacity"):
        misra_gries_summaries(None, "x", 0)
