"""Skew helpers: salted join and two-phase distinct must be
row-identical to their naive forms on skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one hot key; 200 distinct cold keys.
    rows = [(1, i, f"v{i % 37}") for i in range(1800)] + [
        (2 + (i % 200), i, f"v{i % 11}") for i in range(200)
    ]
    return spark.createDataFrame(rows, "k int, payload int, val string")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(k, f"name_{k}") for k in range(1, 202)], "k int, name string"
    )


def _key(rows):
    return sorted(tuple(r) for r in rows)


def test_salted_inner_join_matches_plain(spark, skewed, dim):
    from unicargo_medallion_data_pipeline_spark.operators.skew import salted_join

    plain = skewed.join(dim, ["k"]).collect()
    salted = salted_join(skewed, dim, ["k"], buckets=8).collect()
    assert _key(salted) == _key(plain)


def test_salted_left_join_matches_plain(spark, skewed, dim):
    from unicargo_medallion_data_pipeline_spark.operators.skew import salted_join

    missing = dim.filter(F.col("k") > 100)  # half the cold keys unmatched
    plain = skewed.join(missing, ["k"], "left").collect()
    salted = salted_join(skewed, missing, ["k"], buckets=8, how="left").collect()
    assert _key(salted) == _key(plain)


def test_salted_join_rejects_right_full(spark, skewed, dim):
    from unicargo_medallion_data_pipeline_spark.operators.skew import salted_join

    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(skewed, dim, ["k"], how=how)


def test_two_phase_distinct_matches_plain(spark, skewed):
    from unicargo_medallion_data_pipeline_spark.operators.skew import (
        salted_two_phase_distinct,
    )

    plain = {
        r["k"]: r["n"]
        for r in skewed.groupBy("k").agg(F.countDistinct("val").alias("n")).collect()
    }
    two = {
        r["k"]: r["n_distinct_val"]
        for r in salted_two_phase_distinct(skewed, "k", "val", buckets=16).collect()
    }
    assert two == plain


def test_salt_spreads_identical_duplicate_rows(spark):
    """All copies of a byte-identical hot row must NOT land in one salt
    bucket (the per-partition row index breaks the tie)."""
    from unicargo_medallion_data_pipeline_spark.operators.skew import with_salt

    dup = spark.createDataFrame([("hot", 1)] * 400, "k string, v int").repartition(4)
    n_buckets = with_salt(dup, 8).select("_salt").distinct().count()
    assert n_buckets >= 4
