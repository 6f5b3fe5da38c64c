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


def test_salt_is_pure_function_of_row_values(spark):
    """The salt must be retry-safe: a pure function of row values, never
    of scan/partition order (SPARK-23207 class hazard).  So (a) the same
    values salt identically under ANY partitioning, (b) byte-identical
    duplicates share one bucket — the documented limitation — and (c)
    distinct rows still spread."""
    from unicargo_medallion_data_pipeline_spark.operators.skew import with_salt

    rows = [("k%d" % (i % 50), i) for i in range(400)]
    df = spark.createDataFrame(rows, "k string, v int")
    a = {(r["k"], r["v"]): r["_salt"] for r in with_salt(df, 8).collect()}
    b = {
        (r["k"], r["v"]): r["_salt"]
        for r in with_salt(df.repartition(7, "v"), 8).collect()
    }
    assert a == b, "salt changed under repartitioning"
    assert len(set(a.values())) >= 4, "distinct rows did not spread"

    dup = spark.createDataFrame([("hot", 1)] * 400, "k string, v int").repartition(4)
    assert with_salt(dup, 8).select("_salt").distinct().count() == 1


def test_salt_column_collision_rejected(spark):
    import pytest as _pytest

    from unicargo_medallion_data_pipeline_spark.operators.skew import salted_join, with_salt

    has_salt = spark.createDataFrame([(1, 0)], "k int, _salt int")
    plain = spark.createDataFrame([(1, "x")], "k int, v string")
    with _pytest.raises(ValueError, match="_salt"):
        with_salt(has_salt, 4)
    with _pytest.raises(ValueError, match="_salt"):
        salted_join(has_salt, plain, on=["k"])
    with _pytest.raises(ValueError, match="_salt"):
        salted_join(plain, has_salt, on=["k"])


def test_skew_anchor_variants_agree(spark):
    """r8 verdict task 4: the three executions bench_skew.py times —
    plain SMJ, AQE skew-split, salted_join — must return identical
    results on a hot-key dataset (the bench's equality gate, pinned
    here at test scale)."""
    import bench_skew as B

    sf = "/root/testdata/sf0.001"
    skewed = B.skewed_lineitem(spark, sf)
    supp = spark.read.parquet(sf + "/supplier.parquet")
    plain = B._digest(B._join_plain(skewed, supp))
    salted = B._digest(B._join_salted(skewed, supp))
    assert plain == salted
    # the hot key really is hot: ≥25% of rows on one suppkey
    import pyspark.sql.functions as F

    top = (
        skewed.groupBy("l_suppkey").count().orderBy(F.desc("count")).first()
    )
    assert top["l_suppkey"] == B.HOT_KEY
    assert top["count"] >= 0.25 * skewed.count()


def test_with_salt_tolerates_map_columns(spark):
    """r9 hunt: a map column must not make salting fail analysis; the
    salt stays deterministic and within range."""
    from unicargo_medallion_data_pipeline_spark.operators.skew import with_salt

    df = spark.createDataFrame(
        [(1, {"a": "1"}), (2, {"b": "2"}), (3, None)],
        "k int, props map<string,string>",
    )
    a = {r["k"]: r["_salt"] for r in with_salt(df, 8).collect()}
    b = {r["k"]: r["_salt"] for r in with_salt(df, 8).collect()}
    assert a == b and all(0 <= v < 8 for v in a.values())
