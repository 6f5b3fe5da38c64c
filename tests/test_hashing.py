"""functions/hashing.py: type guard and fast-path equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from unicargo_medallion_data_pipeline_spark.functions.hashing import (
    hashable_cols,
    row_hash,
    xxhashable,
)


def test_xxhashable_type_lattice():
    assert xxhashable(T.LongType())
    assert xxhashable(T.ArrayType(T.StringType()))
    assert xxhashable(T.StructType([T.StructField("a", T.IntegerType())]))
    assert not xxhashable(T.MapType(T.StringType(), T.StringType()))
    assert not xxhashable(T.ArrayType(T.MapType(T.StringType(), T.IntegerType())))
    assert not xxhashable(
        T.StructType([T.StructField("m", T.MapType(T.StringType(), T.StringType()))])
    )


def test_row_hash_fast_path_matches_historical_expression(spark):
    """With no unhashable columns, row_hash must be BIT-IDENTICAL to the
    xxhash64(*all columns) expression it replaced — salts/buckets built
    on it must not move when a frame has no maps."""
    df = spark.createDataFrame([(1, "a", 2.5), (2, None, 0.0)], "k int, s string, d double")
    legacy = df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")).collect()
    new = df.select(row_hash(df).alias("h")).collect()
    assert [r["h"] for r in new] == [r["h"] for r in legacy]


def test_row_hash_all_unhashable_falls_back_to_json(spark):
    df = spark.createDataFrame([({"a": "1"},), (None,)], "m map<string,string>")
    got = df.select(row_hash(df).alias("h")).collect()
    assert len({r["h"] for r in got}) == 2  # distinct rows → distinct hashes


def test_hashable_cols_excludes(spark):
    df = spark.createDataFrame([(1, {"a": "1"}, "x")], "k int, m map<string,string>, v string")
    assert hashable_cols(df) == ["k", "v"]
    assert hashable_cols(df, exclude=("k",)) == ["v"]
