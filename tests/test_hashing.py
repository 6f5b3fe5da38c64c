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


def test_md5_row_json_distinguishes_map_only_differences(spark):
    """Round-10 ADVICE 1: the md5 JSON tiebreak must see map columns the
    hash family cannot — two rows identical in every hashable column but
    differing in a map get DIFFERENT md5 values (so row_number ordered by
    it picks deterministically instead of arbitrarily)."""
    from unicargo_medallion_data_pipeline_spark.functions.hashing import md5_row_json

    df = spark.createDataFrame(
        [(1, "a", {"m": "1"}), (1, "a", {"m": "2"})],
        "k int, s string, props map<string,string>",
    )
    got = df.select(md5_row_json(df.columns).alias("h")).collect()
    assert got[0]["h"] != got[1]["h"]


def test_canonical_json_map_entry_order_insensitive(spark):
    """Round-10 ADVICE 4: two semantically equal maps stored with
    different entry order must render to the SAME canonical JSON; maps
    with different contents must differ; NULL and empty stay distinct."""
    from unicargo_medallion_data_pipeline_spark.functions.hashing import canonical_json

    dt = T.MapType(T.StringType(), T.StringType())
    df = spark.range(1).select(
        F.map_from_arrays(
            F.array(F.lit("a"), F.lit("b")), F.array(F.lit("1"), F.lit("2"))
        ).alias("fwd"),
        F.map_from_arrays(
            F.array(F.lit("b"), F.lit("a")), F.array(F.lit("2"), F.lit("1"))
        ).alias("rev"),
        F.map_from_arrays(
            F.array(F.lit("a"), F.lit("b")), F.array(F.lit("1"), F.lit("9"))
        ).alias("other"),
        F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>")).alias("empty"),
        F.lit(None).cast(dt).alias("nul"),
    )
    row = df.select(
        canonical_json(F.col("fwd"), dt).alias("fwd"),
        canonical_json(F.col("rev"), dt).alias("rev"),
        canonical_json(F.col("other"), dt).alias("other"),
        canonical_json(F.col("empty"), dt).alias("empty"),
        canonical_json(F.col("nul"), dt).alias("nul"),
    ).collect()[0]
    assert row["fwd"] == row["rev"]
    assert row["fwd"] != row["other"]
    assert row["empty"] != row["nul"]  # {} vs {"v":[]}


def test_canonical_json_unorderable_value_sorts_by_key(spark):
    """A map whose VALUE type is itself unorderable (map-of-map) takes
    the comparator path: entries still sort by key, so entry order still
    canonicalizes."""
    from unicargo_medallion_data_pipeline_spark.functions.hashing import canonical_json

    dt = T.MapType(T.StringType(), T.MapType(T.StringType(), T.StringType()))
    df = spark.range(1).select(
        F.map_from_arrays(
            F.array(F.lit("a"), F.lit("b")),
            F.array(
                F.map_from_arrays(F.array(F.lit("x")), F.array(F.lit("1"))),
                F.map_from_arrays(F.array(F.lit("y")), F.array(F.lit("2"))),
            ),
        ).alias("fwd"),
        F.map_from_arrays(
            F.array(F.lit("b"), F.lit("a")),
            F.array(
                F.map_from_arrays(F.array(F.lit("y")), F.array(F.lit("2"))),
                F.map_from_arrays(F.array(F.lit("x")), F.array(F.lit("1"))),
            ),
        ).alias("rev"),
    )
    row = df.select(
        canonical_json(F.col("fwd"), dt).alias("fwd"),
        canonical_json(F.col("rev"), dt).alias("rev"),
    ).collect()[0]
    assert row["fwd"] == row["rev"]


def test_canonical_json_randomized_permutations_one_job(spark):
    """Randomized (seeded) bulk pin for canonical_json: for 60 random
    string maps, every random entry-order permutation renders to the
    SAME canonical text, and DIFFERENT maps render to DIFFERENT texts —
    checked in one Spark job over map_from_arrays-built columns."""
    import random

    from unicargo_medallion_data_pipeline_spark.functions.hashing import canonical_json

    rng = random.Random(20260815)
    rows = []
    for i in range(60):
        n = rng.randint(1, 8)
        keys = rng.sample([f"k{j}" for j in range(40)], n)
        vals = [f"v{rng.randint(0, 9)}" for _ in keys]
        perm = list(range(n))
        rng.shuffle(perm)
        rows.append(
            (i, keys, vals, [keys[p] for p in perm], [vals[p] for p in perm])
        )
    df = spark.createDataFrame(
        rows, "id int, k1 array<string>, v1 array<string>, k2 array<string>, v2 array<string>"
    )
    dt = T.MapType(T.StringType(), T.StringType())
    out = df.select(
        "id",
        canonical_json(F.map_from_arrays("k1", "v1"), dt).alias("a"),
        canonical_json(F.map_from_arrays("k2", "v2"), dt).alias("b"),
    ).collect()
    assert all(r["a"] == r["b"] for r in out)
    # distinct maps -> distinct canonical renderings (string maps: the
    # sorted-entry JSON is injective)
    texts = [r["a"] for r in out]
    as_dicts = {i: dict(zip(rows[i][1], rows[i][2])) for i in range(60)}
    distinct_maps = len({tuple(sorted(d.items())) for d in as_dicts.values()})
    assert len(set(texts)) == distinct_maps
