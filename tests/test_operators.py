"""Unit tests: cleaning, keys, transforms, config, quality gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_drop_columns_safe_ignores_unknown(spark):
    from unicargo_medallion_data_pipeline_spark.operators.cleaning import drop_columns_safe

    df = spark.createDataFrame([(1, "a")], ["id", "val"])
    out = drop_columns_safe(df, ["val", "nope"])
    assert out.columns == ["id"]


def test_dedup_full_and_subset(spark):
    from unicargo_medallion_data_pipeline_spark.operators.cleaning import canonical_dedup, dedup

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "c")], ["k", "v"]
    )
    assert dedup(df).count() == 3
    assert dedup(df, ["k"]).count() == 2
    # canonical keeps the lexicographically-first v per k
    rows = {r["k"]: r["v"] for r in canonical_dedup(df, ["k"], ["v"]).collect()}
    assert rows == {1: "a", 2: "c"}


def test_fill_nulls(spark):
    from unicargo_medallion_data_pipeline_spark.operators.cleaning import fill_nulls

    df = spark.createDataFrame(
        [(None, None, None)], "s string, i int, d double"
    )
    row = fill_nulls(
        df, per_column={"s": "x"}, numeric_default=0
    ).collect()[0]
    assert row["s"] == "x" and row["i"] == 0 and row["d"] == 0.0


def test_cleaning_pipeline_composes(spark):
    from unicargo_medallion_data_pipeline_spark.operators.cleaning import CleaningConfig, clean

    df = spark.createDataFrame(
        [(1, "a", None), (1, "a", None), (2, "b", "z")], ["k", "v", "w"]
    )
    out = clean(
        df,
        CleaningConfig(
            add_timestamp=True,
            drop_columns=["missing_col"],
            dedup_subset=None,
            fill_string_default="?",
        ),
    )
    assert out.count() == 2
    assert "processed_timestamp" in out.columns
    assert out.filter(F.col("w") == "?").count() == 1


def test_fact_hash_key_deterministic(spark):
    from unicargo_medallion_data_pipeline_spark.operators.keys import fact_hash_key

    df = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")], ["a", "b"])
    keys = [r[0] for r in df.select(fact_hash_key(["a", "b"])).collect()]
    assert keys[0] == keys[1] != keys[2]
    # stable across repartitioning
    keys2 = [r[0] for r in df.repartition(8).select(fact_hash_key(["a", "b"])).collect()]
    assert sorted(keys) == sorted(keys2)


def test_with_metadata_map(spark):
    from unicargo_medallion_data_pipeline_spark.operators.transforms import with_metadata

    df = spark.createDataFrame([(1,)], ["id"])
    row = with_metadata(df, {"pipeline": "p1", "layer": "bronze"}).collect()[0]
    assert row["metadata"] == {"pipeline": "p1", "layer": "bronze"}


def test_table_config_resolution():
    from unicargo_medallion_data_pipeline_spark.config.tables import get_table_config

    cfg = get_table_config("flights", "silver", "dev")
    assert cfg.full_name == "dev_silver.fact_flight"
    assert cfg.partition_by == ("date_sk",)
    with pytest.raises(KeyError, match="unknown environment"):
        get_table_config("flights", "silver", "nope")
    with pytest.raises(KeyError, match="unknown entity"):
        get_table_config("boats", "silver", "dev")


def test_validate_data_quality_gates(spark):
    from unicargo_medallion_data_pipeline_spark.quality.validation import (
        DataQualityError,
        validate_data_quality,
    )

    # 1 null out of 10 = 10% > 5% threshold → fail; 1/25 = 4% → pass
    bad = spark.createDataFrame([(None if i == 0 else i,) for i in range(10)], "v int")
    good = spark.createDataFrame([(None if i == 0 else i,) for i in range(25)], "v int")
    with pytest.raises(DataQualityError, match="null threshold"):
        validate_data_quality(bad, "bad", ["v"])
    profile = validate_data_quality(good, "good", ["v"])
    assert profile["row_count"] == 25
    empty = spark.createDataFrame([], "v int")
    with pytest.raises(DataQualityError, match="empty"):
        validate_data_quality(empty, "empty", ["v"])


def test_null_profile_single_pass(spark):
    from unicargo_medallion_data_pipeline_spark.quality.validation import null_profile

    df = spark.createDataFrame([(1, None), (None, "x"), (3, "y")], ["a", "b"])
    p = null_profile(df)
    assert p == {"row_count": 3, "null_counts": {"a": 1, "b": 1}}


def test_exact_double_matches_correctly_rounded_conversion(spark):
    """exact_double must equal Python's correctly-rounded str→float on
    values whose unscaled magnitude exceeds 2^53 — the regime where a
    plain decimal→double cast diverges between engines."""
    from pyspark.sql import functions as F

    from unicargo_medallion_data_pipeline_spark.functions.exact import exact_double

    vals = ["-19399967019787510", "9007199254740993", "123456789012345678901234567"]
    df = spark.createDataFrame([(v,) for v in vals], "s string").select(
        F.col("s"), exact_double(F.col("s").cast("decimal(38,0)")).alias("d")
    )
    got = {r["s"]: r["d"] for r in df.collect()}
    for v in vals:
        assert got[v] == float(v), f"{v}: {got[v]!r} != {float(v)!r}"


def test_round_half_up_vs_half_even_documented(spark):
    """Why the engine's oracle-verified surface never uses ROUND on a
    .5 boundary: Spark rounds HALF_UP while DuckDB (and IEEE default)
    round HALF_EVEN, so round(2.5, 0) differs by engine.  This pin
    documents the divergence the determinism rules are built around
    (decimal casts + exact sums instead of rounding)."""
    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(
            F.round(F.lit(2.5), 0).alias("r25"),
            F.round(F.lit(3.5), 0).alias("r35"),
        )
        .collect()[0]
    )
    assert (row["r25"], row["r35"]) == (3.0, 4.0)  # Spark: HALF_UP

    import duckdb

    r25, r35 = duckdb.connect().execute(
        "SELECT round(2.5, 0), round(3.5, 0)"
    ).fetchone()
    # DuckDB rounds these away from zero too on DOUBLE — but its
    # DECIMAL rounding is HALF_EVEN; assert only what we rely on:
    # the engines are NOT guaranteed to agree, so oracle paths avoid
    # ROUND at representable .5 boundaries entirely.
    assert r25 in (2.0, 3.0) and r35 in (3.0, 4.0)


def test_snapshot_diff_null_keys_match_null_safely(spark):
    """An identical NULL-keyed row present in both snapshots is
    UNCHANGED — a null-unsafe equi-join would double-report it as both
    added and removed, spuriously firing 'removed > x%' gates."""
    from unicargo_medallion_data_pipeline_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (None, "n"), (2, "b")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (None, "n"), (3, "c")], "k int, v string"
    )
    got = {
        (r["k"], r["change_status"])
        for r in snapshot_diff(old, new, keys=["k"]).collect()
    }
    assert got == {
        (1, "unchanged"),
        (None, "unchanged"),
        (2, "removed"),
        (3, "added"),
    }
    # NULL vs value in a COMPARED column still reads as changed
    new2 = spark.createDataFrame([(None, None)], "k int, v string")
    old2 = spark.createDataFrame([(None, "n")], "k int, v string")
    (row,) = snapshot_diff(old2, new2, keys=["k"]).collect()
    assert row["change_status"] == "changed"


def test_orphan_fk_counts_exclude_null_fks(spark):
    """NULL FKs are not orphans (SQL FK semantics, matching the
    foreign_key expectation) — an anti-join alone counts them because
    NULL = key is never true, permanently false-alarming on nullable
    FKs.  Null-ness is a separate check."""
    from unicargo_medallion_data_pipeline_spark.quality.validation import orphan_fk_counts

    fact = spark.createDataFrame(
        [(1, 10), (2, None), (3, 99)], "id int, dim_id int"
    )
    dim = spark.createDataFrame([(10,)], "dk int")
    counts = orphan_fk_counts(fact, {"dim_id": (dim, "dk")})
    assert counts == {"dim_id": 1}  # only the real miss (99), not the NULL


def test_dedup_full_row_rejects_map_columns(spark):
    """r9 hunt: full-row dedup over a map column raises a clear error
    (Spark's own failure is an opaque analysis error); subset dedup on
    hashable keys still works."""
    import pytest

    from unicargo_medallion_data_pipeline_spark.operators.cleaning import dedup

    df = spark.createDataFrame(
        [(1, {"a": "1"}), (1, {"a": "1"})], "k int, props map<string,string>"
    )
    with pytest.raises(ValueError, match="props"):
        dedup(df)
    assert dedup(df, subset=["k"]).count() == 1


def test_snapshot_diff_map_entry_reorder_is_unchanged(spark):
    """Round-10 ADVICE 4: a map rebuilt in a different entry order is the
    same value — snapshot_diff must report 'unchanged', not 'changed'."""
    from pyspark.sql import functions as F

    from unicargo_medallion_data_pipeline_spark.operators.diff import snapshot_diff

    old = spark.range(1).select(
        F.lit(1).alias("k"),
        F.map_from_arrays(
            F.array(F.lit("a"), F.lit("b")), F.array(F.lit("1"), F.lit("2"))
        ).alias("props"),
    )
    new = spark.range(1).select(
        F.lit(1).alias("k"),
        F.map_from_arrays(
            F.array(F.lit("b"), F.lit("a")), F.array(F.lit("2"), F.lit("1"))
        ).alias("props"),
    )
    (row,) = snapshot_diff(old, new, keys=["k"]).collect()
    assert row["change_status"] == "unchanged"
    # a REAL map change still reports changed
    new2 = new.withColumn("props", F.map_from_arrays(F.array(F.lit("a")), F.array(F.lit("9"))))
    (row2,) = snapshot_diff(old, new2, keys=["k"]).collect()
    assert row2["change_status"] == "changed"
