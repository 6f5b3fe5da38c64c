"""Small-file compaction: census, per-partition file-count control,
untouched-partition preservation, data fidelity, session hygiene."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F


def _files(path, part):
    return sorted(
        f for f in glob.glob(os.path.join(path, part, "*.parquet"))
    )


def _make_table(spark, n_small=20):
    path = tempfile.mkdtemp(prefix="compact_tbl_")
    big = spark.createDataFrame(
        [(i, f"d{i % 2}", float(i)) for i in range(2000)], "k int, day string, v double"
    )
    # two fragmented partitions: 20 files each
    big.repartition(n_small).write.mode("append").partitionBy("day").parquet(path)
    # one already-compact partition: 1 file
    one = spark.createDataFrame([(9999, "d9", 9.0)], "k int, day string, v double")
    one.coalesce(1).write.mode("append").partitionBy("day").parquet(path)
    return path


def test_compaction_reduces_files_and_preserves_data(spark):
    from unicargo_medallion_data_pipeline_spark.sources.compaction import (
        compact_partitioned_path, partition_file_census,
    )

    path = _make_table(spark)
    before = spark.read.parquet(path)
    before_rows = sorted((r.k, r.day, r.v) for r in before.collect())
    census = partition_file_census(spark, path)
    assert census["day=d0"][1] == 20 and census["day=d1"][1] == 20

    d9_file_before = _files(path, "day=d9")
    done = compact_partitioned_path(
        spark, path, ["day"], target_file_bytes=1 << 30
    )
    assert set(done) == {"day=d0", "day=d1"} and done["day=d0"] == 20

    after_census = partition_file_census(spark, path)
    assert after_census["day=d0"][1] == 1  # ceil(bytes/1GB) = 1 file
    assert after_census["day=d1"][1] == 1
    # untouched partition: same single file, not rewritten
    assert _files(path, "day=d9") == d9_file_before
    after_rows = sorted((r.k, r.day, r.v) for r in spark.read.parquet(path).collect())
    assert after_rows == before_rows


def test_compaction_respects_multi_file_target(spark):
    from unicargo_medallion_data_pipeline_spark.sources.compaction import (
        compact_partitioned_path, partition_file_census,
    )

    path = _make_table(spark)
    nbytes, nfiles = partition_file_census(spark, path)["day=d0"]
    # pick a target that needs 2-4 files per partition
    target = max(1, nbytes // 3)
    compact_partitioned_path(spark, path, ["day"], target_file_bytes=target)
    after = partition_file_census(spark, path)
    want = -(-nbytes // target)
    assert 1 <= after["day=d0"][1] <= want
    assert after["day=d0"][1] < nfiles


def test_compaction_noop_when_already_compact(spark):
    from unicargo_medallion_data_pipeline_spark.sources.compaction import (
        compact_partitioned_path,
    )

    path = tempfile.mkdtemp(prefix="compact_noop_")
    df = spark.createDataFrame([(1, "d1", 1.0)], "k int, day string, v double")
    df.coalesce(1).write.mode("overwrite").partitionBy("day").parquet(path)
    assert compact_partitioned_path(spark, path, ["day"]) == {}


def test_compaction_restores_overwrite_mode(spark):
    from unicargo_medallion_data_pipeline_spark.sources.compaction import (
        compact_partitioned_path,
    )

    key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "static")
    path = _make_table(spark)
    compact_partitioned_path(spark, path, ["day"], target_file_bytes=1 << 30)
    assert spark.conf.get(key) == "static"
    spark.conf.unset(key)


def test_compaction_handles_escaped_null_and_numeric_partitions(spark):
    """Hive-dir corner cases: URL-escaped values (a:b → a%3Ab), NULL
    partitions (__HIVE_DEFAULT_PARTITION__), and numeric-looking strings
    (day=00, which type inference would rename to day=0) must all be
    matched, compacted under their ORIGINAL dir names, and reported only
    when actually rewritten."""
    from unicargo_medallion_data_pipeline_spark.sources.compaction import (
        compact_partitioned_path, partition_file_census,
    )

    path = tempfile.mkdtemp(prefix="compact_esc_")
    rows = []
    for i in range(300):
        rows.append((i, "a:b", float(i)))        # escaped dir: day=a%3Ab
        rows.append((i, None, float(i)))          # __HIVE_DEFAULT_PARTITION__
        rows.append((i, "00", float(i)))          # numeric-looking string
    df = spark.createDataFrame(rows, "k int, day string, v double")
    df.repartition(10).write.mode("append").partitionBy("day").parquet(path)

    before = spark.read.parquet(path)
    before_rows = sorted(
        ((r.k, r.day or "", r.v) for r in before.collect())
    )
    census = partition_file_census(spark, path)
    assert set(census) == {"day=a%3Ab", "day=__HIVE_DEFAULT_PARTITION__", "day=00"}
    assert all(n == 10 for _, n in census.values())

    done = compact_partitioned_path(spark, path, ["day"], target_file_bytes=1 << 30)
    assert done == {
        "day=a%3Ab": 10,
        "day=__HIVE_DEFAULT_PARTITION__": 10,
        "day=00": 10,
    }

    after = partition_file_census(spark, path)
    # same dir names (no day=0 rename), each down to one file
    assert set(after) == set(census)
    assert all(n == 1 for _, n in after.values())
    after_rows = sorted(
        ((r.k, r.day or "", r.v) for r in spark.read.parquet(path).collect())
    )
    assert after_rows == before_rows


def test_compaction_tolerates_map_columns(spark, tmp_path):
    """r9 hunt: a table with a map column (e.g. bronze metadata) must
    still compact — the bucket hash excludes unhashable columns."""
    import pyspark.sql.functions as F

    from unicargo_medallion_data_pipeline_spark.sources.compaction import (
        compact_partitioned_path,
        partition_file_census,
    )

    path = str(tmp_path / "t")
    df = spark.range(200).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("day"),
        F.create_map(F.lit("k"), F.col("id").cast("string")).alias("meta"),
    )
    df.repartition(10).write.partitionBy("day").parquet(path)
    key = lambda d: sorted((r["id"], r["day"], r["meta"]["k"]) for r in d.collect())
    before_rows = key(spark.read.parquet(path))  # materialized pre-compaction
    done = compact_partitioned_path(spark, path, ["day"], target_file_bytes=1 << 30)
    assert done  # both partitions were fragmented → compacted
    census = partition_file_census(spark, path)
    assert all(n == 1 for _, n in census.values())
    # content identical (map rendered to string for comparison)
    assert key(spark.read.parquet(path)) == before_rows


def test_compaction_refuses_bucketed_layout(spark):
    """r15 task 6: the generic fold-small-files pass must never touch a
    bucketed table — rewriting its files would strip the bucket-id file
    naming and the one-file-per-bucket sort contract that
    save_bucketed_table stamps and read_bucketed_table trusts.  Both
    compaction entry points refuse on sight of a bucket-named data
    file, and the corpus maintenance pass inherits the guard."""
    import pytest
    from pyspark.sql import functions as F

    from unicargo_medallion_data_pipeline_spark.sources.compaction import (
        compact_partitioned_path,
        compact_unpartitioned_path,
    )
    from unicargo_medallion_data_pipeline_spark.sources.writers import (
        save_bucketed_table,
        table_location,
    )

    df = spark.range(0, 100).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("v")
    )
    name = save_bucketed_table(df, spark, "compact_guard", "b_t", ["k"], 4)
    loc = table_location(spark, name)
    with pytest.raises(ValueError, match="bucketed"):
        compact_unpartitioned_path(spark, loc, target_file_bytes=1)
    with pytest.raises(ValueError, match="bucketed"):
        compact_partitioned_path(spark, loc, ["k"], target_file_bytes=1)
    # untouched: still readable with the full row count
    assert spark.table(name).count() == 100
