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


def test_merge_bootstraps_missing_target(spark):
    import os

    from unicargo_medallion_data_pipeline_spark.sources.merge import merge_upsert_partitioned

    target = os.path.join(tempfile.mkdtemp(prefix="fact_"), "not_yet_there")
    updates = spark.createDataFrame([(1, "d1", 1.0)], ["k", "day", "amount"])
    merge_upsert_partitioned(spark, target, updates, ["k"], "day")
    got = spark.read.parquet(target).collect()
    assert len(got) == 1 and got[0]["amount"] == 1.0


def test_merge_caps_touched_partitions(spark):
    import pytest

    from unicargo_medallion_data_pipeline_spark.sources.merge import merge_upsert_partitioned

    target = tempfile.mkdtemp(prefix="fact_")
    spark.createDataFrame([(0, "d0", 0.0)], ["k", "day", "amount"]).write.mode(
        "overwrite"
    ).partitionBy("day").parquet(target)
    wide = spark.createDataFrame(
        [(i, f"d{i}", float(i)) for i in range(5)], ["k", "day", "amount"]
    )
    with pytest.raises(ValueError, match="distinct 'day' partitions"):
        merge_upsert_partitioned(
            spark, target, wide, ["k"], "day", max_touched_partitions=3
        )
    # under the cap it proceeds
    merge_upsert_partitioned(
        spark, target, wide, ["k"], "day", max_touched_partitions=5
    )
    # k=0 updated in place, k=1..4 inserted
    assert spark.read.parquet(target).count() == 5


def test_merge_rejects_null_partition_values(spark):
    import pytest

    from unicargo_medallion_data_pipeline_spark.sources.merge import merge_upsert_partitioned

    target = tempfile.mkdtemp(prefix="fact_")
    spark.createDataFrame([(0, "d0", 0.0)], ["k", "day", "amount"]).write.mode(
        "overwrite"
    ).partitionBy("day").parquet(target)
    bad = spark.createDataFrame([(1, None, 1.0)], "k int, day string, amount double")
    with pytest.raises(ValueError, match="NULL 'day'"):
        merge_upsert_partitioned(spark, target, bad, ["k"], "day")


def test_merge_detects_partition_movers_when_asked(spark):
    import pytest

    from unicargo_medallion_data_pipeline_spark.sources.merge import merge_upsert_partitioned

    target = tempfile.mkdtemp(prefix="fact_")
    spark.createDataFrame(
        [(1, "d1", 1.0), (2, "d2", 2.0)], ["k", "day", "amount"]
    ).write.mode("overwrite").partitionBy("day").parquet(target)
    mover = spark.createDataFrame([(1, "d2", 9.0)], ["k", "day", "amount"])
    with pytest.raises(ValueError, match="changed 'day'"):
        merge_upsert_partitioned(
            spark, target, mover, ["k"], "day", check_partition_immutability=True
        )


def test_merge_restores_conf_and_cleans_staging(spark):
    import glob

    from unicargo_medallion_data_pipeline_spark.sources.merge import merge_upsert_partitioned

    key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "static")
    before = set(glob.glob(tempfile.gettempdir() + "/merge_staging_*"))
    target = tempfile.mkdtemp(prefix="fact_")
    spark.createDataFrame([(1, "d1", 1.0)], ["k", "day", "amount"]).write.mode(
        "overwrite"
    ).partitionBy("day").parquet(target)
    merge_upsert_partitioned(
        spark, target, spark.createDataFrame([(1, "d1", 2.0)], ["k", "day", "amount"]),
        ["k"], "day",
    )
    assert spark.conf.get(key) == "static"  # restored, not left "dynamic"
    after = set(glob.glob(tempfile.gettempdir() + "/merge_staging_*"))
    assert after - before == set()  # staging dir removed
    spark.conf.unset(key)


def test_merge_null_merge_key_raises(spark, tmp_path):
    """Round-10 sources hunt: a NULL-keyed update row can never match
    under MERGE equality and used to land as a compounding duplicate
    next to the existing NULL-keyed row; it now fails fast.  NULL-keyed
    TARGET rows keep surviving untouched."""
    import os

    import pytest as _pytest

    from unicargo_medallion_data_pipeline_spark.sources.merge import (
        merge_upsert_partitioned,
    )

    p = os.path.join(str(tmp_path), "t")
    spark.createDataFrame(
        [(None, "d1", "old"), (1, "d1", "a")], "k int, day string, v string"
    ).write.partitionBy("day").parquet(p)
    with _pytest.raises(ValueError, match="NULL merge key"):
        merge_upsert_partitioned(
            spark,
            p,
            spark.createDataFrame(
                [(None, "d1", "new")], "k int, day string, v string"
            ),
            merge_keys=["k"],
            partition_col="day",
        )
    # clean batch: null-keyed target row survives the partition rewrite
    merge_upsert_partitioned(
        spark,
        p,
        spark.createDataFrame([(1, "d1", "A")], "k int, day string, v string"),
        merge_keys=["k"],
        partition_col="day",
    )
    rows = sorted([(r["k"], r["v"]) for r in spark.read.parquet(p).collect()], key=str)
    assert rows == [(1, "A"), (None, "old")]


def test_merge_rejects_duplicate_update_keys(spark, tmp_path):
    """Round-10 Delta-parity: two update rows for one key raise (the
    Delta branch fails with 'multiple source rows matched'; the parquet
    fallback used to silently land both)."""
    import os

    import pytest as _pytest

    from unicargo_medallion_data_pipeline_spark.sources.merge import (
        merge_upsert_partitioned,
    )

    p = os.path.join(str(tmp_path), "t")
    spark.createDataFrame([(1, "d1", "a")], "k int, day string, v string").write.partitionBy(
        "day"
    ).parquet(p)
    with _pytest.raises(ValueError, match="more than one row"):
        merge_upsert_partitioned(
            spark,
            p,
            spark.createDataFrame(
                [(1, "d1", "x"), (1, "d1", "y")], "k int, day string, v string"
            ),
            merge_keys=["k"],
            partition_col="day",
        )
    # pre-reduced batches can skip the gate (the streaming sink's path)
    merge_upsert_partitioned(
        spark,
        p,
        spark.createDataFrame([(1, "d1", "z")], "k int, day string, v string"),
        merge_keys=["k"],
        partition_col="day",
        check_duplicate_keys=False,
    )
    assert [(r["k"], r["v"]) for r in spark.read.parquet(p).collect()] == [(1, "z")]
