"""Z-order layout tests: the rewrite must actually cluster BOTH
dimensions (footer min/max spans shrink), where a linear sort only helps
its leading column."""

from __future__ import annotations

import shutil
import tempfile

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

    return load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
    )


def test_zvalue_is_deterministic_and_bounded(spark, lineitem):
    from pyspark.sql import functions as F

    from unicargo_medallion_data_pipeline_spark.operators.layout import zvalue_column

    z = lineitem.withColumn("z", zvalue_column(lineitem, ["l_partkey", "l_suppkey"], bits=8))
    stats = z.agg(F.min("z"), F.max("z"), F.count("z")).collect()[0]
    assert stats[0] >= 0
    assert stats[1] < (1 << 16), "2 cols x 8 bits must fit in 16 bits"
    # Deterministic: same input -> same zvalues (no rand/partition dependence).
    a = sorted(r["z"] for r in z.select("z").collect())
    b = sorted(r["z"] for r in z.select("z").collect())
    assert a == b


def test_zorder_clusters_both_columns(spark, lineitem):
    from unicargo_medallion_data_pipeline_spark.operators.layout import (
        clustering_report,
        write_zordered,
    )

    zdir = tempfile.mkdtemp(prefix="zorder_")
    ldir = tempfile.mkdtemp(prefix="linear_")
    try:
        cols = ["l_partkey", "l_suppkey"]
        n = write_zordered(lineitem, zdir, cols, n_files=8)
        assert n == 8
        # Linear-sort baseline: same file count, sorted by the FIRST key only.
        (
            lineitem.repartitionByRange(8, "l_partkey")
            .sortWithinPartitions("l_partkey")
            .write.mode("overwrite")
            .parquet(ldir)
        )
        zrep = clustering_report(zdir, cols)
        lrep = clustering_report(ldir, cols)

        # Linear layout: leading column clusters well, second doesn't.
        assert lrep["l_partkey"] < 0.35
        assert lrep["l_suppkey"] > 0.8, "baseline should NOT cluster the 2nd col"
        # Z-order: BOTH columns' mean file span well under the full domain.
        assert zrep["l_partkey"] < 0.6, f"zorder 1st col span {zrep}"
        assert zrep["l_suppkey"] < 0.6, f"zorder 2nd col span {zrep}"
        # And the rewrite is lossless.
        from pyspark.sql import functions as F

        got = spark.read.parquet(zdir)
        assert got.count() == lineitem.count()
        assert (
            got.agg(F.sum("l_orderkey")).collect()[0][0]
            == lineitem.agg(F.sum("l_orderkey")).collect()[0][0]
        )
    finally:
        shutil.rmtree(zdir, ignore_errors=True)
        shutil.rmtree(ldir, ignore_errors=True)


def test_zorder_rejects_overflow_and_empty(spark, lineitem):
    from unicargo_medallion_data_pipeline_spark.operators.layout import zvalue_column

    with pytest.raises(ValueError):
        zvalue_column(lineitem, [], bits=8)
    with pytest.raises(ValueError):
        zvalue_column(lineitem, ["l_partkey", "l_suppkey"], bits=32)
