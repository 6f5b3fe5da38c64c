"""Atomic SCD2 over a manifest table (apply_scd2_manifest): identical
versioning semantics to the partitioned path, plus single-commit
visibility and per-batch time travel."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.operators.scd2 import (
    apply_scd2,
    apply_scd2_manifest,
    as_of,
)
from unicargo_medallion_data_pipeline_spark.sources.acid import ManifestTable


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "k int, attr string, effective_ts timestamp"
    )


_T1 = dt.datetime(2024, 1, 1)
_T2 = dt.datetime(2024, 2, 1)
_T3 = dt.datetime(2024, 3, 1)


@pytest.fixture()
def table(spark, tmp_path):
    return ManifestTable(spark, os.path.join(tmp_path, "dim"))


def test_matches_partitioned_path_semantics(spark, table, tmp_path):
    """Same batches through both writers → identical logical state."""
    b1 = _batch(spark, [(1, "a", _T1), (2, "b", _T1)])
    b2 = _batch(spark, [(1, "a2", _T2), (3, "c", _T2)])

    path = os.path.join(tmp_path, "dim_path")
    for b in (b1, b2):
        apply_scd2(spark, path, b, ["k"], ["attr"])
        apply_scd2_manifest(spark, table, b, ["k"], ["attr"])

    cols = ["k", "attr", "effective_from", "effective_to", "is_current"]
    a = spark.read.parquet(path).select(*cols)
    m = table.read().select(*cols)
    assert a.exceptAll(m).count() == 0 and m.exceptAll(a).count() == 0


def test_versions_are_per_batch_and_idempotent(spark, table):
    apply_scd2_manifest(spark, table, _batch(spark, [(1, "a", _T1)]), ["k"], ["attr"])
    apply_scd2_manifest(spark, table, _batch(spark, [(1, "b", _T2)]), ["k"], ["attr"])
    assert table.versions() == [0, 1]
    # re-delivery: no new version committed
    apply_scd2_manifest(spark, table, _batch(spark, [(1, "b", _T2)]), ["k"], ["attr"])
    assert table.versions() == [0, 1]
    # version 0 is the pre-change dimension — time travel complement of as_of
    v0 = table.read(version=0).collect()
    assert len(v0) == 1 and v0[0]["attr"] == "a" and v0[0]["is_current"]
    cur = {r["attr"]: r["is_current"] for r in table.read().collect()}
    assert cur == {"a": False, "b": True}


def test_as_of_over_manifest_state(spark, table):
    for rows in ([(1, "a", _T1)], [(1, "b", _T2)], [(1, "c", _T3)]):
        apply_scd2_manifest(spark, table, _batch(spark, rows), ["k"], ["attr"])
    dim = table.read()
    # mid-timeline read returns the second version
    got = as_of(dim, dt.datetime(2024, 2, 15)).collect()
    assert len(got) == 1 and got[0]["attr"] == "b"
    # manifest commits are atomic — no crash-window duplicates, so the
    # as_of dedup shuffle can be skipped
    got2 = as_of(dim, dt.datetime(2024, 2, 15), dedup=False).collect()
    assert len(got2) == 1 and got2[0]["attr"] == "b"


def test_out_of_order_batch_raises_and_commits_nothing(spark, table):
    apply_scd2_manifest(spark, table, _batch(spark, [(1, "b", _T2)]), ["k"], ["attr"])
    with pytest.raises(ValueError, match="time order"):
        apply_scd2_manifest(
            spark, table, _batch(spark, [(1, "z", _T1)]), ["k"], ["attr"]
        )
    assert table.versions() == [0]
    assert [r["attr"] for r in table.read().collect()] == ["b"]


def test_null_key_redelivery_stays_single_version(spark, table):
    b = _batch(spark, [(None, "n", _T1)])
    apply_scd2_manifest(spark, table, b, ["k"], ["attr"])
    apply_scd2_manifest(spark, table, b, ["k"], ["attr"])
    assert table.versions() == [0]
    out = table.read().filter(F.col("k").isNull()).collect()
    assert len(out) == 1 and out[0]["is_current"]
