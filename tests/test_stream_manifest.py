"""Exactly-once streaming commits into a ManifestTable: one version per
micro-batch, batch-id fencing on replay, atomic reader visibility."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.sources.acid import ManifestTable
from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
from unicargo_medallion_data_pipeline_spark.streaming.writers import (
    write_stream_to_manifest,
)


@pytest.fixture()
def dirs():
    d = {k: tempfile.mkdtemp(prefix=f"mstream_{k}_") for k in ("src", "tbl", "ckpt")}
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def test_stream_commits_append_exactly_once(spark, dirs):
    schema = "k int, v string"
    spark.createDataFrame([(1, "a"), (2, "b")], schema).write.mode(
        "append"
    ).parquet(dirs["src"])
    table = ManifestTable(spark, os.path.join(dirs["tbl"], "t"))

    def run():
        write_stream_to_manifest(
            read_streaming_path(spark, dirs["src"], schema=schema),
            table,
            checkpoint=dirs["ckpt"],
            await_termination=True,
        )

    run()
    assert sorted(r["k"] for r in table.read().collect()) == [1, 2]
    n_versions = len(table.versions())
    assert table.latest_meta().get("batch_id") is not None

    # replay with the same checkpoint and no new data: no new version
    run()
    assert len(table.versions()) == n_versions

    # new file → one more version containing the union
    spark.createDataFrame([(3, "c")], schema).write.mode("append").parquet(
        dirs["src"]
    )
    run()
    assert len(table.versions()) == n_versions + 1
    assert sorted(r["k"] for r in table.read().collect()) == [1, 2, 3]
    # previous version still readable (per-batch time travel)
    prev = table.read(version=table.versions()[-2])
    assert sorted(r["k"] for r in prev.collect()) == [1, 2]


def test_overwrite_mode_keeps_unchanged_groups(spark, dirs):
    """mode='overwrite' must pair with COMPLETE output mode: a batch
    touching only one group still commits the full aggregate state —
    update mode would emit only the changed group and the overwrite
    would silently drop every other group from the table."""
    schema = "k int, v string"
    spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], schema
    ).write.mode("append").parquet(dirs["src"])
    table = ManifestTable(spark, os.path.join(dirs["tbl"], "t"))

    def run():
        counts = (
            read_streaming_path(spark, dirs["src"], schema=schema)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        write_stream_to_manifest(
            counts,
            table,
            checkpoint=dirs["ckpt"],
            mode="overwrite",
            await_termination=True,
        )

    run()
    assert {(r["k"], r["n"]) for r in table.read().collect()} == {(1, 2), (2, 1)}
    # new data for group 1 ONLY: group 2 must survive the overwrite
    spark.createDataFrame([(1, "d")], schema).write.mode("append").parquet(
        dirs["src"]
    )
    run()
    assert {(r["k"], r["n"]) for r in table.read().collect()} == {(1, 3), (2, 1)}


def test_batch_id_fence_blocks_double_apply(spark, dirs):
    """Even with a FRESH checkpoint (simulating the crash-after-commit /
    before-checkpoint window), a batch id ≤ the recorded one is not
    re-applied."""
    schema = "k int, v string"
    spark.createDataFrame([(1, "a")], schema).write.mode("append").parquet(
        dirs["src"]
    )
    table = ManifestTable(spark, os.path.join(dirs["tbl"], "t"))
    write_stream_to_manifest(
        read_streaming_path(spark, dirs["src"], schema=schema),
        table,
        checkpoint=dirs["ckpt"],
        await_termination=True,
    )
    assert table.read().count() == 1
    # fresh checkpoint → Spark replays everything as batch 0 again;
    # the fence (batch_id 0 ≤ recorded 0) must skip it
    ckpt2 = tempfile.mkdtemp(prefix="mstream_ckpt2_")
    try:
        write_stream_to_manifest(
            read_streaming_path(spark, dirs["src"], schema=schema),
            table,
            checkpoint=ckpt2,
            await_termination=True,
        )
        assert table.read().count() == 1, "replayed batch must be fenced"
    finally:
        shutil.rmtree(ckpt2, ignore_errors=True)
