"""Streaming CDC apply (streaming/writers.write_stream_cdc_apply):
upserts + deletes in one atomic commit per batch, last-op-per-key wins
via _seq, batch-id fencing across checkpoint wipe."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from unicargo_medallion_data_pipeline_spark.sources.acid import ManifestTable
from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
from unicargo_medallion_data_pipeline_spark.streaming.writers import (
    write_stream_cdc_apply,
)

CDC_SCHEMA = "k int, v string, op string, _seq long"


@pytest.fixture()
def dirs():
    d = {k: tempfile.mkdtemp(prefix=f"cdc_{k}_") for k in ("src", "tbl", "ckpt")}
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def _table(spark, dirs):
    t = ManifestTable(spark, os.path.join(dirs["tbl"], "t"))
    t.commit(
        spark.createDataFrame(
            [(1, "one", "u", 0), (2, "two", "u", 0)], CDC_SCHEMA
        ).select("k", "v")
    )
    return t


def run(spark, dirs, t, ckpt=None):
    write_stream_cdc_apply(
        read_streaming_path(spark, dirs["src"], schema=CDC_SCHEMA),
        table=t,
        checkpoint=ckpt or dirs["ckpt"],
        key_cols=["k"],
        await_termination=True,
    )


def test_cdc_apply_upsert_delete_last_wins(spark, dirs):
    t = _table(spark, dirs)
    # one batch: update k=1 twice (seq decides), delete k=2, insert k=3
    spark.createDataFrame(
        [
            (1, "stale", "u", 1),
            (1, "fresh", "u", 2),
            (2, None, "d", 3),
            (3, "three", "u", 4),
        ],
        CDC_SCHEMA,
    ).write.mode("append").parquet(dirs["src"])
    run(spark, dirs, t)
    state = {r["k"]: r["v"] for r in t.read().collect()}
    assert state == {1: "fresh", 3: "three"}
    # the whole batch landed as ONE version
    assert t.versions() == [0, 1]

    # replay from a WIPED checkpoint: fence must reject batch 0
    ck2 = tempfile.mkdtemp(prefix="cdc_ck2_")
    try:
        run(spark, dirs, t, ckpt=ck2)
    finally:
        shutil.rmtree(ck2, ignore_errors=True)
    assert t.versions() == [0, 1]
    assert {r["k"]: r["v"] for r in t.read().collect()} == {1: "fresh", 3: "three"}

    # a second delta batch applies incrementally on the original checkpoint
    spark.createDataFrame([(3, None, "d", 5)], CDC_SCHEMA).write.mode(
        "append"
    ).parquet(dirs["src"])
    run(spark, dirs, t)
    assert {r["k"]: r["v"] for r in t.read().collect()} == {1: "fresh"}
    # pre-CDC state still time-travelable
    assert {r["k"] for r in t.read(version=0).collect()} == {1, 2}


def test_cdc_fence_survives_interleaved_non_cdc_commit(spark, dirs):
    """The replay fence must read the max cdc_batch_id across ALL
    versions: an interleaved non-CDC commit (here an append) replaces
    latest_meta, and a latest-only fence would re-apply the stale CDC
    batch on replay — resurrecting the deleted key and stale values."""
    t = _table(spark, dirs)
    spark.createDataFrame(
        [(1, "fresh", "u", 1), (2, None, "d", 2)], CDC_SCHEMA
    ).write.mode("append").parquet(dirs["src"])
    run(spark, dirs, t)
    assert {r["k"]: r["v"] for r in t.read().collect()} == {1: "fresh"}

    # interleaved NON-CDC commit: append k=9 (its manifest meta carries
    # no cdc_batch_id — this is what erases a latest-only fence)
    t.commit(
        spark.createDataFrame([(9, "nine", "u", 0)], CDC_SCHEMA).select("k", "v"),
        mode="append",
    )
    assert "cdc_batch_id" not in t.latest_meta()
    after_append = {r["k"]: r["v"] for r in t.read().collect()}
    assert after_append == {1: "fresh", 9: "nine"}

    # crash-replay: wiped checkpoint re-delivers batch 0; the fence
    # must skip it — NOT resurrect k=2 or clobber the appended k=9
    ck2 = tempfile.mkdtemp(prefix="cdc_ck2_")
    try:
        run(spark, dirs, t, ckpt=ck2)
    finally:
        shutil.rmtree(ck2, ignore_errors=True)
    assert {r["k"]: r["v"] for r in t.read().collect()} == after_append
    assert t.max_meta_int("cdc_batch_id") == 0


def test_cdc_apply_empty_table_raises(spark, dirs):
    """apply_cdc_batch on an uninitialized table: a meaningful
    FileNotFoundError (matching read()), not a bare IndexError."""
    from unicargo_medallion_data_pipeline_spark.streaming.writers import apply_cdc_batch

    empty = ManifestTable(spark, os.path.join(dirs["tbl"], "missing"))
    batch = spark.createDataFrame([(1, "one", "u", 0)], CDC_SCHEMA)
    with pytest.raises(FileNotFoundError, match="no committed version"):
        apply_cdc_batch(empty, batch, key_cols=["k"])


def test_cdc_apply_no_seq_tolerates_map_columns(spark, dirs):
    """r8 ADVICE item 2: the no-_seq full-row-hash tiebreak must not feed
    MapType columns to xxhash64 (analysis error); winners stay
    deterministic across repeated applies of the same batch."""
    from unicargo_medallion_data_pipeline_spark.streaming.writers import apply_cdc_batch

    schema = "k int, v string, props map<string,string>, op string"
    t = ManifestTable(spark, os.path.join(dirs["tbl"], "maps"))
    t.commit(
        spark.createDataFrame([(1, "seed", {"a": "1"}, "u")], schema).select(
            "k", "v", "props"
        )
    )
    batch = spark.createDataFrame(
        [
            (1, "left", {"x": "1"}, "u"),
            (1, "right", {"y": "2"}, "u"),  # tied key, no _seq
            (2, "new", None, "u"),
        ],
        schema,
    )
    apply_cdc_batch(t, batch, key_cols=["k"])
    first = {r["k"]: r["v"] for r in t.read().collect()}
    assert set(first) == {1, 2} and first[2] == "new"
    # deterministic: re-applying the identical batch picks the same winner
    apply_cdc_batch(t, batch, key_cols=["k"])
    second = {r["k"]: r["v"] for r in t.read().collect()}
    assert second == first
