"""Streaming key-erasure (streaming/erasure.py): requests consumed from
a stream are applied per micro-batch, the audit log accumulates with
batch ids, and checkpoint replay is exactly-once."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.streaming.erasure import write_stream_erasure
from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path


@pytest.fixture()
def dirs():
    d = {k: tempfile.mkdtemp(prefix=f"erasestream_{k}_") for k in
         ("requests", "target", "audit", "ckpt")}
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def _seed_target(spark, path):
    spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 10, "b"), (4, 30, "b"), (5, 40, "c")],
        "row_id int, user_id int, part string",
    ).write.mode("overwrite").partitionBy("part").parquet(path)


def test_streaming_erasure_end_to_end(spark, dirs):
    _seed_target(spark, dirs["target"])
    req_schema = "user_id int"
    spark.createDataFrame([(10,)], req_schema).write.mode("append").parquet(
        dirs["requests"]
    )

    def run():
        write_stream_erasure(
            read_streaming_path(spark, dirs["requests"], schema=req_schema),
            target_path=dirs["target"],
            audit_path=dirs["audit"],
            checkpoint=dirs["ckpt"],
            key_cols=["user_id"],
            partition_col="part",
            await_termination=True,
        )

    run()
    left = spark.read.parquet(dirs["target"])
    assert sorted(r["row_id"] for r in left.collect()) == [2, 4, 5]
    audit = spark.read.parquet(dirs["audit"])
    got = {(r["partition"], r["rows_deleted"]) for r in audit.collect()}
    assert got == {("a", 1), ("b", 1)}

    # Replay with the same checkpoint and no new requests: exactly-once —
    # no further deletions, no new audit rows.
    run()
    assert spark.read.parquet(dirs["target"]).count() == 3
    assert spark.read.parquet(dirs["audit"]).count() == 2

    # A second request file arrives: only the delta is processed; the
    # audit gains exactly the new batch's rows, tagged with a new batch id.
    spark.createDataFrame([(30,), (99,)], req_schema).write.mode("append").parquet(
        dirs["requests"]
    )
    run()
    assert sorted(
        r["row_id"] for r in spark.read.parquet(dirs["target"]).collect()
    ) == [2, 5]
    audit2 = spark.read.parquet(dirs["audit"])
    assert audit2.count() == 3
    assert audit2.select("batch_id").distinct().count() == 2
    # key 99 matched nothing and produced no audit row (idempotent shape)
    assert audit2.filter(F.col("rows_deleted") == 0).count() == 0


def test_manifest_erasure_delete_and_audit_atomic(spark, dirs):
    """Manifest-backed variant: delete + audit ride ONE commit, the
    audit is exactly-once (fenced even across a WIPED checkpoint, the
    replay case where the plain-parquet variant loses audit rows), and
    interleaved non-erasure commits cannot mask the fence."""
    import json

    from unicargo_medallion_data_pipeline_spark.sources.acid import ManifestTable
    from unicargo_medallion_data_pipeline_spark.streaming.erasure import (
        erasure_audit_frame,
        write_stream_erasure_manifest,
    )

    t = ManifestTable(spark, os.path.join(dirs["target"], "mt"))
    t.commit(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "a"), (3, 10, "b"), (4, 30, "b")],
            "row_id int, user_id int, part string",
        )
    )
    req_schema = "user_id int"
    spark.createDataFrame([(10,)], req_schema).write.mode("append").parquet(
        dirs["requests"]
    )

    def run(ckpt):
        write_stream_erasure_manifest(
            read_streaming_path(spark, dirs["requests"], schema=req_schema),
            table=t,
            checkpoint=ckpt,
            key_cols=["user_id"],
            await_termination=True,
        )

    run(dirs["ckpt"])
    assert sorted(r["row_id"] for r in t.read().collect()) == [2, 4]
    audit = erasure_audit_frame(spark, t).collect()
    assert len(audit) == 1
    assert json.loads(audit[0]["audit_json"]) == {"rows_deleted": 2, "user_id": 10}

    # time travel still shows the pre-erasure state (compliance nuance:
    # vacuum must expire old versions to complete the erasure)
    assert t.read(version=0).count() == 4

    # WIPED checkpoint → full replay from batch 0: the manifest fence
    # alone must stop a duplicate audit (this is exactly the crash
    # window where the plain-parquet audit goes missing)
    ckpt2 = tempfile.mkdtemp(prefix="erasestream_ckpt2_")
    try:
        run(ckpt2)
    finally:
        shutil.rmtree(ckpt2, ignore_errors=True)
    assert len(t.versions()) == 2  # no third version
    assert erasure_audit_frame(spark, t).count() == 1

    # interleaved non-erasure commit, then a NEW request: fence must
    # still see the max erasure batch id from older versions
    t.commit(
        spark.createDataFrame([(9, 90, "c")], "row_id int, user_id int, part string"),
        mode="append",
    )
    spark.createDataFrame([(30,)], req_schema).write.mode("append").parquet(
        dirs["requests"]
    )
    run(dirs["ckpt"])
    assert sorted(r["row_id"] for r in t.read().collect()) == [2, 9]
    assert erasure_audit_frame(spark, t).count() == 2


def test_manifest_erasure_rejects_null_keys(spark, dirs):
    """A NULL-keyed deletion request must FAIL the batch, not silently
    delete nothing with no audit row (the compliance hazard the parquet
    sibling already raises for)."""
    from pyspark.errors import StreamingQueryException

    from unicargo_medallion_data_pipeline_spark.sources.acid import ManifestTable
    from unicargo_medallion_data_pipeline_spark.streaming.erasure import (
        write_stream_erasure_manifest,
    )

    t = ManifestTable(spark, os.path.join(dirs["target"], "mt2"))
    t.commit(
        spark.createDataFrame(
            [(1, 10, "a")], "row_id int, user_id int, part string"
        )
    )
    req_schema = "user_id int"
    spark.createDataFrame([(None,)], req_schema).write.mode("append").parquet(
        dirs["requests"]
    )
    with pytest.raises(StreamingQueryException, match="NULL"):
        write_stream_erasure_manifest(
            read_streaming_path(spark, dirs["requests"], schema=req_schema),
            table=t,
            checkpoint=dirs["ckpt"],
            key_cols=["user_id"],
            await_termination=True,
        )
    # table untouched, no phantom audit commit
    assert t.read().count() == 1
    assert t.max_meta_int("erasure_batch_id") == -1
