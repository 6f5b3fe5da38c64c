"""Streaming KMV sketch maintenance (streaming/sketch.py): the
incrementally maintained sketch table must equal the from-scratch
bottom-k over everything streamed, exactly — the mergeability theorem
under real micro-batching — and its estimates must match the batch
catalog query's machinery.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.operators.sketch import (
    kmv_bottom_k,
    kmv_estimate,
)
from unicargo_medallion_data_pipeline_spark.sources.acid import ManifestTable
from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
from unicargo_medallion_data_pipeline_spark.streaming.sketch import (
    write_stream_kmv_sketch,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dirs(spark):
    d = {k: tempfile.mkdtemp(prefix=f"kmvs_{k}_") for k in ("src", "tbl", "ckpt")}
    ev = load_table(spark, SF, "events").select("event_type", "user_id", "ts")
    # several source files → several micro-batches with maxFilesPerTrigger
    ev.repartition(4).write.mode("overwrite").parquet(d["src"])
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def test_maintained_sketch_equals_from_scratch(spark, dirs):
    schema = spark.read.parquet(dirs["src"]).schema
    stream = read_streaming_path(
        spark, dirs["src"], schema, options={"maxFilesPerTrigger": "1"}
    )
    write_stream_kmv_sketch(
        stream,
        table_path=dirs["tbl"],
        checkpoint=dirs["ckpt"],
        k=8,  # small k so saturation + real cuts happen on sf0.001
    )
    t = ManifestTable(spark, dirs["tbl"])
    assert len(t.versions()) >= 2, "expected one commit per micro-batch"
    got = sorted(
        (r.event_type, r.user_id, r.h) for r in t.read().collect()
    )
    full = spark.read.parquet(dirs["src"])
    want = sorted(
        (r.event_type, r.user_id, r.h)
        for r in kmv_bottom_k(full, ["event_type"], "user_id", 8).collect()
    )
    assert got == want

    # Estimates off the maintained table match the exact distincts in the
    # unsaturated regime (15 users < ... per type at sf0.001) and are the
    # deterministic KMV value when saturated.
    est = {
        r.event_type: (r.sketch_rows, r.distinct_est)
        for r in kmv_estimate(t.read(), ["event_type"], 8).collect()
    }
    exact = {
        r.event_type: r.n
        for r in full.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        rows, e = est[et]
        if rows < 8:
            assert e == n
        else:
            assert e > 0


def test_replay_is_idempotent(spark, dirs):
    """Re-running the stream over the SAME source with a fresh checkpoint
    (worst-case full replay) must leave the sketch CONTENT unchanged —
    union ∪ re-cut is idempotent on sets."""
    schema = spark.read.parquet(dirs["src"]).schema
    for ckpt in (dirs["ckpt"], tempfile.mkdtemp(prefix="kmvs_ckpt2_")):
        stream = read_streaming_path(
            spark, dirs["src"], schema, options={"maxFilesPerTrigger": "2"}
        )
        write_stream_kmv_sketch(
            stream, table_path=dirs["tbl"], checkpoint=ckpt, k=8
        )
    t = ManifestTable(spark, dirs["tbl"])
    got = sorted((r.event_type, r.user_id) for r in t.read().collect())
    full = spark.read.parquet(dirs["src"])
    want = sorted(
        (r.event_type, r.user_id)
        for r in kmv_bottom_k(full, ["event_type"], "user_id", 8).collect()
    )
    assert got == want
