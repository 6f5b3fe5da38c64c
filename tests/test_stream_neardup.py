"""Streaming near-dup detection (streaming/neardup.py): the continuous
content-dedup tier — per-batch signatures against a maintained table,
pairs equal to the batch full recompute, re-deliveries never re-sign."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
from unicargo_medallion_data_pipeline_spark.streaming.neardup import start_streaming_near_dup
from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
from unicargo_medallion_data_pipeline_spark.textops import dedup as dd

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dirs():
    d = {k: tempfile.mkdtemp(prefix=f"neardup_{k}_") for k in ("src", "sig", "pairs", "ckpt")}
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def _write_batch(docs, path, n):
    docs.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, f"b{n}"))


def test_streaming_near_dups_equal_full_recompute(spark, dirs):
    docs = load_table(spark, SF, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    ).select("doc_id", "text")

    # two ingest files; the second RE-DELIVERS half of the first (the
    # at-least-once reality the admission anti-join must absorb)
    first = docs.filter(F.pmod("doc_id", F.lit(2)) == 0)
    second = docs.filter(
        (F.pmod("doc_id", F.lit(2)) == 1) | (F.pmod("doc_id", F.lit(4)) == 0)
    )
    _write_batch(first, dirs["src"], 0)
    _write_batch(second, dirs["src"], 1)

    schema = spark.read.parquet(os.path.join(dirs["src"], "b0")).schema
    start_streaming_near_dup(
        read_streaming_path(
            spark, dirs["src"] + "/*", schema, options={"maxFilesPerTrigger": "1"}
        ),
        signature_path=dirs["sig"],
        pairs_path=dirs["pairs"],
        checkpoint=dirs["ckpt"],
        k=16,
        bands=8,
        threshold=0.3,
        trigger={"availableNow": True},
    )

    # admission exactly-once: one signature row per distinct doc_id
    sig = spark.read.parquet(dirs["sig"])
    assert sig.count() == docs.count() == sig.select("id").distinct().count()

    got = {
        (r.a_id, r.b_id, round(r.jaccard, 9))
        for r in spark.read.parquet(dirs["pairs"]).collect()
    }
    want = {
        (r.a_id, r.b_id, round(r.jaccard, 9))
        for r in dd.minhash_lsh_candidates(docs, k=16, bands=8)
        .filter(F.col("jaccard") >= 0.3)
        .select("a_id", "b_id", "jaccard")
        .collect()
    }
    assert want, "corpus must contain qualifying near-dup pairs"
    assert got == want


def test_streaming_near_dup_survives_hostile_rows(spark, dirs):
    """NULL ids, NULL text, duplicate ids within one batch, and empty
    strings must be absorbed without crashing; only well-formed distinct
    documents are admitted to the signature table."""
    hostile = spark.createDataFrame(
        [
            (None, "null id"),
            (1, None),
            (1, "kept row"),
            (1, "kept row"),          # duplicate id within the batch
            (2, ""),                   # empty text: one all-tokens shingle
            (3, 'quote " and\nnewline'),
        ],
        "doc_id long, text string",
    )
    _write_batch(hostile, dirs["src"], 0)
    schema = spark.read.parquet(os.path.join(dirs["src"], "b0")).schema
    start_streaming_near_dup(
        read_streaming_path(spark, dirs["src"] + "/*", schema),
        signature_path=dirs["sig"],
        pairs_path=dirs["pairs"],
        checkpoint=dirs["ckpt"],
        trigger={"availableNow": True},
    )
    sig = spark.read.parquet(dirs["sig"])
    assert {r.id for r in sig.select("id").collect()} == {1, 2, 3}
    assert sig.count() == 3
