"""End-to-end streaming composition: synthetic Python DataSource stream
→ watermarked tumbling aggregation → atomic manifest commits — three
engine subsystems in one checkpointed query, verified against the batch
computation of the same deterministic rows.

Append-mode windows only finalize when the watermark advances, which
happens BETWEEN micro-batches — so the test runs two availableNow
passes with a growing row cap (the connector's offset tracking resumes
from the checkpoint): run 2's later timestamps advance the watermark
and flush run 1's windows.  That is exactly the production shape of
scheduled incremental ingestion."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.sources.acid import ManifestTable
from unicargo_medallion_data_pipeline_spark.sources.synthetic import (
    SyntheticEventsDataSource,
)
from unicargo_medallion_data_pipeline_spark.streaming.windows import (
    tumbling_window_agg,
)
from unicargo_medallion_data_pipeline_spark.streaming.writers import (
    write_stream_to_manifest,
)

_ROWS_1, _ROWS_2 = 3000, 6000


@pytest.fixture()
def dirs():
    d = {k: tempfile.mkdtemp(prefix=f"e2e_{k}_") for k in ("tbl", "ckpt")}
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def test_source_window_manifest_pipeline(spark, dirs):
    spark.dataSource.register(SyntheticEventsDataSource)
    table = ManifestTable(spark, os.path.join(dirs["tbl"], "t"))

    def run(total_rows: int):
        stream = (
            spark.readStream.format("synthetic_events")
            .option("seed", "7")
            .option("total_rows", str(total_rows))
            .load()
        )
        write_stream_to_manifest(
            tumbling_window_agg(stream, "5 minutes", "10 minutes"),
            table,
            checkpoint=dirs["ckpt"],
            await_termination=True,
        )

    run(_ROWS_1)
    run(_ROWS_2)  # new rows, later event times → run-1 windows finalize

    got = table.read()
    assert got.count() > 0, "watermark advance must have flushed windows"

    # batch mirror over the SAME deterministic rows (stream ≡ batch is
    # the connector's contract): every streamed window must match the
    # batch aggregation of the full 6000 rows exactly.
    batch = (
        spark.read.format("synthetic_events")
        .option("seed", "7")
        .option("rows", str(_ROWS_2))
        .load()
    )
    want = tumbling_window_agg(batch, "5 minutes", "10 minutes")
    j = got.select("window_start", "event_type", "n_events").join(
        want.select(
            "window_start", "event_type", F.col("n_events").alias("want_n")
        ),
        ["window_start", "event_type"],
        "left",
    )
    assert j.filter(F.col("want_n").isNull()).count() == 0
    assert j.filter(F.col("n_events") != F.col("want_n")).count() == 0
    # only watermark-finalized windows are streamed: strict subset at
    # the trailing horizon
    assert got.count() < want.count()

    # replay with the same checkpoint and no new rows: no new version
    n_versions = len(table.versions())
    run(_ROWS_2)
    assert len(table.versions()) == n_versions
