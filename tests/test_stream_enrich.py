"""Stream-static enrichment joins and Observation-based metrics."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture()
def events_src(spark):
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

    d = tempfile.mkdtemp(prefix="enrich_src_")
    load_table(spark, SF_SMOKE, "events").write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _dim(spark):
    return spark.createDataFrame(
        [("view", "browse"), ("click", "browse"), ("purchase", "convert"),
         ("signup", "convert")],
        "event_type string, funnel_stage string",
    )


def test_stream_static_join_equals_batch(spark, events_src):
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
    from unicargo_medallion_data_pipeline_spark.streaming.enrich import enrich_stream
    from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path

    dim = _dim(spark)
    schema = spark.read.parquet(events_src).schema
    stream = read_streaming_path(spark, events_src, schema)
    enriched = enrich_stream(stream, dim, on="event_type", how="left")
    out = tempfile.mkdtemp(prefix="enrich_out_")
    ckpt = tempfile.mkdtemp(prefix="enrich_ckpt_")
    try:
        (
            enriched.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )
        got = (
            spark.read.parquet(out)
            .groupBy("funnel_stage")
            .count()
            .collect()
        )
        want = (
            load_table(spark, SF_SMOKE, "events")
            .join(dim, "event_type", "left")
            .groupBy("funnel_stage")
            .count()
            .collect()
        )
        assert {(r["funnel_stage"], r["count"]) for r in got} == {
            (r["funnel_stage"], r["count"]) for r in want
        }
        # left join: 'error' events have no dim row -> NULL stage retained
        assert any(r["funnel_stage"] is None for r in got)
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_static_join_is_stateless(spark, events_src):
    """No state store: the micro-batch plan must contain the join but no
    stateful operator nodes."""
    from unicargo_medallion_data_pipeline_spark.streaming.enrich import enrich_stream
    from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path

    schema = spark.read.parquet(events_src).schema
    stream = read_streaming_path(spark, events_src, schema)
    enriched = enrich_stream(stream, _dim(spark), on="event_type")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_stateless")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        progress = q.lastProgress
        assert progress is not None
        assert not progress.get("stateOperators"), "stream-static join must keep no state"
    finally:
        q.stop()


def test_unsupported_modes_raise(spark, events_src):
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
    from unicargo_medallion_data_pipeline_spark.streaming.enrich import enrich_stream
    from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path

    schema = spark.read.parquet(events_src).schema
    stream = read_streaming_path(spark, events_src, schema)
    batch = load_table(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError, match="streaming DataFrame"):
        enrich_stream(batch, _dim(spark), on="event_type")
    with pytest.raises(ValueError, match="unbounded state"):
        enrich_stream(stream, _dim(spark), on="event_type", how="full")
    with pytest.raises(ValueError, match="stream-stream"):
        enrich_stream(stream, stream, on="event_type")


def test_observed_metrics_piggyback_on_one_job(spark):
    from unicargo_medallion_data_pipeline_spark.quality.observe import (
        assert_observed_rows,
        observe_metrics,
    )
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    obs, observed = observe_metrics(
        ev,
        rows=F.count(F.lit(1)),
        null_types=F.count_if(F.col("event_type").isNull()),
        total_value=F.sum(F.col("value").cast("decimal(18,2)")).cast("double"),
    )
    out = tempfile.mkdtemp(prefix="obs_out_")
    try:
        observed.write.mode("overwrite").parquet(out)  # the ONLY action
        m = obs.get
        assert m["rows"] == 1000
        assert m["null_types"] == 0
        assert m["total_value"] > 0
        assert assert_observed_rows(obs, expected_min=1000) == 1000
        with pytest.raises(ValueError, match="row-count gate"):
            assert_observed_rows(obs, expected_min=10**9)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_observe_requires_metrics():
    from unicargo_medallion_data_pipeline_spark.quality.observe import observe_metrics

    with pytest.raises(ValueError, match="at least one"):
        observe_metrics(None)
