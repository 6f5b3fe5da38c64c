"""Streaming tests: availableNow incremental append, foreachBatch MERGE
upsert, and watermarked window aggregations over the events table."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_stream_dir(spark):
    """Stage the events table as a streaming source directory (normalized
    to µs timestamps so the parquet stream source accepts it)."""
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

    d = tempfile.mkdtemp(prefix="events_src_")
    load_table(spark, SF, "events").write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_available_now_append(spark, events_stream_dir):
    from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
    from unicargo_medallion_data_pipeline_spark.streaming.writers import write_stream_to_path

    schema = spark.read.parquet(events_stream_dir).schema
    out = tempfile.mkdtemp(prefix="stream_out_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    stream = read_streaming_path(spark, events_stream_dir, schema)
    assert stream.isStreaming
    write_stream_to_path(
        stream.filter(F.col("event_type") == "purchase"),
        out,
        ckpt,
        await_termination=True,
    )
    got = spark.read.parquet(out)
    want = spark.read.parquet(events_stream_dir).filter(F.col("event_type") == "purchase")
    assert got.count() == want.count() > 0

    # Incremental semantics: add a new file, rerun with SAME checkpoint →
    # only the new rows are appended.
    extra = want.limit(7).withColumn("event_id", F.col("event_id") + 1_000_000)
    extra.write.mode("append").parquet(events_stream_dir)
    write_stream_to_path(
        read_streaming_path(spark, events_stream_dir, schema).filter(
            F.col("event_type") == "purchase"
        ),
        out,
        ckpt,
        await_termination=True,
    )
    assert spark.read.parquet(out).count() == want.count() + 7


def test_streaming_foreach_batch_merge(spark, events_stream_dir):
    from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
    from unicargo_medallion_data_pipeline_spark.streaming.writers import write_stream_with_merge

    schema = spark.read.parquet(events_stream_dir).schema
    target = tempfile.mkdtemp(prefix="merge_target_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_merge_")

    # Seed the target with the events, partitioned by event_type, but
    # with value zeroed — the merge must overwrite matched keys.
    base = spark.read.parquet(events_stream_dir)
    base.withColumn("value", F.lit(0.0)).write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(target)

    stream = read_streaming_path(spark, events_stream_dir, schema)
    write_stream_with_merge(
        stream,
        target,
        ckpt,
        merge_keys=["event_id"],
        partition_col="event_type",
        await_termination=True,
    )
    merged = spark.read.parquet(target)
    assert merged.count() == base.count(), "merge must not duplicate keys"
    # matched rows updated: values no longer all zero
    assert merged.filter(F.col("value") != 0.0).count() > 0


def test_tumbling_window_batch_equivalence(spark):
    """The window expression must agree with a hand-computed bucket count
    (run in batch mode — same expression as streaming)."""
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
    from unicargo_medallion_data_pipeline_spark.streaming.windows import tumbling_window_agg

    ev = load_table(spark, SF, "events")
    win = tumbling_window_agg(ev, "5 minutes", "10 minutes")
    total = win.agg(F.sum("n_events")).collect()[0][0]
    assert total == ev.count(), "every event must land in exactly one tumbling window"
    # windows align to 5-minute boundaries
    misaligned = win.filter(F.unix_timestamp("window_start") % 300 != 0).count()
    assert misaligned == 0


def test_sliding_window_multiplicity(spark):
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
    from unicargo_medallion_data_pipeline_spark.streaming.windows import sliding_window_agg

    ev = load_table(spark, SF, "events")
    win = sliding_window_agg(ev, "10 minutes", "5 minutes")
    total = win.agg(F.sum("n_events")).collect()[0][0]
    assert total == 2 * ev.count(), "width/slide=2 → every event in exactly 2 windows"


def test_session_window_gap_semantics(spark):
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
    from unicargo_medallion_data_pipeline_spark.streaming.windows import session_window_agg

    ev = load_table(spark, SF, "events")
    sessions = session_window_agg(ev, "30 minutes")
    # conservation: session event counts sum to the input count
    assert sessions.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    # no user may have overlapping sessions
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_start")
    overlaps = (
        sessions.withColumn("prev_end", F.lag("session_end").over(w))
        .filter(F.col("prev_end") > F.col("session_start"))
        .count()
    )
    assert overlaps == 0


def test_streaming_window_plan_is_stateful(spark, events_stream_dir):
    """The same window expression on a streaming frame must produce a
    stateful streaming plan (watermark honored) — checked via the
    query's progress after an availableNow run to a memory sink."""
    from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
    from unicargo_medallion_data_pipeline_spark.streaming.windows import tumbling_window_agg

    schema = spark.read.parquet(events_stream_dir).schema
    stream = tumbling_window_agg(read_streaming_path(spark, events_stream_dir, schema))
    q = (
        stream.writeStream.format("memory")
        .queryName("tumbling_memory_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT sum(n_events) AS n FROM tumbling_memory_sink").collect()[0]["n"]
    src = spark.read.parquet(events_stream_dir)
    # append mode emits only watermark-finalized windows: everything except
    # the trailing watermark horizon must have been flushed
    assert out is not None and out > 0.8 * src.count()


def test_streaming_dedup_within_watermark(spark):
    """Re-delivered keys within the watermark horizon are dropped across
    micro-batch runs (state persisted in the checkpoint)."""
    import datetime as dt
    import os
    import tempfile

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from unicargo_medallion_data_pipeline_spark.streaming.dedup import (
        dedup_stream_within_watermark,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("event_type", StringType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    src = tempfile.mkdtemp(prefix="dedup_src_")
    ckpt = tempfile.mkdtemp(prefix="dedup_ckpt_")
    out = tempfile.mkdtemp(prefix="dedup_out_")

    def write_batch(name, rows):
        spark.createDataFrame(
            [(i, t0 + dt.timedelta(seconds=s), e) for i, s, e in rows], schema
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, name))

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = (
            dedup_stream_within_watermark(stream, ["event_id"], "60 seconds")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.schema(schema).parquet(out).collect()

    # Batch 1: id 1 delivered twice in-batch, id 2 once.
    write_batch("b1", [(1, 0, "a"), (1, 1, "a-dup"), (2, 2, "b")])
    rows1 = run_once()
    assert sorted(r.event_id for r in rows1) == [1, 2]

    # Batch 2: id 1 re-delivered within the horizon -> dropped; id 3 new.
    write_batch("b2", [(1, 5, "a-redelivery"), (3, 10, "c")])
    rows2 = run_once()
    assert sorted(r.event_id for r in rows2) == [1, 2, 3]


def test_streaming_curation_composes(spark):
    """The corpus-prep projections (PII redaction, fingerprinting,
    quality gating) are plain Column expressions, so the SAME code runs
    unchanged inside a stream: ingest documents with planted duplicates
    → redact → gate → state-bounded fingerprint dedup → parquet sink."""
    import shutil
    import tempfile

    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
    from unicargo_medallion_data_pipeline_spark.streaming.dedup import dedup_stream_exact
    from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
    from unicargo_medallion_data_pipeline_spark.streaming.writers import write_stream_to_path
    from unicargo_medallion_data_pipeline_spark.textops import analysis as ta
    from unicargo_medallion_data_pipeline_spark.textops.pii import redact_pii

    src = tempfile.mkdtemp(prefix="docs_src_")
    out = tempfile.mkdtemp(prefix="docs_cur_")
    ckpt = tempfile.mkdtemp(prefix="docs_ckpt_")
    try:
        docs = load_table(spark, SF, "documents").select("doc_id", "lang", "text")
        docs.write.mode("overwrite").parquet(src)
        # re-deliver 10 docs under new ids (same content → same fingerprint)
        docs.limit(10).withColumn("doc_id", F.col("doc_id") + 1_000_000).write.mode(
            "append"
        ).parquet(src)

        schema = spark.read.parquet(src).schema
        stream = read_streaming_path(spark, src, schema)
        curated = dedup_stream_exact(
            stream.select(
                "doc_id",
                "lang",
                redact_pii("text").alias("text"),
                ta.fingerprint("text").alias("fp"),
                ta.quality_score("text").alias("quality"),
            ).filter(F.col("quality") >= 0.45),
            ["fp"],
        )
        write_stream_to_path(curated, out, ckpt, await_termination=True)

        got = spark.read.parquet(out)
        want = (
            docs.select(
                "doc_id", ta.fingerprint("text").alias("fp"), ta.quality_score("text").alias("q")
            )
            .filter(F.col("q") >= 0.45)
            .select("fp")
            .distinct()
            .count()
        )
        assert got.count() == want > 0, "stream must emit one row per surviving fingerprint"
        assert got.filter(F.col("quality") < 0.45).count() == 0
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_merge_sink_reduces_duplicate_keys_within_batch(spark):
    """Two updates for one key in ONE micro-batch must reduce to a
    single winner before the merge (seq_col picks it): unreduced
    duplicates kill a Delta MERGE and land as duplicate key rows
    through the parquet fallback's union."""
    from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
    from unicargo_medallion_data_pipeline_spark.streaming.writers import write_stream_with_merge

    src = tempfile.mkdtemp(prefix="mdup_src_")
    target = tempfile.mkdtemp(prefix="mdup_target_")
    ckpt = tempfile.mkdtemp(prefix="mdup_ckpt_")
    schema = "k int, part string, v string, seq long"
    spark.createDataFrame(
        [(1, "a", "old-batch-row1", 1), (1, "a", "new-batch-row2", 2)], schema
    ).write.mode("overwrite").parquet(src)
    spark.createDataFrame([(1, "a", "seed", 0)], schema).write.mode(
        "overwrite"
    ).partitionBy("part").parquet(target)

    write_stream_with_merge(
        read_streaming_path(spark, src, schema),
        target,
        ckpt,
        merge_keys=["k"],
        partition_col="part",
        seq_col="seq",
        await_termination=True,
    )
    rows = spark.read.parquet(target).collect()
    assert len(rows) == 1, f"duplicate key rows written: {rows}"
    assert rows[0]["v"] == "new-batch-row2" and rows[0]["seq"] == 2


def test_stream_merge_no_seq_tolerates_map_columns(spark, tmp_path):
    """The no-seq_col winner tiebreak must skip unorderable (map)
    columns instead of failing analysis on the first map-carrying batch
    (same class as the CDC tiebreak fix)."""
    import os

    from pyspark.sql import functions as F

    from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
    from unicargo_medallion_data_pipeline_spark.streaming.writers import (
        write_stream_with_merge,
    )

    schema = "k int, day string, v string, props map<string,string>"
    src = os.path.join(str(tmp_path), "src")
    spark.createDataFrame(
        [
            (1, "d1", "a", {"x": "1"}),
            (1, "d1", "b", {"y": "2"}),  # tied key in one batch, no seq
            (2, "d2", "c", None),
        ],
        schema,
    ).write.mode("overwrite").json(src)
    target = os.path.join(str(tmp_path), "tgt")
    write_stream_with_merge(
        read_streaming_path(spark, src, schema=schema, file_format="json"),
        target_path=target,
        checkpoint=os.path.join(str(tmp_path), "ckpt"),
        merge_keys=["k"],
        partition_col="day",
    )
    got = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    # winner for k=1 is the greatest under orderable non-key cols (day,
    # v) -> 'b'; the map column must not participate in the ordering
    assert got == {1: "b", 2: "c"}


def test_stream_merge_no_seq_map_only_tie_is_deterministic(spark, tmp_path):
    """Round-10 ADVICE 1: two batch rows tied on every ORDERABLE non-key
    column but differing in a map must resolve to the SAME winner
    regardless of source row order — the md5 full-payload tiebreak covers
    the columns the sort order cannot."""
    import os

    from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
    from unicargo_medallion_data_pipeline_spark.streaming.writers import (
        write_stream_with_merge,
    )

    schema = "k int, day string, v string, props map<string,string>"
    rows = [
        (1, "d1", "a", {"m": "1"}),
        (1, "d1", "a", {"m": "2"}),  # tied on (day, v); differs only in map
    ]
    winners = set()
    for tag, order in (("fwd", rows), ("rev", list(reversed(rows)))):
        src = os.path.join(str(tmp_path), f"src_{tag}")
        spark.createDataFrame(order, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(src)
        target = os.path.join(str(tmp_path), f"tgt_{tag}")
        write_stream_with_merge(
            read_streaming_path(spark, src, schema=schema, file_format="json"),
            target_path=target,
            checkpoint=os.path.join(str(tmp_path), f"ckpt_{tag}"),
            merge_keys=["k"],
            partition_col="day",
        )
        got = spark.read.parquet(target).collect()
        assert len(got) == 1
        winners.add(got[0]["props"]["m"])
    assert len(winners) == 1
