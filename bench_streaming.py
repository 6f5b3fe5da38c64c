#!/usr/bin/env python
"""Streaming throughput anchors (r7 verdict task 6; scenarios extended
round 10 per r9 verdict task 7).

``bench.py`` anchors batch query latency and ``bench_medallion.py`` the
batch pipeline envelope; this anchors STREAMING throughput: an
``availableNow`` incremental-batch run over the sf0.1 events table
through the engine's three most scale-exposed streaming paths, with
per-micro-batch rate/latency captured by ``streaming/observe.py``:

* ``tumbling`` — watermarked tumbling-window aggregation
  (``streaming/windows.tumbling_window_agg``, batch-mirrored by the
  oracle-verified ``events_tumbling_5min``): the bread-and-butter
  shuffle-per-batch shape.
* ``sessionize`` — the custom stateful sessionizer
  (``streaming/stateful.sessionize_with_state``,
  ``applyInPandasWithState`` with event-time timeouts): Arrow-batched
  python state, the engine's heaviest per-row streaming path.
* ``cdc_apply`` — the exactly-once foreachBatch CDC sink
  (``streaming/writers.write_stream_cdc_apply``): per-batch winner
  reduction + one atomic base-pinned manifest commit, keyed by
  ``user_id`` (current state stays at user cardinality — the honest
  CDC shape, cost dominated by commit machinery, not data volume).

The events parquet ships as ONE file, which would collapse the run into
a single micro-batch and measure only startup; the harness re-lands it
as ``--files`` parquet files and streams with ``maxFilesPerTrigger`` so
the run exercises real multi-batch checkpointed progress.

Prints ONE JSON line:
  {"metric": "streaming_throughput", "scenarios": {name: {"rows": N,
   "value": wall_sec, "rows_per_sec": ..., "batches": n,
   "batch_ms": {...}}}, "calibration": {...}, "sf": ...}

Usage: python bench_streaming.py [--files 20] [--files-per-trigger 2]
                                 [--scenarios tumbling,sessionize,cdc_apply]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _measure(query, t0) -> dict:
    from unicargo_medallion_data_pipeline_spark.streaming.observe import capture_progress

    wall = time.perf_counter() - t0
    progress = [p for p in capture_progress(query) if p["num_input_rows"]]
    lat = [p["trigger_execution_ms"] for p in progress if p["trigger_execution_ms"]]
    total_in = sum(p["num_input_rows"] for p in progress)
    return {
        "rows": total_in,
        "value": round(wall, 2),
        "unit": "sec",
        "rows_per_sec": round(total_in / wall) if wall else None,
        "batches": len(progress),
        "batch_ms": {
            "mean": round(sum(lat) / len(lat)) if lat else None,
            "max": max(lat) if lat else None,
        },
    }


def run_tumbling(spark, src, schema, work, fpt) -> dict:
    from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
    from unicargo_medallion_data_pipeline_spark.streaming.windows import tumbling_window_agg
    from unicargo_medallion_data_pipeline_spark.streaming.writers import write_stream_to_path

    stream = read_streaming_path(
        spark, src, schema, options={"maxFilesPerTrigger": str(fpt)}
    )
    agg = tumbling_window_agg(stream)
    t0 = time.perf_counter()
    query = write_stream_to_path(
        agg,
        os.path.join(work, "tumbling_sink"),
        os.path.join(work, "tumbling_ckpt"),
        output_mode="append",
        trigger={"availableNow": True},
        file_format="parquet",
    )
    return _measure(query, t0)


def run_sessionize(spark, src, schema, work, fpt) -> dict:
    from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
    from unicargo_medallion_data_pipeline_spark.streaming.stateful import (
        sessionize_with_state,
    )
    from unicargo_medallion_data_pipeline_spark.streaming.writers import write_stream_to_path

    stream = read_streaming_path(
        spark, src, schema, options={"maxFilesPerTrigger": str(fpt)}
    )
    sessions = sessionize_with_state(stream, gap_seconds=1800)
    t0 = time.perf_counter()
    query = write_stream_to_path(
        sessions,
        os.path.join(work, "sess_sink"),
        os.path.join(work, "sess_ckpt"),
        output_mode="append",
        trigger={"availableNow": True},
        file_format="parquet",
    )
    return _measure(query, t0)


def run_cdc_apply(spark, src, schema, work, fpt) -> dict:
    from pyspark.sql import functions as F

    from unicargo_medallion_data_pipeline_spark.sources.acid import ManifestTable
    from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
    from unicargo_medallion_data_pipeline_spark.streaming.writers import (
        write_stream_cdc_apply,
    )

    target = ManifestTable(spark, os.path.join(work, "cdc_table"))
    # seed an empty current state with the change-row schema minus CDC
    # bookkeeping (op/_seq) — the shape apply_cdc_batch commits
    seed = (
        spark.read.schema(schema)
        .parquet(src)
        .limit(0)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )
    target.commit(seed, base_version=-1)
    stream = read_streaming_path(
        spark, src, schema, options={"maxFilesPerTrigger": str(fpt)}
    )
    changes = stream.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        F.lit("u").alias("op"),
        F.col("event_id").alias("_seq"),
    )
    t0 = time.perf_counter()
    query = write_stream_cdc_apply(
        changes,
        target,
        checkpoint=os.path.join(work, "cdc_ckpt"),
        key_cols=["user_id"],
        trigger={"availableNow": True},
    )
    out = _measure(query, t0)
    out["final_rows"] = target.count()  # metadata-only
    return out


SCENARIOS = {
    "tumbling": run_tumbling,
    "sessionize": run_sessionize,
    "cdc_apply": run_cdc_apply,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=20)
    ap.add_argument("--files-per-trigger", type=int, default=2)
    ap.add_argument("--scenarios", default="tumbling,sessionize,cdc_apply")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import steady_single
    from unicargo_medallion_data_pipeline_spark.session import get_spark
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

    spark = get_spark("bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        src = os.path.join(work, "source")
        events = load_table(spark, sf_dir, "events")
        n_rows = events.count()
        events.repartition(args.files).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema

        # each scenario is a single-shot throughput run — the shared
        # steady_single policy re-runs it on a quieter window if the
        # bracketing probes breach the bar (r11 verdict item 6)
        out = {}
        cals = {}
        for name in args.scenarios.split(","):
            # fresh checkpoint/output dir PER ATTEMPT: scenarios are
            # checkpointed streams, so re-running one against an existing
            # checkpoint would see all input already processed (0 rows)
            payload, cal = steady_single(
                lambda name=name: SCENARIOS[name](
                    spark, src, schema,
                    tempfile.mkdtemp(prefix=f"{name}_", dir=work),
                    args.files_per_trigger,
                )
            )
            out[name] = payload
            cals[name] = cal

        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        try:
            sf_val = float(sf)
        except ValueError:
            sf_val = sf
        print(
            json.dumps(
                {
                    "metric": "streaming_throughput",
                    "scenarios": out,
                    "source_rows": n_rows,
                    "calibration": cals,
                    "sf": sf_val,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
