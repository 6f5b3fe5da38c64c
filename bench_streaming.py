#!/usr/bin/env python
"""Streaming throughput anchor (r7 verdict task 6).

``bench.py`` anchors batch query latency and ``bench_medallion.py`` the
batch pipeline envelope; this anchors STREAMING throughput: an
``availableNow`` incremental-batch run over the sf0.1 events table
through the engine's bread-and-butter streaming shape — watermarked
tumbling-window aggregation (``streaming/windows.tumbling_window_agg``,
batch-mirrored by the oracle-verified ``events_tumbling_5min``) — with
per-micro-batch rate/latency captured by ``streaming/observe.py``.

The events parquet ships as ONE file, which would collapse the run into
a single micro-batch and measure only startup; the harness re-lands it
as ``--files`` parquet files and streams with ``maxFilesPerTrigger`` so
the run exercises real multi-batch checkpointed progress.

Prints ONE JSON line:
  {"metric": "streaming_backfill", "rows": N, "value": wall_sec,
   "unit": "sec", "rows_per_sec": ..., "batches": n,
   "batch_ms": {"mean": ..., "max": ...}, "sf": ...}

Usage: python bench_streaming.py [--files 20] [--files-per-trigger 2]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=20)
    ap.add_argument("--files-per-trigger", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from unicargo_medallion_data_pipeline_spark.session import get_spark
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
    from unicargo_medallion_data_pipeline_spark.streaming.observe import capture_progress
    from unicargo_medallion_data_pipeline_spark.streaming.readers import read_streaming_path
    from unicargo_medallion_data_pipeline_spark.streaming.windows import tumbling_window_agg
    from unicargo_medallion_data_pipeline_spark.streaming.writers import write_stream_to_path

    spark = get_spark("bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        src = os.path.join(work, "source")
        events = load_table(spark, sf_dir, "events")
        n_rows = events.count()
        events.repartition(args.files).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema

        stream = read_streaming_path(
            spark,
            src,
            schema,
            options={"maxFilesPerTrigger": str(args.files_per_trigger)},
        )
        agg = tumbling_window_agg(stream)

        t0 = time.perf_counter()
        query = write_stream_to_path(
            agg,
            os.path.join(work, "sink"),
            os.path.join(work, "ckpt"),
            output_mode="append",
            trigger={"availableNow": True},
            file_format="parquet",
        )
        wall = time.perf_counter() - t0

        progress = [p for p in capture_progress(query) if p["num_input_rows"]]
        lat = [p["trigger_execution_ms"] for p in progress if p["trigger_execution_ms"]]
        total_in = sum(p["num_input_rows"] for p in progress)
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        try:
            sf_val = float(sf)
        except ValueError:
            sf_val = sf
        print(
            json.dumps(
                {
                    "metric": "streaming_backfill",
                    "rows": total_in,
                    "value": round(wall, 2),
                    "unit": "sec",
                    "rows_per_sec": round(total_in / wall) if wall else None,
                    "batches": len(progress),
                    "batch_ms": {
                        "mean": round(sum(lat) / len(lat)) if lat else None,
                        "max": max(lat) if lat else None,
                    },
                    "source_rows": n_rows,
                    "sf": sf_val,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
