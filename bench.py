#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion (count() action) after a warm-up of
the session; per-query wall time includes plan + execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG
    from unicargo_medallion_data_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {n: q for n, q in CATALOG.items() if q.bench}
    # Warm up the JVM + parquet footer caches with a trivial action.
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()

    # Best-of-N per query: the harness VM shows intermittent CPU-steal
    # stalls (observed 50-160s, occasionally minutes); the minimum is the
    # faithful measure of the plan.  Attempts are INTERLEAVED round-robin
    # (all queries once, then again) so a sustained stall cannot swallow
    # every attempt of one query; a third round runs only for queries
    # whose first two attempts disagree wildly.
    runs: dict[str, list[float]] = {name: [] for name in bench_queries}
    for rnd in range(3):
        for name, q in bench_queries.items():
            r = runs[name]
            if rnd == 2 and len(r) == 2 and max(r) <= 3 * min(r):
                continue
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).count()
            r.append(time.perf_counter() - t0)
    timings = {name: round(min(r), 3) for name, r in runs.items()}

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
