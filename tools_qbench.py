#!/usr/bin/env python
"""Targeted steady-timing harness: measure a subset of bench queries with
the SAME interleaved best-of-N + probe-calibration policy bench.py uses.

Usage: python tools_qbench.py q1 [q2 ...]   (prints one JSON line)
"""
from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from bench import steady_time_queries  # noqa: E402
from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG  # noqa: E402
from unicargo_medallion_data_pipeline_spark.session import get_spark  # noqa: E402

names = sys.argv[1:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("qbench")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()


def _attempt(name: str) -> float:
    spark.sparkContext.setJobDescription(f"qbench: {name}")
    t0 = time.perf_counter()
    CATALOG[name].fn(spark, sf_dir).count()
    return time.perf_counter() - t0


timings, calibration = steady_time_queries(names, _attempt)
sc = spark.sparkContext
calibration["master"] = sc.master
calibration["default_parallelism"] = sc.defaultParallelism
calibration["shuffle_partitions"] = spark.conf.get("spark.sql.shuffle.partitions")
print(json.dumps({"queries": timings, "calibration": calibration}))
