#!/usr/bin/env python
"""Dump explain("formatted") for every bench-headline query into
plans/r16/<query>_<suffix>.txt (round-15 optimization evidence).

Usage: python tools_r16_dump_plans.py before|after [names...]
"""
from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
only = set(sys.argv[2:])

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.join(_REPO, "plans", "r16")
os.makedirs(out_dir, exist_ok=True)

from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG
from unicargo_medallion_data_pipeline_spark.session import get_spark

spark = get_spark("plan-dump-r16")
spark.sparkContext.setLogLevel("ERROR")

for name, q in CATALOG.items():
    if not q.bench:
        continue
    if only and name not in only:
        continue
    spark.sparkContext.setJobDescription(f"plan-dump: {name}")
    try:
        df = q.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as e:  # noqa: BLE001
        plan = f"ERROR building plan: {e}"
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(plan)
    print(name, "->", f"{name}_{suffix}.txt")
print("done")
