#!/usr/bin/env python
"""Core-count scaling evidence at 10x data (r15 verdict task 1).

At sf0.1 every bench query is 0.2-3s and planning/scheduler-bound, so
8-vs-32-core wall ratios are ≈1 and prove nothing about parallelism —
the driver's `suspect_cpus_ignored` flag cannot be answered at that
scale.  This harness builds the structure-preserving 10x replication
(bench_scale.build_scaled — the same machinery as the committed
SCALE10X artifacts), then times a DATA-BOUND query subset in two fresh
subprocesses, one with SPARK_GRAFT_CPUS=<high> and one with
SPARK_GRAFT_CPUS=<low>, through the shared steady-by-construction
policy (tools_qbench.py).  Each subprocess emits its own sc.master and
sc.defaultParallelism, so the artifact is self-proving: the knob is
honored, and compute-bound queries show a real core ratio.

Prints ONE JSON line; commit as docs/CORE_SCALING_r16.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

#: Data-bound subset: 10x exponents near 1 in the committed SCALE10X
#: artifacts (scan/shuffle volume dominates), so core count has real
#: work to parallelize.  Overhead-bound queries (exponents ~0.2-0.4)
#: are deliberately excluded — their flat core ratio is the documented
#: floor, not evidence of serial plans.
QUERIES = [
    "pricing_summary",
    "doc_duplicate_ngram_rate",
    "doc_minhash_near_dups",
    "doc_inverted_index",
    "top_trade_routes",
    "doc_simhash_clusters",
]


def _run_qbench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools_qbench.py"), *QUERIES],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--high", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--low", type=int, default=8)
    args = ap.parse_args()

    import bench_scale
    from unicargo_medallion_data_pipeline_spark.session import get_spark

    bench_scale.REPLICAS = args.replicas
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    work = tempfile.mkdtemp(prefix="core_scaling_")
    try:
        scaled = os.path.join(work, f"sf{args.replicas}x")
        spark = get_spark("core-scaling-build")
        spark.sparkContext.setLogLevel("ERROR")
        bench_scale.build_scaled(spark, sf01, scaled)
        spark.stop()

        runs = {}
        for cpus in (args.high, args.low):
            runs[str(cpus)] = _run_qbench(cpus, scaled)

        hi, lo = runs[str(args.high)], runs[str(args.low)]
        per_query = {
            n: {
                f"c{args.high}_sec": hi["queries"][n],
                f"c{args.low}_sec": lo["queries"][n],
                # >1 = more cores were faster; the core ratio bound is
                # high/low (perfect scaling), the floor ≈1 (overhead).
                "speedup_low_to_high": round(
                    lo["queries"][n] / hi["queries"][n], 2
                )
                if hi["queries"][n]
                else None,
            }
            for n in QUERIES
        }
        print(
            json.dumps(
                {
                    "metric": "core_scaling_10x",
                    "replicas": args.replicas,
                    "cpus_high": args.high,
                    "cpus_low": args.low,
                    "queries": per_query,
                    "calibration": {
                        f"c{args.high}": hi["calibration"],
                        f"c{args.low}": lo["calibration"],
                    },
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
