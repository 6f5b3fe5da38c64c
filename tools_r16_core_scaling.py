#!/usr/bin/env python
"""Core-count scaling evidence at 10x data (r15 verdict task 1).

At sf0.1 every bench query is 0.2-3s and planning/scheduler-bound, so
8-vs-32-core wall ratios are ≈1 and prove nothing about parallelism —
the driver's `suspect_cpus_ignored` flag cannot be answered at that
scale.  This harness builds the structure-preserving 10x replication
(bench_scale.build_scaled — the same machinery as the committed
SCALE10X artifacts), then times a DATA-BOUND query subset under the
two core counts in INTERLEAVED single-round subprocesses
(c_high, c_low, c_high, c_low, ...), so a host-noise window hits both
sides equally instead of poisoning one whole run (this VM's CPU-steal
stalls make two back-to-back full runs incomparable — observed 0.65x
"speedups" on scan-bound queries from exactly that).  Per (query,
cpus) the reported second is the min over rounds; every round carries
its own bracketing CPU probes, and every subprocess reports its
sc.master / sc.defaultParallelism, so the artifact is self-proving:
the knob is honored, and compute-bound queries show a real core ratio.

Prints ONE JSON line; commit as docs/CORE_SCALING_r16.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

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


def _parallel_floor(spark) -> float:
    """Direct parallelism proof, independent of any query's shuffle/
    scheduling profile: 64 identical CPU-heavy tasks (a per-row md5
    fold, ~0.3s each, zero shuffle, zero input).  Perfect scaling gives
    wall ≈ ceil(64/cores) × task_sec, so the 8-vs-32-core wall ratio of
    THIS job approaches the core ratio — the unambiguous "local[N] uses
    N cores" evidence wall ratios of partially compute-bound queries
    cannot provide."""
    from pyspark.sql import functions as F

    df = (
        spark.range(64)
        .repartition(64)
        .select(
            F.expr(
                "aggregate(sequence(1, 400000), cast(id as string), "
                "(acc, x) -> md5(acc))"
            ).alias("h")
        )
    )
    spark.sparkContext.setJobDescription("core-scaling: parallel floor")
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _child(sf_dir: str) -> None:
    """One interleaved round: a single attempt per query, probes
    bracketing the round, environment echoed back."""
    from bench import _cpu_probe
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG
    from unicargo_medallion_data_pipeline_spark.session import get_spark

    spark = get_spark("core-scaling-round")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
    probes = [_cpu_probe()]
    _parallel_floor(spark)  # warm-up: pay the codegen compile once
    times: dict[str, float] = {"__parallel_floor__": _parallel_floor(spark)}
    for name in QUERIES:
        spark.sparkContext.setJobDescription(f"core-scaling: {name}")
        t0 = time.perf_counter()
        CATALOG[name].fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)
    probes.append(_cpu_probe())
    sc = spark.sparkContext
    print(json.dumps({
        "queries": times,
        "probes": [round(p, 3) for p in probes],
        "master": sc.master,
        "default_parallelism": sc.defaultParallelism,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
    }))


def _run_round(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    out = subprocess.run(
        [sys.executable, __file__, "--child", sf_dir],
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
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--child", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        _child(args.child)
        return

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

        rounds: dict[str, list[dict]] = {str(args.high): [], str(args.low): []}
        for _ in range(args.rounds):
            for cpus in (args.high, args.low):
                rounds[str(cpus)].append(_run_round(cpus, scaled))

        def best(cpus: int, name: str) -> float:
            return min(r["queries"][name] for r in rounds[str(cpus)])

        per_query = {
            n: {
                f"c{args.high}_sec": best(args.high, n),
                f"c{args.low}_sec": best(args.low, n),
                # >1 = more cores were faster; the bound is high/low
                # (perfect scaling), the floor ≈1 (overhead-bound).
                "speedup_low_to_high": round(
                    best(args.low, n) / best(args.high, n), 2
                ),
            }
            for n in ["__parallel_floor__", *QUERIES]
        }
        env_rows = {
            str(cpus): {
                "master": rounds[str(cpus)][0]["master"],
                "default_parallelism": rounds[str(cpus)][0]["default_parallelism"],
                "shuffle_partitions": rounds[str(cpus)][0]["shuffle_partitions"],
                "probes_per_round": [r["probes"] for r in rounds[str(cpus)]],
            }
            for cpus in (args.high, args.low)
        }
        print(
            json.dumps(
                {
                    "metric": "core_scaling_10x",
                    "replicas": args.replicas,
                    "cpus_high": args.high,
                    "cpus_low": args.low,
                    "rounds": args.rounds,
                    "interleaved": True,
                    "queries": per_query,
                    "env": env_rows,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
