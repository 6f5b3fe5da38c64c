#!/usr/bin/env python
"""Catalog robustness sweep over degenerate and adversarial datasets.

The driver's gate proves every catalog query correct on well-behaved
testdata.  This sweep re-runs the FULL catalog — same driver-parity
comparison (``oracle.run_all``) — over datasets the testdata never
contains but 100 TB of production data certainly does:

  * ``empty``    — every table present with its real schema, zero rows
                   (the matched-nothing partition / filter case)
  * ``edge:<s>`` — seeded adversarial mutations of the real testdata:
                   NULLs in any column INCLUDING join keys, empty and
                   unicode and multi-line strings, duplicate rows, zero
                   measures (div-by-zero exposure), massed ties (top-k
                   determinism), empty arrays (zero-norm embeddings),
                   boundary dates, shuffled row order

Both engines read the same parquet, so every mismatch is a genuine
cross-engine semantic divergence and every raise is a robustness
defect.  Prints one JSON line:
{"metric": "robustness_sweep", "datasets": {name: {"pass": n, "fail": n,
 "failures": {...}}}, "all_pass": bool}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Pin the process zone before the JVM exists (oracle.main rationale).
os.environ["TZ"] = "UTC"
try:
    import time as _time

    _time.tzset()
except AttributeError:  # pragma: no cover
    pass


def flight_query_names() -> list[str]:
    """Catalog queries sourced from the flights fixture (the family the
    main sweep's testdata mutations can never reach)."""
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    return [n for n, e in CATALOG.items() if e.fn.__module__.endswith(".flights_gold")]


def sweep_flights(seeds: list[str], skip_empty: bool, keep: bool) -> int:
    """Run the flight-domain family against empty + mutated FIXTURES.

    The fixture dir is baked into both the Spark loaders and the DuckDB
    oracle SQL at plans-import time, so each hostile dataset runs in a
    SUBPROCESS with SPARK_GRAFT_FLIGHTS_FIXTURE_DIR pointing at the
    generated twin (r11 verdict item 4: the flight queries never saw
    hostile data because datagen mutated only TESTDATA_TABLES)."""
    import subprocess

    from unicargo_medallion_data_pipeline_spark.sources.flights_fixture import (
        FIXTURE_DIR,
        FIXTURE_DIR_ENV,
        ensure_flights_fixture,
    )
    from unicargo_medallion_data_pipeline_spark.testing.datagen import (
        FLIGHTS_FIXTURE_TABLES,
        write_empty_dataset,
        write_mutated_dataset,
    )

    ensure_flights_fixture()  # guarantee the committed source files
    names = flight_query_names()
    work = tempfile.mkdtemp(prefix="umdp_flights_robustness_")
    datasets: list[tuple[str, str]] = []
    if not skip_empty:
        d = os.path.join(work, "empty")
        write_empty_dataset(FIXTURE_DIR, d, tables=FLIGHTS_FIXTURE_TABLES)
        datasets.append(("fixture-empty", d))
    for seed in seeds:
        d = os.path.join(work, f"edge_{seed}")
        write_mutated_dataset(
            FIXTURE_DIR, d, seed=seed, tables=FLIGHTS_FIXTURE_TABLES
        )
        datasets.append((f"fixture-edge:{seed}", d))

    report: dict[str, dict] = {}
    ok_all = True
    for dname, ddir in datasets:
        env = dict(os.environ, **{FIXTURE_DIR_ENV: ddir})
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--skip-empty", "--seeds", "", "--raw", "--names", *names],
            env=env, capture_output=True, text=True,
        )
        try:
            sub = json.loads(proc.stdout.strip().splitlines()[-1])
            report[dname] = sub["datasets"]["raw"]
        except (ValueError, KeyError, IndexError):
            ok_all = False
            report[dname] = {
                "pass": 0, "fail": len(names),
                "failures": {"__subprocess__": proc.stderr[-2000:]},
            }
            continue
        ok_all = ok_all and not report[dname]["failures"]
        for qname, detail in report[dname]["failures"].items():
            print(f"[FAIL {dname}] {qname}: {detail}", file=sys.stderr)
        print(f"[{dname}] {report[dname]['pass']}/{len(names)} pass", file=sys.stderr)
    if not keep:
        shutil.rmtree(work, ignore_errors=True)
    else:
        print(f"datasets kept under {work}", file=sys.stderr)
    print(json.dumps({"metric": "robustness_sweep_flights",
                      "datasets": report, "all_pass": ok_all}))
    return 0 if ok_all else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--seeds", default="r11a,r11b", help="comma-separated edge-dataset seeds")
    ap.add_argument("--skip-empty", action="store_true")
    ap.add_argument("--names", nargs="*", help="restrict to these catalog queries")
    ap.add_argument("--keep", action="store_true", help="keep generated datasets on disk")
    ap.add_argument("--raw", action="store_true",
                    help="also run against --src unmutated (used by the "
                         "flights mode's subprocesses, whose hostility "
                         "lives in the redirected fixture dir)")
    ap.add_argument("--flights-seeds", default=None,
                    help="run the flight-fixture family sweep with these "
                         "seeds instead of the testdata sweep")
    args = ap.parse_args()

    if args.flights_seeds is not None:
        return sweep_flights(
            [s for s in args.flights_seeds.split(",") if s],
            args.skip_empty, args.keep,
        )

    from unicargo_medallion_data_pipeline_spark.oracle import run_all
    from unicargo_medallion_data_pipeline_spark.session import get_spark
    from unicargo_medallion_data_pipeline_spark.testing.datagen import (
        write_empty_dataset,
        write_mutated_dataset,
    )

    work = tempfile.mkdtemp(prefix="umdp_robustness_")
    datasets: list[tuple[str, str]] = []
    if not args.skip_empty:
        d = os.path.join(work, "empty")
        write_empty_dataset(args.src, d)
        datasets.append(("empty", d))
    for seed in [s for s in args.seeds.split(",") if s]:
        d = os.path.join(work, f"edge_{seed}")
        write_mutated_dataset(args.src, d, seed=seed)
        datasets.append((f"edge:{seed}", d))
    if args.raw:
        datasets.append(("raw", args.src))

    spark = get_spark("robustness-sweep")
    report: dict[str, dict] = {}
    ok_all = True
    for dname, ddir in datasets:
        results = run_all(spark, ddir, args.names or None)
        failures = {r.name: r.detail for r in results if not r.ok}
        ok_all = ok_all and not failures
        report[dname] = {
            "pass": sum(r.ok for r in results),
            "fail": len(failures),
            "failures": failures,
        }
        for qname, detail in failures.items():
            print(f"[FAIL {dname}] {qname}: {detail}", file=sys.stderr)
        print(
            f"[{dname}] {report[dname]['pass']}/{len(results)} pass",
            file=sys.stderr,
        )
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    else:
        print(f"datasets kept under {work}", file=sys.stderr)
    print(json.dumps({"metric": "robustness_sweep", "src": args.src,
                      "datasets": report, "all_pass": ok_all}))
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
