"""Plan-fingerprint regression net over the whole query catalog.

The engine's 100×-scale argument rests on plan SHAPES (broadcasts kept,
no surprise Exchange, no Cartesian blow-up) — but only ~40 of the 203
catalog queries had hand-written plan-shape tests.  This module freezes
a mechanical fingerprint for EVERY catalog query: the
:func:`unicargo_medallion_data_pipeline_spark.plans.inspect.plan_census`
counts (keyed exchanges, broadcast exchanges, cartesian products,
broadcast-nested-loop joins, source scans, window execs, top-k,
codegen spans) computed at a fixed scale factor, PLUS the sf0.001
``result_hash`` (order-insensitive sha256 over the collected values —
same canonical form as the driver's value hash), committed to
``fixtures/plan_fingerprints.json``.  The result hash closes the
shape-blind gap: a semantics-only edit that preserves plan shape (a
changed literal/threshold) still moves the hash, so it cannot dodge
the forced-reverification gate (r13 verdict task 1).

``tests/test_plan_fingerprints.py`` regenerates the census for all
queries each run and asserts equality with the committed snapshot, so a
lost broadcast, an extra shuffle, or a new Cartesian product anywhere in
the catalog trips a gate instead of surviving until someone re-audits
plans by hand.

Intentional plan changes are a two-key turn:

1. ``python -m unicargo_medallion_data_pipeline_spark.plans.fingerprints --update``
   rewrites the snapshot, and
2. the updater REFUSES unless every changed query name is listed in
   ``_FORCE_WINDOW`` in ``__spark_entry__.py`` — which pushes those
   queries to the head of the driver's verification window, so any
   query whose plan changed is re-verified against the DuckDB oracle
   the same round.

Fingerprints are computed at sf0.001 (smoke scale): plan shape there is
a pure function of the code + the fixed testdata layout, so the
snapshot is deterministic.  Size-dependent runtime decisions (AQE
re-plans, stats-based broadcast demotion at larger SFs) are out of
scope here — those are covered by the bench and ``docs/SCALE.md``.

Reference parity note: the reference repo has no analogous gate (its
notebooks re-read plans manually); this net is engine infrastructure,
not a ported feature.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT_PATH = os.path.join(_REPO, "fixtures", "plan_fingerprints.json")
DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def compute_fingerprints(spark, sf_dir: str = DEFAULT_SF_DIR, names=None) -> dict:
    """name → plan_census dict for each catalog query (sorted by name).

    The compile-time census (exchanges/joins/scans) comes from
    ``explain("formatted")``; ``executed_codegen_spans`` additionally
    EXECUTES each query at the smoke SF and counts whole-stage-codegen
    spans in the final AQE plan — the formatted plan never shows them
    (round-10 verdict task 1), so a codegen regression (an expression
    silently falling into interpreted eval) is only visible here.
    Execution at sf0.001 is the same work the oracle sweep does.
    """
    from unicargo_medallion_data_pipeline_spark.oracle import result_hash
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG
    from unicargo_medallion_data_pipeline_spark.plans.inspect import (
        collect_with_codegen_spans,
        plan_census,
    )
    from unicargo_medallion_data_pipeline_spark.plans.universes import UNIVERSE_PLANS

    # The pinned universes render as Scan ExistingRDD in every consumer
    # plan, which would leave their SOURCE scans un-asserted; fingerprint
    # the un-pinned builder plans as pseudo-queries alongside the catalog.
    fns = dict(CATALOG.items()) if names is None else {n: CATALOG[n] for n in names}
    builders = {n: fn for n, fn in UNIVERSE_PLANS.items() if names is None or n in names}

    def _fingerprint(df) -> dict:
        census = plan_census(df)
        rows, spans = collect_with_codegen_spans(df)
        census["executed_codegen_spans"] = spans
        # The RESULT hash closes the shape-blind gap (r13 verdict task
        # 1): a same-shape semantics edit (changed threshold/literal)
        # leaves every census count intact but moves this field, so the
        # updater's _FORCE_WINDOW refusal applies to it too.  The hash
        # is order-insensitive and deterministic across session configs
        # because every catalog query is engineered for exact (DuckDB-
        # bit-equal) values — partition-order-dependent float sums
        # would already fail the oracle gate.
        census["result_hash"] = result_hash(df.columns, rows)
        return census

    out: dict[str, dict] = {}
    for name in sorted(fns):
        out[name] = _fingerprint(fns[name].fn(spark, sf_dir))
    for name in sorted(builders):
        out[name] = _fingerprint(builders[name](spark, sf_dir))
    return out


def load_snapshot(path: str | None = None) -> dict:
    # Resolve the module global at CALL time so tests can repoint it.
    with open(path if path is not None else SNAPSHOT_PATH) as fh:
        return json.load(fh)


def diff_fingerprints(old: dict, new: dict) -> dict:
    """name → {"old": ..., "new": ...} for every added/removed/changed
    query (machine-friendly; either side is None when absent)."""
    out = {}
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o != n:
            out[name] = {"old": o, "new": n}
    return out


def _force_window_names() -> list[str]:
    """Parse ``_FORCE_WINDOW`` from ``__spark_entry__.py`` textually
    (importing it would work too, but the updater must see the
    working-tree file exactly as committed)."""
    entry = os.path.join(_REPO, "__spark_entry__.py")
    with open(entry) as fh:
        src = fh.read()
    m = re.search(r"_FORCE_WINDOW\s*:\s*dict\[str,\s*int\]\s*=\s*\{(.*?)\}", src, re.S)
    if not m:
        raise RuntimeError("_FORCE_WINDOW not found in __spark_entry__.py")
    return re.findall(r"[\"']([^\"']+)[\"']", m.group(1))


def update_snapshot(spark, sf_dir: str = DEFAULT_SF_DIR, force: bool = False) -> dict:
    """Regenerate the snapshot; refuse if changed queries aren't in
    ``_FORCE_WINDOW`` (unless ``force`` — first generation only)."""
    new = compute_fingerprints(spark, sf_dir)
    old = load_snapshot() if os.path.exists(SNAPSHOT_PATH) else {}
    changed = diff_fingerprints(old, new)
    # Newly-registered queries don't need _FORCE_WINDOW (the derived
    # rotation already puts never-verified queries at the window head).
    # Nor does a pure METRIC-SCHEMA change (a census field added or
    # retired, values equal on every shared field): the plans themselves
    # did not move, so there is nothing for the driver to re-verify.
    # "__universe_*" pseudo-queries are not driver queries — a changed
    # universe plan is re-verified transitively through every consumer
    # query (which the updater DOES require in _FORCE_WINDOW).
    plan_changed = [
        n
        for n, d in changed.items()
        if not n.startswith("__universe_")
        and d["old"] is not None
        and d["new"] is not None
        and any(d["old"][k] != d["new"][k] for k in set(d["old"]) & set(d["new"]))
    ]
    if plan_changed and not force:
        missing = [n for n in plan_changed if n not in _force_window_names()]
        if missing:
            raise SystemExit(
                "plan fingerprints changed for queries not in _FORCE_WINDOW "
                f"(add them to __spark_entry__.py so the driver re-verifies): {missing}"
            )
    os.makedirs(os.path.dirname(SNAPSHOT_PATH), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(SNAPSHOT_PATH), suffix=".json")
    with os.fdopen(fd, "w") as fh:
        json.dump(new, fh, indent=1, sort_keys=True)
        fh.write("\n")
    os.replace(tmp, SNAPSHOT_PATH)
    return changed


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--update", action="store_true", help="rewrite the committed snapshot")
    ap.add_argument("--force", action="store_true", help="skip the _FORCE_WINDOW check")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    args = ap.parse_args(argv)

    from unicargo_medallion_data_pipeline_spark.session import get_spark

    warehouse = tempfile.mkdtemp(prefix="fp_warehouse_")
    spark = get_spark(
        "plan-fingerprints",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.update:
        changed = update_snapshot(spark, args.sf_dir, force=args.force)
        print(f"snapshot written: {len(changed)} entr{'y' if len(changed) == 1 else 'ies'} changed")
        for name, d in changed.items():
            print(f"  {name}: {d['old']} -> {d['new']}")
        return 0
    new = compute_fingerprints(spark, args.sf_dir)
    changed = diff_fingerprints(load_snapshot(), new)
    if changed:
        print(f"MISMATCH in {len(changed)} queries:")
        for name, d in changed.items():
            print(f"  {name}: {d['old']} -> {d['new']}")
        return 1
    print(f"all {len(new)} fingerprints match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
