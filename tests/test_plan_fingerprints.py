"""Plan-fingerprint regression net (r8 verdict task 1).

Regenerates the plan census for ALL catalog queries at sf0.001 and
asserts equality with the committed snapshot
(``fixtures/plan_fingerprints.json``).  A lost broadcast, a new
Exchange, or a surprise CartesianProduct anywhere in the 203-query
catalog fails here — no hand re-audit needed.

Intentional changes: run
``python -m unicargo_medallion_data_pipeline_spark.plans.fingerprints --update``
after adding the changed query names to ``_FORCE_WINDOW`` in
``__spark_entry__.py`` (the updater enforces this, so every changed
plan is driver re-verified against the DuckDB oracle the same round).
"""

from __future__ import annotations

import json
import os

import pytest

from unicargo_medallion_data_pipeline_spark.plans import fingerprints as fp
from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

SF_SMOKE = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="driver testdata not present"
)


def test_snapshot_covers_whole_catalog():
    from unicargo_medallion_data_pipeline_spark.plans.universes import UNIVERSE_PLANS

    snap = fp.load_snapshot()
    expected = set(CATALOG) | set(UNIVERSE_PLANS)
    assert set(snap) == expected, (
        "snapshot out of sync with catalog; regenerate with --update "
        f"(missing={sorted(expected - set(snap))}, "
        f"stale={sorted(set(snap) - expected)})"
    )


def test_universe_builders_scan_their_sources():
    """r11 ADVICE item 3: the pinned universes render as Scan
    ExistingRDD in every consumer plan, so the SOURCE-read invariant
    lives in the pseudo-entries — each un-pinned builder plan must scan
    its parquet source exactly once."""
    snap = fp.load_snapshot()
    assert snap["__universe_docs_with_text"]["scans"] == 1
    assert snap["__universe_embeddings_valid"]["scans"] == 1


def test_all_plan_fingerprints_match_snapshot(spark):
    snap = fp.load_snapshot()
    new = fp.compute_fingerprints(spark, SF_SMOKE)
    changed = fp.diff_fingerprints(snap, new)
    assert not changed, (
        f"{len(changed)} plan fingerprint(s) drifted — if intentional, add the "
        "names to _FORCE_WINDOW in __spark_entry__.py and rerun the updater "
        "(python -m unicargo_medallion_data_pipeline_spark.plans.fingerprints "
        f"--update): {json.dumps(changed, indent=1)}"
    )


def test_no_cartesian_products_anywhere():
    """Catalog-wide scale invariant: zero CartesianProduct nodes."""
    snap = fp.load_snapshot()
    offenders = {n: c for n, c in snap.items() if c["cartesian_products"]}
    assert not offenders


def test_updater_refuses_unforced_plan_changes(monkeypatch, tmp_path):
    """The two-key turn: an updated snapshot with changed plans must name
    those queries in _FORCE_WINDOW, else the updater aborts."""
    old = {"q_changed": {"keyed_exchanges": 1}, "q_same": {"keyed_exchanges": 2}}
    new = {"q_changed": {"keyed_exchanges": 3}, "q_same": {"keyed_exchanges": 2}}
    snap_path = tmp_path / "snap.json"
    snap_path.write_text(json.dumps(old))
    monkeypatch.setattr(fp, "SNAPSHOT_PATH", str(snap_path))
    monkeypatch.setattr(fp, "compute_fingerprints", lambda spark, sf_dir: new)

    monkeypatch.setattr(fp, "_force_window_names", lambda: [])
    with pytest.raises(SystemExit, match="q_changed"):
        fp.update_snapshot(spark=None)
    assert json.loads(snap_path.read_text()) == old  # refused → untouched

    monkeypatch.setattr(fp, "_force_window_names", lambda: ["q_changed"])
    changed = fp.update_snapshot(spark=None)
    assert set(changed) == {"q_changed"}
    assert json.loads(snap_path.read_text()) == new


def test_updater_refuses_unforced_result_changes(monkeypatch, tmp_path):
    """r13 verdict task 1: a changed RESULT hash with an identical plan
    shape must be refused exactly like a shape change — the twin of
    test_updater_refuses_unforced_plan_changes for the shape-blind gap
    (same-plan semantics edits: changed thresholds/literals)."""
    old = {"q_sem": {"keyed_exchanges": 1, "result_hash": "aaaa"}}
    new = {"q_sem": {"keyed_exchanges": 1, "result_hash": "bbbb"}}
    snap_path = tmp_path / "snap.json"
    snap_path.write_text(json.dumps(old))
    monkeypatch.setattr(fp, "SNAPSHOT_PATH", str(snap_path))
    monkeypatch.setattr(fp, "compute_fingerprints", lambda spark, sf_dir: new)

    monkeypatch.setattr(fp, "_force_window_names", lambda: [])
    with pytest.raises(SystemExit, match="q_sem"):
        fp.update_snapshot(spark=None)
    assert json.loads(snap_path.read_text()) == old  # refused → untouched

    monkeypatch.setattr(fp, "_force_window_names", lambda: ["q_sem"])
    changed = fp.update_snapshot(spark=None)
    assert set(changed) == {"q_sem"}
    assert json.loads(snap_path.read_text()) == new


def test_snapshot_result_hashes_all_present():
    """Every committed fingerprint carries a 64-hex result hash — the
    semantics side of the net covers the whole catalog, not a sample."""
    snap = fp.load_snapshot()
    bad = {
        n: c.get("result_hash")
        for n, c in snap.items()
        if not (isinstance(c.get("result_hash"), str) and len(c["result_hash"]) == 64)
    }
    assert not bad


def test_result_hash_canonicalizes_order_and_maps(spark):
    """The hash is a pure function of the VALUES: row order, column
    order, and map-key iteration order must not move it."""
    from unicargo_medallion_data_pipeline_spark.oracle import result_hash

    df = spark.createDataFrame(
        [(1, "a", {"x": 1, "y": 2}), (2, "b", {"y": 2, "x": 1})],
        "id int, s string, m map<string,int>",
    )
    rows = df.collect()
    h1 = result_hash(df.columns, rows)
    h2 = result_hash(list(reversed(df.columns)), list(reversed(rows)))
    assert h1 == h2
    h3 = result_hash(df.columns, rows[:1])
    assert h3 != h1


def test_result_hash_refuses_duplicate_column_names():
    """r14 ADVICE item 4: a post-join result carrying two columns with
    the same name must fail LOUDLY, not hash one copy twice into a
    misleading pass."""
    from unicargo_medallion_data_pipeline_spark.oracle import result_hash

    with pytest.raises(ValueError, match="duplicate column"):
        result_hash(["k", "k", "v"], [])


def test_force_window_parser_reads_entry_file():
    names = fp._force_window_names()
    assert isinstance(names, list)
    # every forced name must be a real catalog query
    assert all(n in CATALOG for n in names)


def test_executed_codegen_spans_metric_is_live(spark):
    """Round-10 verdict task 1: the codegen census must read the
    EXECUTED plan (formatted AQE plans carry no codegen annotations, so
    the old compile-time field recorded 0 for all 203 queries forever).
    A trivial aggregate has at least one whole-stage-codegen span."""
    from pyspark.sql import functions as F

    from unicargo_medallion_data_pipeline_spark.plans.inspect import (
        executed_codegen_spans,
        plan_census,
    )

    df = spark.range(1000).groupBy((F.col("id") % 3).alias("k")).count()
    assert executed_codegen_spans(df) >= 1
    # and the dead compile-time field is gone from the static census
    assert "whole_stage_codegen_spans" not in plan_census(df)


def test_snapshot_codegen_spans_all_live():
    """Every committed fingerprint records ≥1 executed codegen span —
    the catalog-wide proof the metric is measuring something real."""
    snap = fp.load_snapshot()
    dead = {n: c for n, c in snap.items() if c.get("executed_codegen_spans", 0) < 1}
    assert not dead
