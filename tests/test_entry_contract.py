"""Driver-contract ordering guards.

The external driver oracle-verifies only the FIRST 50 entries of
``queries()`` in iteration order (verified against CORRECTNESS_r0*.json:
its keys are exactly ``list(CATALOG)[:50]`` of that round).  Round 2's
verdict traced its one coverage gap to exactly this: queries silently
falling outside the sampled window.  Round 8 replaced the hand-kept
``_PRIORITY``/``_TAIL`` name literals (a typo silently dropped a query
from the window — the r7 "typo'd CLI names" false-PASS was this defect
class) with an ordering DERIVED from the committed CORRECTNESS
artifacts; these tests pin the derivation's invariants."""

from __future__ import annotations

DRIVER_WINDOW = 50


def _entry():
    import importlib
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return importlib.import_module("__spark_entry__")


def test_ordering_is_a_permutation_of_the_catalog():
    e = _entry()
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    names = e._ordered_names()
    assert sorted(names) == sorted(CATALOG)
    assert len(names) == len(set(names)), "duplicate names in the rotation"


def test_force_window_names_exist_in_catalog():
    """A typo'd name in _FORCE_WINDOW is silently dropped by the
    `n in CATALOG` filter — catch it here instead."""
    e = _entry()
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    missing = [n for n in e._FORCE_WINDOW if n not in CATALOG]
    assert not missing, f"_FORCE_WINDOW names unknown queries: {missing}"


def test_force_window_drains_on_green_row_at_or_after_change_round():
    """r11 ADVICE item 1: a forced entry must leave the window head once
    a green driver row from a round >= its change round exists —
    otherwise a force list larger than the window re-samples the same
    head forever and the tail backlog never drains."""
    e = _entry()
    seen = {
        "drained": [9, 11],       # green at 11 >= changed 11 -> drains
        "stale_green": [10],      # green only BEFORE the change -> stays
        # "never_seen": no row at all -> stays
    }
    forced = {"drained": 11, "stale_green": 11, "never_seen": 12}
    import unittest.mock as mock

    catalog = dict.fromkeys(["drained", "stale_green", "never_seen"])
    with mock.patch.object(e, "_FORCE_WINDOW", forced), \
            mock.patch.object(e, "CATALOG", catalog):
        active = e._active_forced(seen)
    assert active == ["stale_green", "never_seen"]  # change-round order


def test_force_window_active_entries_fit_and_order_by_change_round():
    """The still-active backlog must lead the ordering: every active
    forced name sits ahead of every non-forced name, ordered by change
    round so the oldest debt drains first."""
    e = _entry()
    seen = e.verified_rounds()
    active = e._active_forced(seen)
    names = e._ordered_names()
    assert names[: len(active)] == active
    rounds = [e._FORCE_WINDOW[n] for n in active]
    assert rounds == sorted(rounds)


def test_verified_rounds_covers_the_catalog():
    """Every green driver row maps to a catalog query (artifact names
    and catalog names never drift apart), and — as of r7 — every catalog
    query has at least one green row unless it is a NEW registration
    (which the window derivation puts first automatically)."""
    e = _entry()
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    seen = e.verified_rounds()
    stray = [n for n in seen if n not in CATALOG]
    assert not stray, f"green driver rows for unknown queries: {stray}"
    # Parsed artifacts must reproduce the known r1-r7 union (203/203).
    assert len(seen) >= 203


def test_window_holds_the_stalest_entries():
    """The sampled window (first DRIVER_WINDOW names) must consist of:
    forced re-verifications, then every never-verified query, then the
    stalest verified ones — no verified query inside the window may be
    FRESHER than any non-forced query outside it."""
    e = _entry()
    names = e._ordered_names()
    seen = e.verified_rounds()
    window = names[:DRIVER_WINDOW]
    outside = names[DRIVER_WINDOW:]

    # every never-verified query is inside the window — unless the
    # still-active forced backlog alone overflows the window (r12: 73
    # plan-changed entries), in which case never-verified entries queue
    # IMMEDIATELY after the forced block and enter as it drains
    never = [n for n in names if n not in seen]
    active = e._active_forced(seen)
    if len(active) + len(never) <= DRIVER_WINDOW:
        assert set(never) <= set(window)
    else:
        assert names[len(active) : len(active) + len(never)] == never

    # staleness monotonicity across the boundary
    forced = set(e._active_forced(seen))
    in_last = [seen[n][-1] for n in window if n in seen and n not in forced]
    out_last = [seen[n][-1] for n in outside if n in seen]
    if in_last and out_last:
        assert max(in_last) <= min(out_last), (
            "a fresher-verified query sits inside the window while a "
            "staler one is outside"
        )


def test_green_criterion():
    e = _entry()
    ok = {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "err": None,
    }
    assert e._is_green(ok)
    # rows-only (non-SQL) checks lack hash/schema fields
    assert e._is_green({"rows_match": True, "err": None})
    assert not e._is_green({**ok, "hash_match": False})
    assert not e._is_green({**ok, "schema_match": False})
    assert not e._is_green({**ok, "rows_match": False})
    assert not e._is_green({**ok, "err": "boom"})
    assert not e._is_green({})


def test_partial_artifact_contributes_nothing(tmp_path, monkeypatch):
    """r8 ADVICE item 3: a truncated/partial CORRECTNESS file must not
    mark queries fresh (which would rotate them out of the window)."""
    import json

    import __spark_entry__ as E

    good = {f"q{i}": {"rows_match": True, "err": None} for i in range(E._MIN_ARTIFACT_ROWS)}
    (tmp_path / "CORRECTNESS_r90.json").write_text(json.dumps(good))
    partial = {"q0": {"rows_match": True, "err": None}}  # truncated run
    (tmp_path / "CORRECTNESS_r91.json").write_text(json.dumps(partial))
    foreign = {f"q{i}": i for i in range(50)}  # rows aren't dicts
    (tmp_path / "CORRECTNESS_r92.json").write_text(json.dumps(foreign))
    (tmp_path / "CORRECTNESS_r93.json").write_text("{not json")

    monkeypatch.setattr(E, "_REPO", str(tmp_path))
    seen = E.verified_rounds()
    assert seen["q0"] == [90]  # r91/r92/r93 all ignored
    assert all(rounds == [90] for rounds in seen.values())
