"""bench_compare.py: first-seen baselines, ratio flags, noise discipline."""

from __future__ import annotations

import bench_compare as bc


def _art(queries, spread=1.1):
    return {"queries": queries, "calibration": {"probe_spread": spread}}


def test_first_seen_takes_earliest_round():
    arts = [(1, _art({"q": 1.0})), (2, _art({"q": 0.5, "r": 2.0}))]
    base = bc.first_seen(arts)
    assert base == {"q": (1, 1.0), "r": (2, 2.0)}


def test_steady_regression_flags_and_hard_fails():
    history = [(1, _art({"q": 1.0, "ok": 1.0}))]
    current = _art({"q": 2.5, "ok": 1.1}, spread=1.2)
    rows, hard_fail = bc.compare(current, history, threshold=2.0, max_spread=1.6)
    by = {r["query"]: r for r in rows}
    assert by["q"]["flag"] == "WEAK" and by["q"]["ratio"] == 2.5
    assert by["ok"]["flag"] == ""
    assert hard_fail


def test_noisy_window_never_hard_fails():
    history = [(1, _art({"q": 1.0}))]
    current = _art({"q": 3.0}, spread=2.4)  # slow-VM window
    rows, hard_fail = bc.compare(current, history, threshold=2.0, max_spread=1.6)
    assert rows[0]["flag"].startswith("weak?")
    assert not hard_fail


def test_driver_wrapper_unwrapped(tmp_path, monkeypatch):
    import json

    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"n": 1, "rc": 0, "parsed": _art({"q": 1.0})})
    )
    (tmp_path / "BENCH_r02.json").write_text(json.dumps(_art({"q": 1.1})))
    arts = bc.load_artifacts(str(tmp_path))
    assert [r for r, _ in arts] == [1, 2]
    assert arts[0][1]["queries"] == {"q": 1.0}


def test_committed_artifacts_all_load():
    arts = bc.load_artifacts()
    assert len(arts) >= 6  # r1..r8 minus the skipped round
    assert all("queries" in a for _, a in arts)
