"""bench_compare.py: first-seen baselines, ratio flags, noise discipline."""

from __future__ import annotations

import bench_compare as bc


def _art(queries, spread=1.1):
    return {"queries": queries, "calibration": {"probe_spread": spread}}


def test_first_seen_takes_earliest_round():
    arts = [(1, _art({"q": 1.0})), (2, _art({"q": 0.5, "r": 2.0}))]
    base = bc.first_seen(arts)
    assert base == {"q": (1, 1.0, None), "r": (2, 2.0, None)}


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


def test_current_flag_accepts_wrapped_driver_artifact(tmp_path, capsys):
    """Round-10 verdict task 2: --current must consume the driver's
    committed artifact (wrapped under 'parsed') directly — previously a
    KeyError: 'queries'."""
    import json

    cur = tmp_path / "BENCH_rX.json"
    cur.write_text(json.dumps({"n": 1, "rc": 0, "parsed": _art({"q": 1.0})}))
    rc = bc.main(["--current", str(cur)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "q" in out and "probe spread: 1.1" in out


def test_current_flag_committed_r09_artifact_loads():
    """The real committed BENCH_r09.json (driver wrapper) must run
    through main() end-to-end."""
    import os

    path = os.path.join(os.path.dirname(bc.__file__), "BENCH_r09.json")
    assert bc.main(["--current", path]) == 0


def test_probe_normalized_ratio_separates_drift_from_regression():
    """r14 verdict task 2: a query 2.4x slower on a host whose probe
    also ran 2.4x slower is DRIFT (norm ratio 1.0, no flag); the same
    raw ratio on an equally-fast host is a real regression (norm 2.4,
    WEAK).  The gate judges the normalized ratio when both windows
    carry probe anchors."""
    hist = [
        (
            9,
            {
                "queries": {"q": 1.0},
                "calibration": {"probe_spread": 1.1, "probe_sec": [0.10, 0.10]},
            },
        )
    ]
    drift = {
        "queries": {"q": 2.4},
        "calibration": {"probe_spread": 1.1, "probe_sec": [0.24, 0.24]},
    }
    rows, hard_fail = bc.compare(drift, hist, threshold=2.0, max_spread=1.6)
    (r,) = rows
    assert r["ratio"] == 2.4 and r["norm_ratio"] == 1.0 and r["flag"] == ""
    assert not hard_fail

    regress = {
        "queries": {"q": 2.4},
        "calibration": {"probe_spread": 1.1, "probe_sec": [0.10, 0.10]},
    }
    rows, hard_fail = bc.compare(regress, hist, threshold=2.0, max_spread=1.6)
    (r,) = rows
    assert r["norm_ratio"] == 2.4 and r["flag"] == "WEAK" and hard_fail


def test_probe_anchor_prefers_committed_field_else_min():
    art = {
        "queries": {},
        "calibration": {"probe_anchor": 0.5, "probe_sec": [0.1, 0.9]},
    }
    assert bc.probe_anchor(art) == 0.5
    # fallback for r7-r14 artifacts: the MIN of the raw probe list —
    # the window steady_selection aimed the winners at
    art2 = {"queries": {}, "calibration": {"probe_sec": [0.15, 0.2, 0.9]}}
    assert bc.probe_anchor(art2) == 0.15
    assert bc.probe_anchor({"queries": {}}) is None
