#!/usr/bin/env python
"""Per-query bench regression check against first-seen baselines.

The judge grades each round's BENCH artifact per QUERY against the
first round that measured it (a >2x ratio is a `weak` mark).  This tool
computes exactly that locally, so a regression is caught before the
driver runs, not after the verdict:

  python bench_compare.py                  # committed BENCH_r*.json vs latest
  python bench_compare.py --current out.json   # a fresh bench run vs history

Noise discipline: every artifact embeds CPU-calibration probes
(bench.py); ratios are only trustworthy when both windows were steady.
The tool prints each artifact's probe spread alongside, and never
exits non-zero on a ratio measured in a window whose spread exceeds
--max-spread (default 1.6) — a slow-VM window is evidence about the
host, not the plan (the r7 26.4s artifact post-mortem).

Exit code: 1 if any steady-window query ratio exceeds --threshold
(default 2.0), else 0.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.abspath(__file__))


def load_artifacts(repo: str = _REPO) -> list[tuple[int, dict]]:
    """[(round, artifact_json)] ascending by round."""
    out = []
    for path in glob.glob(os.path.join(repo, "BENCH_r*.json")):
        m = re.search(r"r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        data = unwrap(data)
        if isinstance(data, dict) and isinstance(data.get("queries"), dict):
            out.append((int(m.group(1)), data))
    return sorted(out)


def unwrap(data: dict) -> dict:
    """Strip the driver's artifact wrapper ({n, rc, tail, parsed: <bench
    line>}) when present — shared by the committed-artifact scan AND
    --current, so the ≤2x gate runs against exactly what the driver
    commits, no hand-extraction (round-10 verdict task 2)."""
    if isinstance(data, dict) and isinstance(data.get("parsed"), dict):
        return data["parsed"]
    return data


def spread(artifact: dict) -> float | None:
    cal = artifact.get("calibration") or {}
    return cal.get("probe_spread")


def probe_anchor(artifact: dict) -> float | None:
    """This artifact's host-throughput anchor: the committed
    ``probe_anchor`` (r15+ artifacts), else the MINIMUM of its raw
    ``probe_sec`` list (every artifact since r7 carries one).  The min,
    not the median: bench.py's steady_selection aims every winning
    attempt at the window around the minimum probe (CPU-steal noise
    only inflates a fixed-work probe), so for a noisy artifact like
    r12 (probe spread 4.8x, winners taken at ~min) the artifact-wide
    median would wrongly claim a slow host and turn equal raw timings
    into a phantom 2.3x normalized regression."""
    cal = artifact.get("calibration") or {}
    if isinstance(cal.get("probe_anchor"), (int, float)):
        return float(cal["probe_anchor"])
    probes = cal.get("probe_sec")
    if isinstance(probes, list) and probes:
        return float(min(probes))
    return None


def first_seen(
    artifacts: list[tuple[int, dict]]
) -> dict[str, tuple[int, float, float | None]]:
    """query -> (round, seconds, that round's probe anchor) from the
    EARLIEST artifact measuring it."""
    base: dict[str, tuple[int, float, float | None]] = {}
    for rnd, art in artifacts:
        pm = probe_anchor(art)
        for name, sec in art["queries"].items():
            if name not in base and isinstance(sec, (int, float)):
                base[name] = (rnd, float(sec), pm)
    return base


def compare(
    current: dict,
    artifacts: list[tuple[int, dict]],
    threshold: float,
    max_spread: float,
) -> tuple[list[dict], bool]:
    """Returns (rows, hard_fail).  A row is one query's ratio record."""
    base = first_seen(artifacts)
    cur_spread = spread(current)
    cur_probe = probe_anchor(current)
    steady = cur_spread is not None and cur_spread <= max_spread
    rows, hard_fail = [], False
    for name, sec in sorted(current["queries"].items()):
        fs = base.get(name)
        ratio = round(sec / fs[1], 2) if fs and fs[1] else None
        # Probe-normalized ratio (r14 verdict task 2): divide each
        # window's host throughput back out, so a uniformly slower VM
        # no longer reads as a uniform plan regression.  The WEAK gate
        # judges the normalized ratio when both anchors exist.
        norm_ratio = None
        if ratio is not None and cur_probe and fs[2]:
            norm_ratio = round((sec / cur_probe) / (fs[1] / fs[2]), 2)
        judged = norm_ratio if norm_ratio is not None else ratio
        flag = ""
        if judged is not None and judged > threshold:
            flag = "WEAK" if steady else "weak?(noisy window)"
            hard_fail = hard_fail or steady
        rows.append(
            {
                "query": name,
                "sec": sec,
                "first_seen_round": fs[0] if fs else None,
                "first_seen_sec": fs[1] if fs else None,
                "ratio": ratio,
                "norm_ratio": norm_ratio,
                "flag": flag,
            }
        )
    return rows, hard_fail


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--current",
        help="bench JSON to grade (default: the highest-round committed artifact)",
    )
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--max-spread", type=float, default=1.6)
    args = ap.parse_args(argv)

    artifacts = load_artifacts()
    if args.current:
        with open(args.current) as fh:
            current = unwrap(json.load(fh))
        history = artifacts
    else:
        if not artifacts:
            print("no BENCH_r*.json artifacts found", file=sys.stderr)
            return 2
        *history, (rnd, current) = artifacts
        if not history:
            print(f"only round {rnd} exists — nothing to compare against")
            return 0

    rows, hard_fail = compare(current, history, args.threshold, args.max_spread)
    cur_spread = spread(current)
    print(f"current window probe spread: {cur_spread}")
    w = max(len(r["query"]) for r in rows)
    for r in rows:
        fs = (
            f"r{r['first_seen_round']}={r['first_seen_sec']}s"
            if r["first_seen_round"] is not None
            else "first-seen"
        )
        print(
            f"{r['query']:{w}s} {r['sec']:>8.3f}s  {fs:>14s}  "
            f"ratio={r['ratio'] if r['ratio'] is not None else '—':>5}  "
            f"norm={r['norm_ratio'] if r['norm_ratio'] is not None else '—':>5}  "
            f"{r['flag']}"
        )
    n_weak = sum(1 for r in rows if r["flag"] == "WEAK")
    print(f"\n{n_weak} steady-window regressions over {args.threshold}x")
    return 1 if hard_fail else 0


if __name__ == "__main__":
    sys.exit(main())
