"""Accepted-precision ledger completeness (r11 verdict item 5).

docs/PRECISION.md is the single enumeration of every emitted-value
rounding compromise.  This test closes the loop mechanically: every
digit-argument ``round(expr, n)`` in ``plans/`` (Spark ``F.round`` or
SQL ``ROUND``) must belong to a query row in the ledger's
"Rounded-output compromises" table, and every ledger row must still
correspond to at least one such site — a new 4dp rounding smuggled in
without a ledger row fails, and so does a stale row.
"""

from __future__ import annotations

import glob
import os
import re

from tests.conftest import REPO

PLANS_DIR = os.path.join(REPO, "unicargo_medallion_data_pipeline_spark", "plans")
LEDGER = os.path.join(REPO, "docs", "PRECISION.md")

#: round( <args possibly one level of nesting> , <digits>) — matches
#: F.round("p05", 4) and ROUND(quantile_cont(x, 0.25), 4); does NOT
#: match the exact-cents idiom F.round(x * 100) (no digit argument).
_ROUND_RE = re.compile(
    r"round\(\s*(?:[^()]|\([^()]*\))*?,\s*([0-9]+)\s*\)", re.IGNORECASE
)
_REGISTER_RE = re.compile(r"@register\(\s*\n?\s*[\"']([a-zA-Z0-9_]+)[\"']")


def _ledger_queries() -> set[str]:
    with open(LEDGER) as fh:
        text = fh.read()
    section = text.split("## Rounded-output compromises")[1].split("## ")[0]
    return set(re.findall(r"^\| `([a-z0-9_]+)` \|", section, flags=re.M))


def _round_sites() -> set[str]:
    """Registered queries whose registration block (decorator SQL +
    function body, i.e. the span from its @register to the next) holds
    a digit-argument round()."""
    found: set[str] = set()
    for path in glob.glob(os.path.join(PLANS_DIR, "*.py")):
        src = open(path).read()
        regs = [(m.start(), m.group(1)) for m in _REGISTER_RE.finditer(src)]
        spans = [
            (start, regs[i + 1][0] if i + 1 < len(regs) else len(src), name)
            for i, (start, name) in enumerate(regs)
        ]
        for m in _ROUND_RE.finditer(src):
            if int(m.group(1)) == 0:
                continue  # explicit 0-digit rounding = integer idiom
            owner = next(
                (name for start, end, name in spans if start <= m.start() < end),
                None,
            )
            found.add(owner or f"<unregistered:{os.path.basename(path)}>")
    return found


def test_ledger_matches_code_exactly():
    ledger = _ledger_queries()
    sites = _round_sites()
    assert sites == ledger, (
        "docs/PRECISION.md out of sync with plans/: "
        f"unledgered={sorted(sites - ledger)}, stale={sorted(ledger - sites)}"
    )


def test_ledger_has_expected_shape():
    """The known compromise set, pinned so an accidental ledger rewrite
    is visible in review."""
    assert _ledger_queries() == {"order_value_percentiles", "events_winsorized_stats"}
