"""Stream-stream event-time interval join (SURVEY §2.9 T-family; absent
in the reference, whose streaming surface is table→table passthrough —
``src/streaming/readers.py`` / ``writers.py`` — with no event-time
semantics; provided because correlating two live streams is the first
thing a real event pipeline needs, e.g. click→conversion attribution).

Spark's execution model for this join keeps BOTH sides' recent rows in
versioned state stores and matches across micro-batches.  Unbounded
state is the failure mode; two things bound it, and this module makes
both mandatory rather than optional:

  - a WATERMARK on each input (how late a row may arrive), and
  - a TIME-INTERVAL join condition (how far apart matching events may
    be) — together they let Spark compute "no future match possible"
    per stored row and evict it.

Without the interval bound an inner join's state grows forever even
with watermarks; Spark only warns.  At 100 TB/day the state store is
the bottleneck resource, so the eviction horizon (watermark + interval
width) times per-key arrival rate IS the capacity plan — size the
RocksDB state store to that product (docs/SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VALID_HOW = ("inner", "left_outer", "leftouter", "left")


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    *,
    window: str = "5 minutes",
    max_delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``right`` occurring within ``[left_ts, left_ts +
    window]`` of a matching ``left`` row (equi-key ``on`` + event-time
    interval).

    Both inputs are watermarked with ``max_delay`` here — callers cannot
    forget the state bound.  Column names must already be disjoint apart
    from the join key(s) (rename upstream; streaming joins cannot be
    disambiguated after the fact the way batch aliases can).

    ``how``: inner or left-outer.  Left-outer emits the unmatched left
    row (right columns NULL) only once the watermark passes the join
    window — correct-by-construction late-data semantics, which is why
    results are append-mode only.

    Works unchanged on batch frames (watermarks no-op; the interval
    condition is an ordinary range join) — that equivalence is how the
    semantics are pytest-verified deterministically.
    """
    if how not in _VALID_HOW:
        raise ValueError(f"interval_join_streams supports {_VALID_HOW}, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"ambiguous non-key columns on both sides: {sorted(overlap)}; "
            "rename before joining (streaming state is keyed by name)"
        )
    lw = left.withWatermark(left_ts, max_delay)
    rw = right.withWatermark(right_ts, max_delay)
    cond = F.lit(True)
    for k in keys:
        cond = cond & (lw[k] == rw[k])
    cond = (
        cond
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.expr(f"{left_ts} + INTERVAL {window}"))
    )
    joined = lw.join(rw, cond, how)
    # Drop the right side's copy of the join keys (inner: equal anyway;
    # outer: NULL) so downstream sees one unambiguous key column.
    for k in keys:
        joined = joined.drop(rw[k])
    return joined
