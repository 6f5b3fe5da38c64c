"""Range (point-in-interval) join — Spark has no interval-join primitive,
and the naive form (``points.join(intervals, BETWEEN-predicate)``) plans
a per-key nested loop: a candidate blowup that dies at scale.

The scalable composition: quantize the time axis into fixed-width bins.
Each interval is exploded to every bin it overlaps (a narrow map whose
fan-out is interval_span / bin_width); each point carries its single bin.
Candidates come from an EQUI-join on (key, bin) — one shuffle — and the
exact BETWEEN predicate filters inside the join.  Every true match
surfaces exactly once (through the point's own bin), so no dedup pass is
needed.

Choosing ``bin_width``: ≈ the typical interval span.  Too small → the
interval explode fans out; too large → bins collect unrelated candidates
for the post-filter.  Both degrade gracefully; neither is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner join of each point to the interval(s) containing it
    (``start <= ts <= end``), key-scoped by ``on``.

    Numeric (epoch-seconds) axis; non-key columns of the two inputs must
    not collide (alias before calling).  Inner-only by design: bin
    replication makes outer semantics ambiguous — anti-join the result
    against ``points`` for the unmatched set.
    """
    collisions = (set(points.columns) & set(intervals.columns)) - set(on)
    if collisions:
        raise ValueError(f"column collision between sides: {sorted(collisions)}")
    reserved = [c for c in ("_bin",) if c in points.columns or c in intervals.columns]
    if reserved:
        raise ValueError(f"input columns collide with join bookkeeping: {reserved}")

    p = points.withColumn("_bin", F.floor(F.col(ts_col) / bin_width).cast("long"))
    # Drop inverted intervals (end < start) BEFORE the explode: they can
    # match nothing under BETWEEN anyway, but Spark's sequence(a, b)
    # auto-steps DESCENDING when a > b, so one corrupt row with swapped
    # bounds (start=1e9, end=0) would otherwise fan out to ~1e9/bin_width
    # bins and take down an executor.  NULL bounds already drop via
    # sequence(NULL, …) → NULL → explode skips the row.
    iv = intervals.filter(F.col(start_col) <= F.col(end_col)).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width).cast("long"),
                F.floor(F.col(end_col) / bin_width).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, [*on, "_bin"])
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("_bin")
    )
