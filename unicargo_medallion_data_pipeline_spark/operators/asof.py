"""As-of (backward) join — an operator Spark has no primitive for,
composed from existing DataFrame ops (no UDFs, no range explosion).

Semantics: for each left row, attach the payload of the LATEST right row
of the same key with ``right.ts <= left.ts`` (the point-in-time lookup
every event-to-state enrichment needs: click → latest prior purchase,
trade → prevailing quote, reading → last calibration).

Shape (the only one that scales): tag both sides, union, and run ONE
carry-forward window per key ordered by (ts, side) — right rows sort
before left rows at the same timestamp, so boundary equality matches.
That is a single shuffle on the key, O(n log n) per key for the sort,
and no key×key candidate blowup; the naive alternative (theta-join on
``l.ts >= r.ts`` + argmax) is a per-key cross product.

Determinism contract: the right side must be unique per (key, ts) —
canonicalize first (operators/cleaning.canonical_dedup) — because ANY
engine's as-of pick among equal timestamps is arbitrary.  DuckDB's
native ASOF JOIN serves as the oracle for the catalog query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
) -> DataFrame:
    """Left as-of join: latest right row with ``right.ts <= left.ts`` per key.

    ``left`` and ``right`` share the key columns ``on`` and the order
    column ``ts_col``; all OTHER right columns are the carried payload and
    must not collide with left column names (alias before calling).
    Left rows with no prior right row keep null payloads (left-join
    semantics).
    """
    payload = [c for c in right.columns if c not in {*on, ts_col}]
    collisions = set(payload) & set(left.columns)
    if collisions:
        raise ValueError(f"right payload collides with left columns: {sorted(collisions)}")

    l_tagged = left.withColumn("_side", F.lit(1))
    for c in payload:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    r_tagged = right.withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in {*on, ts_col}:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    cols = [*on, ts_col, "_side", *[c for c in left.columns if c not in {*on, ts_col}], *payload]
    u = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    w = (
        Window.partitionBy(*on)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in payload:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side")
