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
    from pyspark.sql import types as T

    payload = [c for c in right.columns if c not in {*on, ts_col}]
    collisions = set(payload) & set(left.columns)
    if collisions:
        raise ValueError(f"right payload collides with left columns: {sorted(collisions)}")
    reserved = [
        c
        for c in ("_side", "_payload")
        if c in left.columns or c in right.columns
    ]
    if reserved:
        # Same posture as scd2/_prepare_updates: withColumn would
        # silently OVERWRITE a caller column of the same name and the
        # final drop would erase it from the result.
        raise ValueError(f"input columns collide with join bookkeeping: {reserved}")
    left_extra = [c for c in left.columns if c not in {*on, ts_col}]
    if not payload:
        return left.select(*on, ts_col, *left_extra)

    # Carry the payload as ONE struct column, not per-column last():
    # per-column carry would backfill a genuinely-NULL payload cell from
    # an OLDER right row, fabricating a row that never existed and
    # erasing the no-match/null-payload distinction.  struct(*payload) is
    # non-null whenever a right row matched (even if every field is
    # null), so last(ignorenulls) picks whole rows atomically — exactly
    # DuckDB ASOF JOIN semantics.
    right_fields = {f.name: f for f in right.schema.fields}
    payload_t = T.StructType([right_fields[c] for c in payload])

    l_tagged = left.withColumn("_side", F.lit(1)).withColumn(
        "_payload", F.lit(None).cast(payload_t)
    )
    # A right row with a NULL timestamp can never satisfy right.ts <=
    # left.ts (DuckDB ASOF semantics) — unfiltered it would sort FIRST
    # under the ascending window order and its payload would be carried
    # into every left row before the first real right row.
    r_tagged = (
        right.filter(F.col(ts_col).isNotNull())
        .withColumn("_side", F.lit(0))
        .withColumn("_payload", F.struct(*payload))
    )
    for c in left_extra:
        r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    cols = [*on, ts_col, "_side", *left_extra, "_payload"]
    u = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    w = (
        Window.partitionBy(*on)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_payload", F.last("_payload", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1)
    for c in payload:
        out = out.withColumn(c, F.col("_payload").getField(c))
    return out.drop("_side", "_payload")
