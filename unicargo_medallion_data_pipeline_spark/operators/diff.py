"""Snapshot reconciliation: row-level diff between two table versions.

A medallion pipeline that reprocesses a layer (the reference overwrites
silver/gold wholesale every run — ``src/io_utils/write_to_table_utils.py:41-46``)
has no built-in answer to "what actually changed between yesterday's table
and today's?".  This operator provides the CDC-style answer as a plain
DataFrame computation: full-outer-join the two snapshots on the business
key and classify every key as added / removed / changed / unchanged.

Scale posture (100 TB): one hash-partitioned full-outer equi-join on the
key — both sides shuffle once on the same key, so at lake scale the two
snapshots should be written bucketed by the key (``sources/writers.py``
``write_bucketed``) which turns this into a zero-shuffle sort-merge join.
Column comparison happens AFTER the join on the joined row (narrow), via
null-safe per-column equality — no row serialization, no UDF, stays in
whole-stage codegen.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: classification values emitted in the status column
ADDED = "added"
REMOVED = "removed"
CHANGED = "changed"
UNCHANGED = "unchanged"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    status_col: str = "change_status",
) -> DataFrame:
    """Row-level diff of ``new`` vs ``old`` keyed by ``keys``.

    Returns one row per key present in either snapshot with the key
    columns, ``<col>_old`` / ``<col>_new`` for every compared column,
    and ``status_col`` ∈ {added, removed, changed, unchanged}.

    ``compare_cols`` defaults to all shared non-key columns.  Comparison
    is null-safe (``<=>``): NULL == NULL counts as equal, NULL vs value
    as changed — the semantics a CDC consumer expects.

    Precondition: ``keys`` must be unique within EACH snapshot (the CDC
    contract).  Duplicate keys fan out through the full-outer join
    (m×n rows per key) and the per-key statuses become meaningless;
    run a count-distinct gate upstream if the source cannot guarantee
    it (``quality/validation.py``).
    """
    if not keys:
        raise ValueError("snapshot_diff requires at least one key column")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    missing = [c for c in keys + compare_cols if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"columns missing from one side: {missing}")

    # The join must be NULL-SAFE on the keys: a plain equi-join never
    # matches a NULL key, so an identical NULL-keyed row present in both
    # snapshots would be double-reported as added AND removed (firing
    # "removed > 0.1%" gates spuriously).  eqNullSafe join keys still
    # plan as a hash-partitioned sort-merge join.
    o = old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in keys],
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in keys],
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"_ko_{k}").eqNullSafe(F.col(f"_kn_{k}")) for k in keys],
    )
    joined = o.join(n, on=cond, how="full_outer").select(
        *[
            F.coalesce(F.col(f"_ko_{k}"), F.col(f"_kn_{k}")).alias(k)
            for k in keys
        ],
        *[F.col(f"{c}_old") for c in compare_cols],
        F.col("_in_old"),
        *[F.col(f"{c}_new") for c in compare_cols],
        F.col("_in_new"),
    )

    if compare_cols:
        # eqNullSafe rejects unorderable (map/variant) types at analysis
        # time (r9 hunt) — a bronze snapshot carrying a metadata map was
        # un-diffable.  Those columns compare via their JSON rendering:
        # deterministic per stored value and NULL-safe (a NULL field is
        # omitted from the struct's JSON on both sides identically).
        # The rendering is CANONICAL for top-level maps (entries sorted
        # by key — round-10 ADVICE item 4): plain to_json is entry-order
        # sensitive, so an upstream that rebuilds a map in a different
        # key order would spuriously report every row as 'changed'.
        # Residual sensitivity: variants and maps nested deeper than the
        # top level still compare by stored order (canonical_json doc).
        from unicargo_medallion_data_pipeline_spark.functions.hashing import (
            canonical_json,
            xxhashable,
        )

        types = {f.name: f.dataType for f in new.schema.fields}

        def _col_eq(c: str) -> Column:
            if xxhashable(types[c]):
                return F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
            return canonical_json(F.col(f"{c}_old"), types[c]).eqNullSafe(
                canonical_json(F.col(f"{c}_new"), types[c])
            )

        all_equal: Column = reduce(
            lambda a, b: a & b, [_col_eq(c) for c in compare_cols]
        )
    else:
        all_equal = F.lit(True)

    status = (
        F.when(F.col("_in_old").isNull(), F.lit(ADDED))
        .when(F.col("_in_new").isNull(), F.lit(REMOVED))
        .when(all_equal, F.lit(UNCHANGED))
        .otherwise(F.lit(CHANGED))
    )
    return joined.withColumn(status_col, status).drop("_in_old", "_in_new")


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    status_col: str = "change_status",
) -> DataFrame:
    """Aggregate form: one row per status with its key count — the
    reconciliation report a pipeline gate consumes (e.g. "fail the run
    if removed > 0.1% of keys")."""
    d = snapshot_diff(old, new, keys, compare_cols, status_col)
    return d.groupBy(status_col).agg(F.count(F.lit(1)).alias("n_keys"))


def schema_diff(
    old: DataFrame,
    new: DataFrame,
) -> list[dict]:
    """Column-level diff between two table versions: the metadata
    companion to :func:`snapshot_diff` (which answers the ROW question).
    Returns one dict per differing-or-shared column with status ∈
    {added, removed, retyped, unchanged}, plus the old/new type strings
    — the drift report a pipeline prints before deciding whether an
    overwrite is a safe evolution or a breaking change.

    Purely metadata: no job runs, no data moves — schemas come from the
    plans.  Nullability changes count as ``retyped`` (a column going
    nullable breaks NOT NULL consumers just as surely as an int→string).
    """
    old_fields = {f.name: f for f in old.schema.fields}
    new_fields = {f.name: f for f in new.schema.fields}
    out: list[dict] = []
    for name in sorted(set(old_fields) | set(new_fields)):
        o, n = old_fields.get(name), new_fields.get(name)
        if o is None:
            status, ot, nt = ADDED, None, n.dataType.simpleString()
        elif n is None:
            status, ot, nt = REMOVED, o.dataType.simpleString(), None
        else:
            ot, nt = o.dataType.simpleString(), n.dataType.simpleString()
            status = (
                UNCHANGED
                if ot == nt and o.nullable == n.nullable
                else "retyped"
            )
        out.append(
            {"column": name, "status": status, "old_type": ot, "new_type": nt}
        )
    return out
