"""Config-driven cleaning operators (SURVEY §2.2 P2, P9, P10, P13).

Reference counterpart: ``src/data_quality/cleaning.py`` (drop_columns
28-58, dedup 60-87, fill nulls 89-130, composite pipeline 132-176) and
``src/config/cleaning_config.py:5-41``.

All operators are lazy DataFrame→DataFrame transforms; the composite
pipeline is plain function composition, so Catalyst fuses the whole chain
into one stage (no materialization between steps).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def drop_columns_safe(df: DataFrame, columns: list[str]) -> DataFrame:
    """P2 — drop only columns that exist; warn (don't fail) on unknowns."""
    present = [c for c in columns if c in df.columns]
    unknown = [c for c in columns if c not in df.columns]
    if unknown:
        log.warning("drop_columns: ignoring unknown columns %s", unknown)
    return df.drop(*present) if present else df


def dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """P10 — drop duplicate rows, optionally on a key subset.

    Note: like the reference, subset-dedup keeps an ARBITRARY survivor.
    When downstream results must be deterministic (oracle comparison,
    MERGE keys) use ``canonical_dedup`` instead.

    Full-row dedup of a frame carrying an unhashable (map/variant)
    column fails deep inside Spark's aggregation with an opaque
    analysis error — raise early with the column names and the fix
    (full-row dedup over a map has no defined equality anyway; pick a
    key subset).
    """
    if subset is None:
        from unicargo_medallion_data_pipeline_spark.functions.hashing import xxhashable

        bad = [f.name for f in df.schema.fields if not xxhashable(f.dataType)]
        if bad:
            raise ValueError(
                f"full-row dedup cannot group by unhashable column(s) {bad}; "
                "pass an explicit subset of key columns"
            )
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def canonical_dedup(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """Deterministic subset-dedup: keep the first row per key under an
    explicit tiebreak order (row_number==1).  One shuffle on the key —
    same cost as dropDuplicates, but reproducible at any parallelism."""
    from pyspark.sql import Window

    if "__rn" in df.columns:
        raise ValueError(
            "input already has a '__rn' column — canonical_dedup would "
            "silently overwrite and drop it"
        )
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scrub_nonfinite(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Replace NaN / ±Infinity in float/double columns with NULL.

    The analytic catalog's determinism contracts assume FINITE doubles:
    NaN breaks them structurally (engines disagree on NaN ordering and
    grouping — Spark sorts NaN largest and groups NaN==NaN; IEEE
    comparison says neither), and ±Inf poisons every downstream sum.
    The production posture is therefore to scrub at the BRONZE boundary:
    non-finite measurements become NULL (unknown), which every engine
    and every aggregate treats identically.  Pure column expressions —
    a narrow codegen'd map, no shuffle, safe at any scale.

    ``columns`` defaults to every float/double column in the schema.
    """
    float_cols = {
        f.name for f in df.schema.fields if f.dataType.typeName() in ("float", "double")
    }
    targets = float_cols if columns is None else set(columns) & float_cols
    out = df
    for c in sorted(targets):
        col = F.col(c)
        out = out.withColumn(
            c, F.when(F.isnan(col) | col.isin(float("inf"), float("-inf")), None).otherwise(col)
        )
    return out


def fill_nulls(
    df: DataFrame,
    per_column: dict[str, object] | None = None,
    string_default: str | None = None,
    numeric_default: float | None = None,
) -> DataFrame:
    """P9 — per-column fills plus blanket string/numeric defaults."""
    if per_column:
        present = {c: v for c, v in per_column.items() if c in df.columns}
        if present:
            df = df.fillna(present)
    if string_default is not None:
        string_cols = [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]
        if string_cols:
            df = df.fillna(string_default, subset=string_cols)
    if numeric_default is not None:
        num_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName()
            in ("integer", "long", "double", "float", "short", "byte", "decimal")
        ]
        if num_cols:
            df = df.fillna(numeric_default, subset=num_cols)
    return df


@dataclass
class CleaningConfig:
    """Mirrors the shape of ``src/config/cleaning_config.py:5-41``."""

    add_timestamp: bool = True
    drop_columns: list[str] = field(default_factory=list)
    dedup_subset: list[str] | None = None
    fill_per_column: dict[str, object] = field(default_factory=dict)
    fill_string_default: str | None = None
    fill_numeric_default: float | None = None
    #: NULL out NaN/±Inf in float columns BEFORE dedup/fill — the
    #: bronze-boundary posture the analytic catalog's finite-doubles
    #: contract assumes (see scrub_nonfinite).  Default ON as of r12:
    #: at lake scale "the ingest makes the contract true" must be the
    #: default, not an opt-in (r11 verdict item 3); the scrub is pure
    #: codegen'd column expressions — no shuffle, ~zero cost — and an
    #: identity map on already-finite data.
    scrub_nonfinite: bool = True


def clean(df: DataFrame, config: CleaningConfig) -> DataFrame:
    """P13 — the composite pipeline: timestamp → drop → [scrub] →
    dedup → fill (same order as ``cleaning.py:132-176``; the optional
    non-finite scrub slots first so dedup and fills already see
    finite-or-NULL values — a NaN row and its scrubbed NULL twin must
    collapse to one, and fillna must catch the scrubbed cells)."""
    from unicargo_medallion_data_pipeline_spark.operators.transforms import with_processed_timestamp

    if config.add_timestamp:
        df = with_processed_timestamp(df)
    if config.drop_columns:
        df = drop_columns_safe(df, config.drop_columns)
    if config.scrub_nonfinite:
        df = scrub_nonfinite(df)
    df = dedup(df, config.dedup_subset)
    return fill_nulls(
        df,
        per_column=config.fill_per_column,
        string_default=config.fill_string_default,
        numeric_default=config.fill_numeric_default,
    )
