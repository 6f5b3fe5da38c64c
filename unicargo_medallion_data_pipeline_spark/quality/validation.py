"""Data-quality gates (SURVEY §2.11 Q1-Q5).

Reference counterparts:
  - Q1 ``validate_data_quality``: ``src/data_quality/validate_data_quality.py:3-23``
    (fail on empty table; fail if any required column >5% null)
  - Q2 orphan-FK audit: ``...create_fact_flights.ipynb:435-444``
  - Q4 null profile: ``bronze_orchestrator.py:185-192``

Scale redesign (SURVEY §4 hazard 3): the reference issues one Spark job
per column (N+1 jobs over an uncached plan).  Every check here is a SINGLE
aggregation pass — count + per-column null counts in one job — which is
the difference between 1 scan and 30 scans of a 100 TB table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DataQualityError(RuntimeError):
    """Raised when a quality gate fails (reference raises bare Exception)."""


def null_profile(df: DataFrame, columns: list[str] | None = None) -> dict:
    """Q4 — row count + per-column null counts in ONE pass.

    Returns {"row_count": n, "null_counts": {col: n_nulls}}.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols
    ]
    # POSITIONAL access (round-10 quality hunt): by-name lookup returns
    # the FIRST matching field, so a user column literally named
    # '__rows' would shadow the count alias and read back as the row
    # count instead of its null count.  Positions are exact for any
    # column names.
    row = df.agg(*aggs).collect()[0]
    return {
        "row_count": row[0],
        "null_counts": {c: (row[i + 1] or 0) for i, c in enumerate(cols)},
    }


def validate_data_quality(
    df: DataFrame,
    table_name: str,
    required_columns: list[str],
    max_null_pct: float = 5.0,
) -> dict:
    """Q1 — fail on empty table or any required column over the null
    threshold.  One aggregation job total."""
    profile = null_profile(df, required_columns)
    rows = profile["row_count"]
    if rows == 0:
        raise DataQualityError(f"{table_name}: table is empty")
    failures = {
        c: 100.0 * n / rows
        for c, n in profile["null_counts"].items()
        if 100.0 * n / rows > max_null_pct
    }
    if failures:
        detail = ", ".join(f"{c}={pct:.2f}%" for c, pct in sorted(failures.items()))
        raise DataQualityError(
            f"{table_name}: null threshold {max_null_pct}% exceeded: {detail}"
        )
    return profile


def orphan_fk_counts(fact: DataFrame, dims: dict[str, tuple[DataFrame, str]]) -> dict[str, int]:
    """Q2 — for each FK, count fact rows with a NON-NULL key no dim row
    matches.  NULL FKs are excluded (SQL foreign-key semantics, the same
    contract as ``expectations.foreign_key`` — an anti-join counts them
    as orphans because ``NULL = key`` is never true, which would fire a
    permanent false alarm on any nullable FK); null-ness is a SEPARATE
    check (``null_profile`` / the ``not_null`` expectation).

    ``dims`` maps fk_col → (dim_df, dim_key_col).  Each check is a
    left-anti join on the key column only; no broadcast hint is forced —
    the planner broadcasts dims that fit autoBroadcastJoinThreshold and
    falls back to a shuffled anti-join for linear-growth dims at scale.
    """
    out: dict[str, int] = {}
    for fk, (dim, dim_key) in dims.items():
        non_null = fact.filter(F.col(fk).isNotNull())
        out[fk] = (
            non_null.join(
                dim.select(F.col(dim_key).alias("__k")),
                non_null[fk] == F.col("__k"),
                "left_anti",
            ).count()
        )
    return out
