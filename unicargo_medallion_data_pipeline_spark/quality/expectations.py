"""Declarative expectation suites: a table contract (not-null, unique,
range, accepted values, foreign keys) evaluated in the MINIMUM number of
Spark jobs and returned as a report DataFrame.

Extends the single-check gates in ``quality/validation.py`` (Q1/Q2/Q4)
into the suite shape every warehouse-grade pipeline standardizes on
(dbt tests / Great Expectations / Deequ are the public references): the
contract is DATA, the evaluation is one engine pass.

Job budget — the scale contract:

* every ``not_null`` / ``in_range`` / ``accepted_values`` rule compiles
  to one aggregate expression; ALL of them run in a single job (one
  scan, map-side partial aggregation);
* each ``unique`` rule needs its own keyed aggregate (a distinct-count
  over the key grain) — one extra job per rule, still one scan each;
* each ``foreign_key`` rule is one left-anti count against its dim.

The reference's validator issues one job per column
(``src/data_quality/validate_data_quality.py:3-23``); at 30 rules over
a 100 TB table this suite runs 1 + |unique| + |fk| jobs instead of 30.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.quality.validation import DataQualityError

#: Report schema produced by :func:`run_suite`.
REPORT_COLS = ("rule", "target", "violations", "passed")


@dataclass(frozen=True)
class Expect:
    """One rule of a table contract."""

    kind: str  # not_null | unique | in_range | accepted_values | foreign_key
    column: str = ""
    columns: tuple[str, ...] = ()
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    dim: DataFrame | None = field(default=None, compare=False)
    dim_key: str = ""

    @property
    def target(self) -> str:
        return self.column or ",".join(self.columns)


def not_null(column: str) -> Expect:
    return Expect("not_null", column=column)


def unique(*columns: str) -> Expect:
    return Expect("unique", columns=tuple(columns))


def in_range(column: str, lo, hi) -> Expect:
    """Violated when value < lo or value > hi.  NULLs do not violate
    (pair with ``not_null`` to forbid them) — SQL three-valued logic."""
    return Expect("in_range", column=column, lo=lo, hi=hi)


def accepted_values(column: str, *values) -> Expect:
    """Violated when a non-null value is outside ``values``."""
    return Expect("accepted_values", column=column, values=tuple(values))


def foreign_key(column: str, dim: DataFrame, dim_key: str) -> Expect:
    """Violated when a non-null FK has no matching dim row."""
    return Expect("foreign_key", column=column, dim=dim, dim_key=dim_key)


def _scalar_expr(e: Expect):
    if e.kind == "not_null":
        return F.sum(F.col(e.column).isNull().cast("long"))
    if e.kind == "in_range":
        c = F.col(e.column)
        return F.sum(((c < F.lit(e.lo)) | (c > F.lit(e.hi))).cast("long"))
    if e.kind == "accepted_values":
        c = F.col(e.column)
        return F.sum((~c.isin(*e.values) & c.isNotNull()).cast("long"))
    raise AssertionError(e.kind)


def run_suite(
    df: DataFrame, suite: list[Expect], fail_fast: bool = False
) -> DataFrame:
    """Evaluate ``suite`` against ``df``; return one report row per rule
    (rule, target, violations, passed — deterministic suite order).

    ``fail_fast=True`` raises :class:`DataQualityError` naming every
    failed rule after the evaluation (all rules still run — a gate that
    stops at the first failure hides the rest of the damage from the
    incident report).
    """
    spark = SparkSession.getActiveSession() or df.sparkSession
    # Validate kinds UP FRONT: a misspelled kind would otherwise match no
    # dispatch branch and surface only as a bare KeyError while the
    # report is assembled — after every Spark job already ran — with no
    # mention of which rule was bad.
    known = ("not_null", "in_range", "accepted_values", "unique", "foreign_key")
    for i, e in enumerate(suite):
        if e.kind not in known:
            raise ValueError(
                f"unknown expectation kind {e.kind!r} at suite position {i} "
                f"(target {e.target!r}); known kinds: {', '.join(known)}"
            )
    # Keyed by POSITION, never by value: Expect compares structurally (dim
    # excluded), so duplicate rules — or two FK rules on the same column
    # against different dims — are equal and suite.index() would collapse
    # them onto one slot, leaving the other unevaluated.
    scalar = [
        (i, e)
        for i, e in enumerate(suite)
        if e.kind in ("not_null", "in_range", "accepted_values")
    ]
    rows: dict[int, tuple] = {}

    if scalar:
        agg_row = df.agg(
            *[_scalar_expr(e).alias(f"_r{i}") for i, e in scalar]
        ).collect()[0]
        for i, e in scalar:
            v = int(agg_row[f"_r{i}"] or 0)
            rows[i] = (e.kind, e.target, v, v == 0)

    for i, e in enumerate(suite):
        if e.kind == "unique":
            # violations = rows beyond the first per key (NULL keys form
            # groups too — duplicate NULL keys are duplicates).
            dup = (
                df.groupBy(*e.columns)
                .agg(F.count(F.lit(1)).alias("_c"))
                .agg(F.sum(F.col("_c") - 1))
                .collect()[0][0]
            )
            v = int(dup or 0)
            rows[i] = (e.kind, e.target, v, v == 0)
        elif e.kind == "foreign_key":
            v = (
                df.filter(F.col(e.column).isNotNull())
                .join(
                    e.dim.select(F.col(e.dim_key).alias("__k")).distinct(),
                    F.col(e.column) == F.col("__k"),
                    "left_anti",
                )
                .count()
            )
            rows[i] = (e.kind, e.target, v, v == 0)

    report = spark.createDataFrame(
        [rows[i] for i in range(len(suite))],
        "rule string, target string, violations bigint, passed boolean",
    )
    if fail_fast:
        failed = [rows[i] for i in range(len(suite)) if not rows[i][3]]
        if failed:
            detail = ", ".join(f"{k}({t})={v}" for k, t, v, _ in failed)
            raise DataQualityError(f"expectation suite failed: {detail}")
    return report
