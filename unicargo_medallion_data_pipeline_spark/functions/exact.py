"""Deterministic numeric aggregation helpers.

Why this exists: floating-point SUM/AVG is summation-order dependent, and
Spark's partial aggregation order differs run-to-run and engine-to-engine.
The reference never worried about it (it eyeballs `.show()` output), but
this engine's correctness gate hash-compares values against a DuckDB oracle,
and at 100 TB the partial-agg tree is deep enough that naive double sums
drift in the last few ulps.

Policy: monetary/metric columns in the test corpus are 2-decimal values
stored as doubles, so every sum goes through ``DECIMAL(18,2)`` (exact,
overflow-safe: Spark widens the accumulator to DECIMAL(28,2)), and derived
stats (avg, stddev, rates) are computed from exact sums with a single final
IEEE-double division — bitwise deterministic on any engine, any parallelism.

This is also the *fast* path: decimal sums stay inside whole-stage codegen
with map-side partial aggregation; no UDFs, no extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Accumulator type for exact 2-decimal sums.
DEC = "decimal(18,2)"
#: Wider type for sums of squares (4 decimal places, bigger magnitude).
DEC4 = "decimal(28,4)"


def dsum(col: str | Column) -> Column:
    """Exact sum of a 2-decimal double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: str | Column) -> Column:
    """Deterministic average: exact decimal sum / non-null count (IEEE div)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def dstddev_samp(col: str | Column) -> Column:
    """Deterministic sample stddev from exact sums.

    stddev = sqrt((n*Σx² − (Σx)²) / (n·(n−1))); x has ≤2 decimals so x² has
    ≤4 and the decimal sums are exact; the final float ops are all IEEE
    deterministic.  NULL when n < 2 (matches ``F.stddev`` / SQL semantics).
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    sx = F.sum(c.cast(DEC)).cast("double")
    sxx = F.sum((c.cast(DEC) * c.cast(DEC)).cast(DEC4)).cast("double")
    var = (n * sxx - sx * sx) / (n * (n - F.lit(1.0)))
    # Guard tiny negative variance from the final float subtraction.
    return F.when(n >= 2, F.sqrt(F.greatest(var, F.lit(0.0)))).otherwise(F.lit(None))


def rate_pct(cond: Column, denom: Column | None = None) -> Column:
    """Percentage of rows satisfying ``cond`` (count_if/count — exact ints)."""
    num = F.sum(F.when(cond, 1).otherwise(0)).cast("double")
    d = denom if denom is not None else F.count(F.lit(1))
    return num * 100.0 / d


# --- DuckDB oracle SQL fragments mirroring the helpers above ---------------
# (kept next to the Python so the two stay in sync; used by plans/*.py)
#
# Decimal→double casts route through VARCHAR on the DuckDB side: DuckDB
# casts DECIMAL to DOUBLE as int→double followed by a divide by 10^scale
# (double rounding, observed 1-ulp-off on DECIMAL(28,4) sums), while
# Spark's Decimal.toDouble is correctly rounded.  VARCHAR→DOUBLE (strtod)
# is correctly rounded, making both engines agree bitwise.

def _d2d(expr: str) -> str:
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def sql_dsum(expr: str) -> str:
    return _d2d(f"SUM(CAST({expr} AS DECIMAL(18,2)))")


def sql_davg(expr: str) -> str:
    return f"{_d2d(f'SUM(CAST({expr} AS DECIMAL(18,2)))')} / COUNT({expr})"


def sql_dstddev_samp(expr: str) -> str:
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    sx = _d2d(f"SUM(CAST({expr} AS DECIMAL(18,2)))")
    sxx = _d2d(
        f"SUM(CAST(CAST({expr} AS DECIMAL(18,2)) * CAST({expr} AS DECIMAL(18,2)) "
        f"AS DECIMAL(28,4)))"
    )
    var = f"(({n}) * ({sxx}) - ({sx}) * ({sx})) / (({n}) * (({n}) - 1.0))"
    return f"CASE WHEN COUNT({expr}) >= 2 THEN SQRT(GREATEST({var}, 0.0)) ELSE NULL END"


def sql_rate_pct(cond: str, denom: str = "COUNT(*)") -> str:
    return f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS DOUBLE) * 100.0 / {denom}"


def exact_double(col: Column) -> Column:
    """Exact-decimal → double via a string cast — correctly rounded at
    ANY decimal width.

    A plain ``decimal → double`` cast is only correctly rounded when the
    engine converts through an arbitrary-precision path (Spark's
    BigDecimal.doubleValue).  Engines that store decimals as scaled
    int128 (DuckDB among them) convert as ``(double)unscaled / 10^scale``
    — two roundings — and drift 1-3 ulp from the correct value once the
    unscaled magnitude exceeds 2^53 (measured: -19399967019787510 →
    ...508e+16 there vs the correctly-rounded ...51e+16).  Routing
    through a string costs a few bytes per FINAL row only and is exact
    everywhere: decimal→string is exact digits, string→double is a
    correctly-rounded strtod/parseDouble in every engine.  Mirror in
    SQL as ``CAST(CAST(x AS VARCHAR) AS DOUBLE)``.
    """
    return col.cast("string").cast("double")
