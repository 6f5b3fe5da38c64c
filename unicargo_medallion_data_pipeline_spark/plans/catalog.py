"""Query catalog: one named entry per implemented operator/query.

Each entry pairs the Spark DataFrame implementation with (where the
semantics are SQL-expressible) an equivalent ANSI-SQL string for the DuckDB
oracle.  The driver harness runs both at sf=0.01 and hash-compares values,
so Spark column aliases and SQL ``AS`` names must match exactly.

Entries tag which SURVEY.md §2 operators they exercise, so coverage can be
audited mechanically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle SQL; None → non-SQL-expressible (weaker check)
    operators: tuple[str, ...] = ()  # SURVEY §2 ids exercised, e.g. ("A2", "J4")
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


CATALOG: dict[str, Query] = {}


def register(
    name: str,
    sql: str | None,
    operators: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator adding a (spark_fn, oracle_sql) pair to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in CATALOG:
            raise ValueError(f"duplicate query name: {name}")
        CATALOG[name] = Query(
            name=name, fn=fn, sql=sql, operators=operators, bench=bench, doc=fn.__doc__ or ""
        )
        return fn

    return deco
