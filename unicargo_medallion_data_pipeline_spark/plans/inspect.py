"""Plan introspection: the exchange/scan census as a reusable utility.

The engine's scale discipline is enforced by reading physical plans —
docs/PLANS.md records a census per query batch, and tests/test_plans.py
pins the shapes.  This module makes that census a first-class API so
users (and future tests) can assert the same properties on their own
compositions::

    from unicargo_medallion_data_pipeline_spark.plans.inspect import plan_census
    c = plan_census(df)
    assert c["cartesian_products"] == 0
    assert c["keyed_exchanges"] <= 2

Counts come from ``explain("formatted")`` — stable across Spark
3.5/4.x renderings (same convention as the test suite).  ``scans``
counts PHYSICAL source scans (the formatted output lists each node in
both the tree and the detail section; this utility reports the
deduplicated number).
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_text(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_census(df: DataFrame) -> dict:
    """Count the scale-relevant operators in ``df``'s physical plan.

    Keys: ``keyed_exchanges`` (shuffles excluding broadcasts),
    ``broadcast_exchanges``, ``cartesian_products``,
    ``broadcast_nested_loop_joins`` (usually 1-row scalar broadcasts),
    ``scans`` (physical source scans), ``window_execs``,
    ``has_take_ordered`` (top-k without a global sort), and
    ``whole_stage_codegen_spans``.
    """
    p = plan_text(df)
    # Tree nodes are rendered as "Name (id)"; the detail section repeats
    # each as "(id) Name" — count tree form only for node tallies.
    return {
        "keyed_exchanges": p.count("Exchange (") - p.count("BroadcastExchange ("),
        "broadcast_exchanges": p.count("BroadcastExchange ("),
        "cartesian_products": p.count("CartesianProduct ("),
        "broadcast_nested_loop_joins": p.count("BroadcastNestedLoopJoin ("),
        # File-source scans only: checkpoint reads render as "Scan
        # ExistingRDD" and are deliberately excluded (they are the
        # evidence a pin WORKED, not a re-read of the lake).
        "scans": len(
            re.findall(
                r"^\(\d+\) Scan (?:parquet|orc|csv|json|text|binaryFile)",
                p,
                flags=re.M,
            )
        ),
        "window_execs": p.count("Window ("),
        "has_take_ordered": "TakeOrderedAndProject" in p,
        "whole_stage_codegen_spans": len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", p))
        ),
    }
