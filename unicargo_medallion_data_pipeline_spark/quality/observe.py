"""Observation-based pipeline metrics: row counts and aggregates
collected as a side effect of the write action — zero extra scans.

The reference (and the engine's own earlier Q5 path) measures row-count
deltas by calling ``.count()`` before/after a write: at 100 TB that is a
SECOND full scan of the data purely for telemetry.  Spark's Observation
API attaches named aggregate expressions to the plan; the metrics are
computed inside the SAME job that materializes the data and delivered to
the driver when the action finishes.

Usage::

    obs, observed = observe_metrics(df, rows=F.count(F.lit(1)),
                                    null_keys=F.count_if(F.col("k").isNull()))
    observed.write.parquet(path)          # one job, metrics piggyback
    m = obs.get                           # {"rows": ..., "null_keys": ...}

Scale note: observed expressions must be aggregates WITHOUT distinct
(the partial values merge on the driver like any partial aggregate);
use approx_count_distinct / HLL for cardinality telemetry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observe_metrics(df: DataFrame, **metrics: Column) -> tuple[Observation, DataFrame]:
    """Attach named aggregate metrics to ``df``'s next action.

    Returns (observation, observed_df).  Read ``observation.get`` only
    AFTER an action ran on observed_df — it blocks until the metrics
    arrive.
    """
    if not metrics:
        raise ValueError("observe_metrics needs at least one named metric column")
    obs = Observation()
    named = [col.alias(name) for name, col in metrics.items()]
    return obs, df.observe(obs, *named)


def assert_observed_rows(observation: Observation, expected_min: int) -> int:
    """Row-floor gate over an already-fired observation: returns the
    observed row count, raising if the finished job produced fewer than
    ``expected_min`` rows (the Q1-style threshold gate, but measured for
    free inside the producing job)."""
    rows = observation.get.get("rows")
    if rows is None:
        raise ValueError("observation has no 'rows' metric — name one in observe_metrics")
    if rows < expected_min:
        raise ValueError(f"row-count gate failed: observed {rows} < floor {expected_min}")
    return rows
