"""Mergeable heavy-hitters summaries (weighted Misra–Gries).

Spark's hash aggregation with map-side combine is the right heavy-hitter
path whenever the DISTINCT KEY SET fits in executor memory — partials
stay small and the shuffle carries one row per key.  The regime this
operator exists for is the other one: key cardinality itself is
unbounded (URLs, user agents, raw n-grams at lake scale), where even the
per-partition hash table is the thing that OOMs.  Misra–Gries caps the
summary at a fixed ``capacity`` counters per partition with the classic
guarantee: every item with true frequency > N/(capacity+1) survives, and
each reported count is a LOWER bound within N/(capacity+1) of truth.

Summaries merge by plain counter addition (errors add), so the reduce
side is an ordinary ``groupBy(item).sum`` over ≤ capacity × partitions
rows — constant memory per task end to end.

Exactness escape hatch: when per-partition distinct ≤ capacity, no
decrements ever fire and the summary IS the exact count — which is what
the catalog query relies on for its bitwise oracle (31-token vocabulary
vs capacity 64), while the pytest suite exercises the approximate regime
adversarially.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_add(counters: dict, item, weight: int, capacity: int) -> None:
    """Weighted Misra–Gries insert: decrement-all on overflow.

    Adding an item with weight w is equivalent to w unit inserts; the
    decrement step removes min(w, current-min) from every counter at
    once, preserving the invariant that total decremented mass is
    ≤ N/(capacity+1).
    """
    if item in counters:
        counters[item] += weight
        return
    while weight > 0:
        if len(counters) < capacity:
            counters[item] = weight
            return
        d = min(weight, min(counters.values()))
        for k in list(counters):
            counters[k] -= d
            if counters[k] == 0:
                del counters[k]
        weight -= d
    # weight fully absorbed by decrements; item not retained


def misra_gries_summaries(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition weighted Misra–Gries summaries of ``col``.

    Returns (item string, count_lb long) with ≤ ``capacity`` rows per
    input partition.  Arrow-batched: each batch is pre-reduced with a
    vectorized ``value_counts`` and only the ≤|batch distinct| weighted
    survivors touch the Python dict — the per-row hot path stays in C.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for item, w in pdf[col].dropna().value_counts().items():
                _mg_add(counters, item, int(w), capacity)
        yield pd.DataFrame(
            {"item": list(counters.keys()), "count_lb": list(counters.values())}
        )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, "item string, count_lb long"
    )


def heavy_hitters(df: DataFrame, col: str, k: int, capacity: int = 1024) -> DataFrame:
    """Top-k heavy hitters of ``col`` with Misra–Gries lower-bound counts.

    Merge is counter addition (groupBy + sum over the ≤ capacity ×
    n_partitions summary rows), then a tie-broken top-k.  Guarantees
    (N = total rows): any item with true count > N/(capacity+1) appears;
    ``count_lb`` ≤ true count ≤ ``count_lb`` + N/(capacity+1).  Exact
    whenever every partition's distinct count ≤ capacity.
    """
    merged = (
        misra_gries_summaries(df, col, capacity)
        .groupBy("item")
        .agg(F.sum("count_lb").alias("count_lb"))
    )
    return merged.orderBy(F.col("count_lb").desc(), "item").limit(k)
