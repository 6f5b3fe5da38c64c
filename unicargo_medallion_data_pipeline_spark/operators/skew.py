"""Skew mitigation for hot keys (100 TB design surface).

What AQE already covers: skewed SORT-MERGE JOIN partitions are split at
runtime (`spark.sql.adaptive.skewJoin`), and algebraic aggregates
partial-aggregate map-side, so a hot group key mostly collapses before
the shuffle.  What it does NOT cover:

  - a broadcast-ineligible join where one side's key distribution has a
    few extreme keys AND the join is hash-partitioned (salting spreads
    the hot key's rows over N reducer partitions).

(Single per-key COUNT(DISTINCT x) is NOT such a case: Catalyst's
RewriteDistinctAggregates dedups on (key, x) first, which spreads a hot
key by its distinct values — plan-pinned in test_plans.py.  The salted
two-phase below measured one exchange WORSE than that native plan; it
remains for compositions the rewrite handles badly, e.g. several
distinct aggregates in one pass, where the native plan Expands the scan
N ways.)

``salted_join`` implements the classic pattern declaratively: the skewed
(big) side gets a deterministic salt in [0, N); the build (small-ish but
not broadcastable) side is replicated N ways via an explode — the join
key becomes (key, salt), so the hot key fans out over N partitions.
Results are row-identical to the unsalted join (verified in tests);
cost is N× the build side's shuffle volume, so pick N ≈ the skew factor,
not more.

``salted_two_phase_distinct`` does per-key COUNT(DISTINCT x) in two
keyed aggregations — (key, salt-by-x) partial distinct, then merge — so
no single reducer ever holds a hot key's full distinct set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic row salt in [0, buckets): xxhash64 of the full row —
    a pure function of row VALUES, so it is stable across reruns AND task
    retries.  (An earlier variant mixed ``monotonically_increasing_id``
    into the hash to spread byte-identical duplicates; that id depends on
    partition order, and when the upstream is itself a shuffle output a
    retried task can see a different order and re-salt rows BETWEEN
    attempts — the SPARK-23207 class of silent duplicate/loss.  A salt
    that routes rows into a shuffle must never depend on scan order.)

    Known limitation: byte-identical duplicate rows share a bucket, so a
    hot key whose rows are FULL-ROW duplicates still hotspots.  If that
    is your data, add a genuinely distinguishing column upstream (an
    event id, or file+offset captured AT THE SCAN where order is frozen)
    before salting — only the caller knows which source column is stable
    under retries.  Unhashable (map/variant) columns are excluded from
    the hash (they fail analysis in Spark's hash family — r9 hunt), so
    rows differing only in one extend the duplicate-rows limitation
    above; the salt stays deterministic either way."""
    if col_name in df.columns:
        raise ValueError(
            f"salt column {col_name!r} already exists on the input — "
            "withColumn would silently overwrite it"
        )
    from unicargo_medallion_data_pipeline_spark.functions.hashing import row_hash

    return df.withColumn(
        col_name, F.pmod(row_hash(df), F.lit(buckets)).cast("int")
    )


def salted_join(
    skewed: DataFrame,
    build: DataFrame,
    on: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys on the ``skewed`` side.

    The skewed side is salted deterministically; the build side is
    replicated ``buckets`` ways (explode of a literal range — narrow, no
    shuffle of its own).  Output columns match ``skewed.join(build, on,
    how)`` exactly.  Only inner/left are valid — replicating the build
    side would duplicate its unmatched rows under right/full semantics.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if "_salt" in build.columns:
        raise ValueError(
            "build side already has a '_salt' column — rename it first"
        )
    salted = with_salt(skewed, buckets)  # raises if skewed carries '_salt'
    replicated = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = salted.join(replicated, [*on, "_salt"], how)
    return out.drop("_salt")


def salted_two_phase_distinct(
    df: DataFrame,
    key: str,
    distinct_col: str,
    buckets: int = 16,
    out_col: str | None = None,
) -> DataFrame:
    """Per-key exact COUNT(DISTINCT distinct_col) without a hot-key
    reducer: phase 1 groups by (key, hash(distinct_col) % buckets) and
    collects partial distinct counts; phase 2 sums the partials.

    Correct because the bucketing partitions the DISTINCT VALUE space —
    each distinct value counts in exactly one bucket.
    """
    out_col = out_col or f"n_distinct_{distinct_col}"
    bucket = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(buckets))
    partial = (
        df.groupBy(F.col(key), bucket.alias("_bucket"))
        .agg(F.countDistinct(distinct_col).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(out_col))
