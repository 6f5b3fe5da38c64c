"""Continuous-aggregate maintenance: additive merge of a pre-aggregated
increment into a materialized rollup table (the batch analog of a
hypertable continuous aggregate / materialized-view refresh).

``events_hourly_rollup`` shows the READ side of the pattern (coarse
grains re-aggregate from the fine grain).  This operator is the WRITE
side: the fine-grain rollup is materialized once, and each new slice of
raw data folds in as ``new_value = combine(old_value, delta_value)`` —
no recompute over history.

Only MERGEABLE aggregates may live in such a table:

  - ``sum`` / counts  → combine with ``+``   (counts are sums of 1s)
  - ``min`` / ``max`` → combine with least / greatest

Non-mergeable aggregates (exact COUNT DISTINCT, exact percentiles) must
be recomputed from raw or replaced by mergeable sketches
(``approx_count_distinct`` HLL, t-digest) — same rule
``events_hourly_rollup`` documents for its grain hierarchy.

Scale shape: identical to ``sources/merge.py`` — the increment's touched
partitions (bounded, collected with a cap) are read back, combined with
ONE keyed aggregation over (existing ∪ delta), and dynamically
overwritten; untouched partitions are never read.  State per refresh is
O(touched partitions), not O(table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: measure name -> (combine aggregate over the unioned rows)
_COMBINERS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def merge_additive_rollup(
    spark: SparkSession,
    target_path: str,
    delta: DataFrame,
    keys: list[str],
    measures: dict[str, str],
    partition_col: str,
    max_touched_partitions: int = 1024,
) -> None:
    """Fold a pre-aggregated increment into the rollup at ``target_path``.

    ``delta`` has columns ``keys + measures`` and is already aggregated to
    the rollup grain (one row per key tuple).  ``measures`` maps each
    measure column to its combine rule: ``"sum"`` | ``"min"`` | ``"max"``.
    ``partition_col`` must be one of ``keys`` (the grain's time bucket,
    typically) — it scopes which stored partitions are touched.
    """
    unknown = {m for m in measures.values() if m not in _COMBINERS}
    if unknown:
        raise ValueError(f"unsupported combine rules: {sorted(unknown)}")
    if partition_col not in keys:
        raise ValueError("partition_col must be part of the rollup key")

    cols = [*keys, *measures]
    from pyspark.errors import AnalysisException

    try:
        existing_all = spark.read.parquet(target_path)
    except AnalysisException:
        (
            delta.select(*cols)
            .write.mode("overwrite")
            .format("parquet")
            .partitionBy(partition_col)
            .save(target_path)
        )
        return

    part_rows = (
        delta.select(partition_col)
        .distinct()
        .limit(max_touched_partitions + 1)
        .collect()
    )
    if len(part_rows) > max_touched_partitions:
        raise ValueError(
            f"increment touches > {max_touched_partitions} distinct "
            f"'{partition_col}' partitions; refresh in smaller slices or "
            "raise max_touched_partitions explicitly"
        )
    parts = [r[0] for r in part_rows]
    if any(p is None for p in parts):
        raise ValueError(f"increment contains NULL '{partition_col}' values")

    existing = existing_all.filter(F.col(partition_col).isin(parts)).select(*cols)
    combined = (
        existing.unionByName(delta.select(*cols))
        .groupBy(*keys)
        .agg(
            *[
                _COMBINERS[rule](F.col(m)).alias(m)
                for m, rule in measures.items()
            ]
        )
    )

    # Staging is a sibling of the target on the same filesystem (see
    # sources/staging.py) — a driver-local tempdir would only work in
    # local mode, at odds with this module's scale framing.
    from unicargo_medallion_data_pipeline_spark.sources.staging import (
        remove_path,
        staging_path,
    )

    staging = staging_path(target_path, "rollup")
    prior = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    try:
        combined.write.mode("overwrite").parquet(staging)
        staged = spark.read.parquet(staging)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            staged.write.mode("overwrite")
            .format("parquet")
            .partitionBy(partition_col)
            .save(target_path)
        )
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prior)
        remove_path(spark, staging)
