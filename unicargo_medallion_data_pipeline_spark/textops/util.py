"""Shared helpers for the textops surface."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Spread a narrow, CPU-dense computation across the cluster.

    The textops operators (MinHash, SimHash, LSH bucketing, BPE-ish
    tokenization) are hash-dense per-row maps: their cost is CPU, not IO.
    A small single-file parquet scan yields ONE input partition, which
    serializes all of that CPU on one core regardless of cluster size —
    measured 8× wall-time on the local harness.  This helper repartitions
    up to ``defaultParallelism`` only when the input has fewer partitions;
    on a real many-file lake scan (input splits ≥ cores) it is a no-op and
    adds no shuffle.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
