"""Surrogate-key generation, redesigned for determinism and scale.

The reference uses two key strategies that both fail at 100 TB (SURVEY §4
scale hazards 1-2):

* dims: ``row_number().over(Window.orderBy(...))`` — single-partition sort
  (``02_silver_unicargo_create_dim_airlines.ipynb:103``); acceptable only
  because dims are tiny.
* fact: ``monotonically_increasing_id()`` — partition-dependent and
  different on every run (``...create_fact_flights.ipynb:318``), so reruns,
  MERGE keys, and oracle comparisons all break.

Engine policy:

* ``dim_surrogate_key`` keeps the reference's dense, ordered semantics for
  *dim-sized* inputs (documented single-partition window).
* ``fact_hash_key`` derives a deterministic 64-bit key from the business
  key via ``xxhash64`` — pure map-side, no shuffle, stable across runs and
  partitionings; this is the only strategy that survives a 1000-executor
  rerun with identical output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dim_surrogate_key(
    df: DataFrame, order_by: list[str], key_name: str
) -> DataFrame:
    """Dense 1-based surrogate key for dimension tables.

    Deterministic given the natural-key order.  Single-partition by
    construction — only for dim-sized tables (≤ a few million rows); fact
    tables must use ``fact_hash_key``.
    """
    w = Window.orderBy(*order_by)
    return df.withColumn(key_name, F.row_number().over(w))


def fact_hash_key(business_key_cols: list[str | Column]) -> Column:
    """Deterministic 64-bit fact key: xxhash64 over the business key.

    Collision odds for N rows ≈ N²/2⁶⁵ — ≈ 2.7e-4 for 1e8 rows of one
    daily partition (the dedup granularity the key is derived at), i.e.
    ~10% over a year of such partitions: acceptable for surrogate-key
    dedup within a partition, NOT a global uniqueness guarantee — pair
    with the business key where absolute uniqueness matters.  Stable
    across runs/partitionings, computed map-side with zero shuffle.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in business_key_cols]
    return F.xxhash64(*cols)
