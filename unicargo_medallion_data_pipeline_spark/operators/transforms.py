"""Projection/enrichment transforms (SURVEY §2.2 P12 and friends).

Reference counterpart: ``src/unikargo_utils/df_transform_utils.py:5-35``
(metadata map + processed_timestamp enrichment).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_processed_timestamp(df: DataFrame, col_name: str = "processed_timestamp") -> DataFrame:
    return df.withColumn(col_name, F.current_timestamp())


def with_metadata(df: DataFrame, metadata: dict[str, str], col_name: str = "metadata") -> DataFrame:
    """P12 — attach a map<string,string> metadata column built from literals
    (pipeline id, source system, layer...)."""
    pairs = list(chain.from_iterable((F.lit(k), F.lit(v)) for k, v in metadata.items()))
    return df.withColumn(col_name, F.create_map(*pairs))
