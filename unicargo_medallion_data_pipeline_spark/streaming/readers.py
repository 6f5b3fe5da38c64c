"""Streaming sources (SURVEY §2.1 S8-S9).

Reference counterpart: ``src/streaming/readers.py:11-94``
(``read_streaming_table`` / ``read_streaming_path`` with format/schema/
options pass-through).

Engine form: same two entry points on open-source Structured Streaming.
Format defaults to parquet (delta when available); schema is REQUIRED for
path sources (a streaming scan must not infer — new files arrive after
planning)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_streaming_table(
    spark: SparkSession,
    table: str,
    file_format: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """S8 — readStream from a catalog table."""
    reader = spark.readStream
    if file_format:
        reader = reader.format(file_format)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.table(table)


def read_streaming_path(
    spark: SparkSession,
    path: str,
    schema: StructType,
    file_format: str = "parquet",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """S9 — readStream from a path with an explicit schema.

    ``maxFilesPerTrigger`` in ``options`` bounds micro-batch size — the
    knob that keeps per-batch state bounded when backfilling a large
    directory."""
    reader = spark.readStream.format(file_format).schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)
