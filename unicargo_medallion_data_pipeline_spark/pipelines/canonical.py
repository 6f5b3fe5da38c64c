"""Materialized canonical universes — the lake-scale form of the pins.

``plans/universes.py`` defines the canonical identity universes (one
clean row per doc_id / vec_id) that every text-dedup and similarity
query shares.  In catalog/driver mode each query re-derives the
universe and pins it with an eager ``localCheckpoint`` — correct, but
the derivation (a key-partitioned dedup window over the raw table) is
re-paid per query.  At lake scale the right shape is a SILVER TABLE:
derive once per ingest batch, write parquet, and let every downstream
query scan the clean table with zero derivation cost.  This module is
that silver step.

Usage::

    from unicargo_medallion_data_pipeline_spark.pipelines import canonical
    canonical.materialize_canonical(spark, sf_dir, out_dir)  # once
    os.environ[canonical.CANONICAL_DIR_ENV] = out_dir        # consumers
    # every plans/universes.py consumer now scans the silver tables

The env-var switch keeps the driver contract untouched (the driver's
vanilla session never sets it, so catalog queries derive + pin exactly
as before); benchmarks and deployments opt in.  The caller owns the
correspondence between ``out_dir`` and the source ``sf_dir`` (same
discipline as every other path argument in the engine).

Scale notes: each materialization is ONE keyed shuffle per table (the
dedup window), amortized over every downstream query; the written
tables are id-clustered by that same shuffle, so downstream per-id
joins start from a sane layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Consumers read materialized universes from this directory when set.
CANONICAL_DIR_ENV = "SPARK_GRAFT_CANONICAL_DIR"

#: table name → un-pinned universe builder (plan only; no checkpoint).
_BUILDERS = {
    "documents_canonical": "docs_with_text_plan",
    "embeddings_canonical": "embeddings_valid_plan",
}


def build_documents_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents universe as a silver frame (un-pinned plan)."""
    from unicargo_medallion_data_pipeline_spark.plans import universes

    return universes.docs_with_text_plan(spark, sf_dir)


def build_embeddings_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings universe as a silver frame (un-pinned plan)."""
    from unicargo_medallion_data_pipeline_spark.plans import universes

    return universes.embeddings_valid_plan(spark, sf_dir)


def materialize_canonical(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, str]:
    """Write both canonical universes as parquet silver tables under
    ``out_dir``; returns table name → path.  One keyed shuffle each."""
    from unicargo_medallion_data_pipeline_spark.plans import universes

    os.makedirs(out_dir, exist_ok=True)
    out: dict[str, str] = {}
    for table, builder in _BUILDERS.items():
        path = os.path.join(out_dir, f"{table}.parquet")
        getattr(universes, builder)(spark, sf_dir).write.mode("overwrite").parquet(path)
        out[table] = path
    return out


def canonical_path(table: str) -> str | None:
    """Materialized parquet path for ``table`` if the env switch is set
    AND the table exists there, else None (consumers fall back to
    derive-and-pin)."""
    base = os.environ.get(CANONICAL_DIR_ENV)
    if not base:
        return None
    path = os.path.join(base, f"{table}.parquet")
    return path if os.path.exists(path) else None
