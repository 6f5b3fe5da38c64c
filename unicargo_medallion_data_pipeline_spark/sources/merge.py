"""Batch upsert (MERGE) — SURVEY §2.1 S12.

Reference counterpart: ``src/incrementatl_processing/incremetal_flights.py:1-19``
(``DeltaTable.forPath(...).merge(new, cond).whenMatchedUpdateAll()
.whenNotMatchedInsertAll().execute()``).

Two paths:

* Delta available → native ``MERGE`` (transactional, file-pruned).
* Parquet fallback → **partition-scoped rewrite**: only the partitions
  present in the incoming batch are read back, merged (new rows win), and
  rewritten with dynamic partition overwrite.  This is the classic
  pre-Delta upsert pattern and the reason the engine requires upserted
  tables to be partitioned: at 100 TB you rewrite the touched day-
  partitions, never the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.sources.writers import delta_available


def merge_upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    merge_keys: list[str],
    partition_col: str,
    file_format: str | None = None,
) -> None:
    """Upsert ``updates`` into the table at ``target_path``.

    Semantics = Delta MERGE whenMatchedUpdateAll/whenNotMatchedInsertAll,
    with updates winning on key collision.  The parquet fallback touches
    only the partitions present in ``updates``.
    """
    fmt = file_format or ("delta" if delta_available() else "parquet")
    if fmt == "delta":
        from delta.tables import DeltaTable

        target = DeltaTable.forPath(spark, target_path)
        cond = " AND ".join(f"existing.{k} = updates.{k}" for k in merge_keys)
        (
            target.alias("existing")
            .merge(updates.alias("updates"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return

    # Parquet path: partition-scoped read-merge-rewrite.
    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    existing = (
        spark.read.parquet(target_path).filter(F.col(partition_col).isin(parts))
    )
    # new rows win: anti-join existing on the merge keys, then union
    survivors = existing.join(
        updates.select(*merge_keys).distinct(), merge_keys, "left_anti"
    )
    merged = survivors.unionByName(updates.select(*existing.columns))
    # Spark cannot overwrite a path it is reading from: stage the merged
    # partitions to a scratch dir first (they are only the touched
    # partitions, not the table), then dynamic-overwrite the target.
    import tempfile

    staging = tempfile.mkdtemp(prefix="merge_staging_")
    merged.write.mode("overwrite").parquet(staging)
    staged = spark.read.parquet(staging)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        staged.write.mode("overwrite")
        .format("parquet")
        .partitionBy(partition_col)
        .save(target_path)
    )
