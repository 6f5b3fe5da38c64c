"""Incremental fact processing (SURVEY §2.1 S12, §3.3).

Reference counterpart: ``src/incrementatl_processing/incremetal_flights.py:1-19``
— merge one date-partition of newly-arrived flights into the fact table
(``whenMatchedUpdateAll / whenNotMatchedInsertAll`` on the dedup key).

Engine form: re-run the silver cleanse + star join on ONLY the new slice,
then partition-scoped MERGE into the stored fact.  Because ``flight_sk``
is a deterministic hash of the business key (not
``monotonically_increasing_id``), re-processing the same day is
idempotent — the property the reference's key strategy lacks and the
whole reason incremental MERGE can be correct at all (SURVEY §7.4).

Scale shape: the incoming slice is typically one day of a partitioned
fact — the merge reads and rewrites only the touched ``flight_date``
partitions, never the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.pipelines import silver
from unicargo_medallion_data_pipeline_spark.sources.merge import merge_upsert_partitioned


def process_incremental_flights(
    spark: SparkSession,
    new_flights_raw: DataFrame,
    fact_path: str,
    dim_date: DataFrame,
    dim_airline: DataFrame,
    dim_airport: DataFrame,
    date_str: str | None = None,
) -> DataFrame:
    """Cleanse + conform a new raw-flights slice and MERGE it into the
    fact table at ``fact_path`` (parquet partitioned by flight_date, or a
    Delta table when delta-spark is present).

    ``date_str`` optionally restricts the slice to one day (the
    reference's calling convention); otherwise every date present in the
    batch is merged.  Returns the conformed increment.
    """
    clean = silver.clean_flights(new_flights_raw)
    if date_str is not None:
        clean = clean.filter(F.col("flight_date") == F.lit(date_str).cast("date"))
    increment = silver.build_fact_flight(clean, dim_date, dim_airline, dim_airport)
    merge_upsert_partitioned(
        spark,
        fact_path,
        increment,
        merge_keys=["flight_sk"],
        partition_col="flight_date",
    )
    return increment
