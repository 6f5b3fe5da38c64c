"""Gold queries, batch 6: pivot, cube grouping sets, exact percentiles.

Beyond-reference breadth (the reference's A2 builds pivot-style measures
by hand with when/otherwise ladders — ``03_gold_flight_analytics.ipynb:
178``): the engine also exposes the declarative forms Spark gives for
free, each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.functions.exact import DEC
from unicargo_medallion_data_pipeline_spark.plans.catalog import register
from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "order_priority_pivot",
    sql="""
    SELECT
      o_orderstatus,
      CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS "1-URGENT",
      CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS "2-HIGH",
      CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS "3-MEDIUM",
      CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS "4-NOT SPECIFIED",
      CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS "5-LOW"
    FROM orders
    GROUP BY o_orderstatus
    """,
    operators=("A2",),
)
def order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative pivot: status × priority counts.  The explicit values
    list matters at scale — without it Spark must run an extra distinct
    job AND the output schema becomes data-dependent."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _PRIORITIES)
    )


@register(
    "order_status_priority_cube",
    sql="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)::DOUBLE AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    operators=("A2", "A15"),
)
def order_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all four aggregation granularities in one
    pass (Spark plans a single Expand + hash aggregate — one shuffle,
    not four jobs)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
    )


@register(
    "order_value_percentiles",
    sql="""
    SELECT
      o_orderpriority,
      COUNT(*) AS n_orders,
      quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.95]) AS value_quartiles
    FROM orders
    GROUP BY o_orderpriority
    """,
    operators=("A5", "A12"),
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per priority (Spark ``percentile``
    ≡ DuckDB ``quantile_cont``, verified bitwise-identical: both
    interpolate lower + frac·(upper−lower) over the sorted doubles).

    Scale note: exact percentile sorts each group's values — fine for
    bounded group cardinality × moderate group size; unbounded-cardinality
    profiling at 100 TB should use approx_percentile (t-digest sketch,
    one pass, mergeable) and accept no external oracle."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.95))").alias(
            "value_quartiles"
        ),
    )
