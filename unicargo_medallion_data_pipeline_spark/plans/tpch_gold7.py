"""Gold queries, batch 7: grouping sets, distribution windows, salted
distinct aggregation.

Beyond-reference breadth in the same spirit as ``tpch_gold6.py``: the
reference hand-rolls multi-grain summaries as separate notebook cells
(``03_gold_flight_analytics.ipynb`` builds per-airline and per-route
aggregates as independent queries); the engine exposes the declarative
multi-grain forms Spark evaluates in ONE pass, plus the skew-safe
distinct-count shape AQE cannot provide on its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from unicargo_medallion_data_pipeline_spark.functions.exact import dsum, sql_dsum
from unicargo_medallion_data_pipeline_spark.operators.skew import salted_join
from unicargo_medallion_data_pipeline_spark.plans.catalog import register
from unicargo_medallion_data_pipeline_spark.sources.readers import load_table


@register(
    "order_grouping_sets",
    sql=f"""
    SELECT
      o_orderstatus,
      o_orderpriority,
      CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      COUNT(*) AS n_orders,
      {sql_dsum("o_totalprice")} AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    operators=("A1", "A15"),
    bench=True,  # r8 verdict task 3: stateful/mutation/iterative bench anchors
)
def order_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two independent one-dimensional summaries (by status, by
    priority) computed in a single pass via GROUPING SETS — unlike
    ROLLUP/CUBE (``order_priority_rollup`` / ``order_status_priority_cube``)
    the sets here are NOT hierarchical, which is the case the declarative
    form uniquely covers: one scan + one Expand instead of two scans
    unioned.  ``grouping_id`` disambiguates which column each output row
    aggregates over (NULL group values are ambiguous when the data
    itself has NULLs).

    Scale: Expand doubles the scan's row stream BEFORE the shuffle, but
    partial aggregation collapses each grain to its group cardinality
    map-side — the shuffle carries |status| + |priority| rows per task,
    not 2× the fact table."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "revenue")
    )


@register(
    "customer_revenue_percentiles",
    sql=f"""
    WITH rev AS (
      SELECT
        c.c_mktsegment,
        c.c_custkey,
        {sql_dsum("o.o_totalprice")} AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_totalprice IS NOT NULL
      GROUP BY c.c_mktsegment, c.c_custkey
    )
    SELECT
      c_mktsegment,
      c_custkey,
      revenue,
      percent_rank() OVER w AS revenue_pct_rank,
      cume_dist() OVER w AS revenue_cume_dist
    FROM rev
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY revenue, c_custkey NULLS LAST)
    """,
    operators=("W5", "A1", "J2"),
)
def customer_revenue_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer revenue with its distribution position inside the
    market segment: ``percent_rank`` (relative rank in [0,1]) and
    ``cume_dist`` (fraction of segment at-or-below) — the remaining two
    members of the rank-function family (W5) not yet exercised by
    ``customer_value_tiers`` (dense_rank/ntile) or ``customer_order_gaps``
    (lag).

    The window orders by (revenue, c_custkey): the unique tiebreak makes
    both functions total and cross-engine deterministic (same contract
    as every ranked query in this engine).  Revenue is an exact decimal
    sum cast to double, so the ordering key is bitwise identical on both
    engines.

    Scale: one fact shuffle for the (segment, customer) aggregation,
    then a window partitioned by segment.  Segment cardinality is 5, so
    the window stage has bounded parallelism — at 100 TB swap in
    ``operators/ranks.global_row_number``'s range-exchange shape per
    segment if the per-segment row count exceeds one executor's sort
    budget (docs/SCALE.md); at any realistic customer cardinality a
    single sorted partition per segment is the right plan."""
    # priced universe + pinned NULL order: an all-NULL-price customer
    # would carry a NULL revenue into the rank ordering, where the
    # engines default to opposite NULL ends (r11 sweep, seed c)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    c = load_table(spark, sf_dir, "customer")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        "revenue", F.asc_nulls_last("c_custkey")
    )
    return rev.select(
        "c_mktsegment",
        "c_custkey",
        "revenue",
        F.percent_rank().over(w).alias("revenue_pct_rank"),
        F.cume_dist().over(w).alias("revenue_cume_dist"),
    )


@register(
    "nation_shipments_salted_join",
    sql=f"""
    SELECT
      s.s_nationkey,
      COUNT(*) AS n_shipments,
      {sql_dsum("l.l_extendedprice")} AS gross_revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
    operators=("J2", "A1"),
)
def nation_shipments_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation shipment volume computed through ``operators/skew.py``
    ``salted_join``: the fact side carries a deterministic row-value
    salt, the supplier dim is replicated salt-ways, and the join key
    becomes (suppkey, salt) — a hot supplier's rows fan out over
    ``buckets`` reducer partitions instead of pinning one.

    The oracle is the PLAIN join: salting must be row-identical to the
    unsalted plan, and the driver's hash check proves it on real data
    (the pytest in ``test_skew.py`` proves it on adversarial data).
    This is the skew case AQE does NOT cover — adaptive skew-join splits
    only sort-merge partitions at runtime, so a hash-partitioned or
    bucketed-table join with one 10^9-row key still hotspots; salting
    fixes the partition ASSIGNMENT itself, at the documented cost of
    buckets× the build side's shuffle/broadcast volume.

    (Per-key COUNT(DISTINCT) skew, by contrast, needs no manual rewrite:
    Catalyst's RewriteDistinctAggregates already dedups on
    (group key, distinct value) before counting — the salted two-phase
    variant measured one exchange WORSE than the native plan, so the
    engine showcases salting where it actually wins.)"""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, s, on=["l_suppkey"], buckets=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_shipments"),
        dsum("l_extendedprice").alias("gross_revenue"),
    )
