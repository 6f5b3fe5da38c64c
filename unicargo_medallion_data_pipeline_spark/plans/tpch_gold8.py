"""Gold queries, batch 8: decorrelated min-lookup, ordered array
aggregation, unpivot/melt.

Beyond-reference breadth: the reference's notebooks never need a
per-group argmin ("which supplier ships this part cheapest"), ordered
list aggregation, or wide→long reshaping — but any analytics user
switching from a SQL warehouse hits all three in week one.  Each is
expressed in the single-shuffle Spark-first form, with the classic SQL
formulation (correlated subquery / ORDER BY inside an aggregate /
UNPIVOT) as the DuckDB oracle to prove the cross-paradigm equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from unicargo_medallion_data_pipeline_spark.functions.exact import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)
from unicargo_medallion_data_pipeline_spark.plans.catalog import register
from unicargo_medallion_data_pipeline_spark.sources.readers import load_table


@register(
    "cheapest_shipment_supplier",
    sql="""
    SELECT DISTINCT
      l.l_partkey,
      l.l_suppkey,
      s.s_name,
      l.l_extendedprice AS min_price
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    -- per-PART argmin needs a part: the correlated MIN over a NULL
    -- part key is empty while a window partition pools the NULL-key
    -- rows into one phantom part (r11 sweep)
    WHERE l.l_partkey IS NOT NULL
      AND l.l_extendedprice = (
      SELECT MIN(l2.l_extendedprice)
      FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
    )
    """,
    operators=("J4", "W5", "P11"),
)
def cheapest_shipment_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part argmin: the supplier(s) whose shipment hits the part's
    global minimum extended price (TPC-H Q2's min-supplycost shape on
    this corpus's tables — there is no partsupp, so lineitem is the
    part↔supplier link).

    The oracle states it the classic way — a correlated scalar subquery —
    which a SQL engine must decorrelate into an aggregate+join.  The
    Spark-first form skips the join entirely: one window ``min`` over
    ``l_partkey`` then an equality filter, i.e. ONE hash-partitioned
    shuffle of the narrow 3-column projection instead of two (groupBy-min
    plus a re-join of the fact to itself).  MIN over doubles is exact
    (no accumulation), so the equality filter and the hash compare are
    bitwise-safe.

    Scale: the window state per key is a single running min — no sort
    frame, no buffering (Spark plans a running-aggregate WindowExec over
    the partkey exchange).  The supplier join input is the post-filter
    winner set (≈|part| rows, orders of magnitude under the fact), so at
    100 TB AQE picks broadcast or a cheap shuffle join on the small side;
    no hint is hardcoded (supplier grows linearly with SF).
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .filter(F.col("l_partkey").isNotNull())
    )
    w = Window.partitionBy("l_partkey")
    winners = (
        li.withColumn("min_price", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("min_price"))
        .select("l_partkey", "l_suppkey", "min_price")
        .distinct()
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        winners.join(sup, winners["l_suppkey"] == sup["s_suppkey"])
        .select("l_partkey", "l_suppkey", "s_name", "min_price")
        # DISTINCT must cover the JOINED row like the oracle's — a
        # duplicated supplier row would otherwise double every winner
        # (r11 sweep); on clean data this dedup is a no-op
        .distinct()
    )


@register(
    "customer_order_dates",
    sql="""
    SELECT
      c.c_custkey,
      c.c_mktsegment,
      COUNT(*) AS n_orders,
      MIN(o.o_orderdate) AS first_order,
      MAX(o.o_orderdate) AS last_order,
      -- FILTER mirrors Spark's collect_list (skips NULL inputs), and
      -- the outer COALESCE mirrors array_join([]) = '': DuckDB returns
      -- NULL both for an all-filtered list() aggregate and for
      -- array_to_string([]) (r11 sweep, big-source seed)
      COALESCE(array_to_string(
        list_transform(
          list_slice(list(o.o_orderdate ORDER BY o.o_orderdate)
                       FILTER (WHERE o.o_orderdate IS NOT NULL), 1, 100),
          d -> strftime(d, '%Y-%m-%d %H:%M:%S')),
        ','), '') AS order_dates
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
    operators=("A13", "J4", "P1"),
)
def customer_order_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation: each customer's order-date history as a
    sorted, CAPPED array — the feature-engineering shape (event history
    per entity) that precedes sequence models.  Emitted as a
    comma-joined string column because the driver's correctness harness
    canonicalizes with pandas sort+hash, which rejects array cells
    (pinned by ``test_catalog_outputs_are_scalar_only``); the array
    stays an array inside the plan and is serialized only at the output
    projection.

    ``collect_list`` is order-nondeterministic under parallelism, so the
    engine sorts the collected array (``array_sort``) rather than relying
    on input order; the oracle's ``list(... ORDER BY ...)`` is the SQL
    equivalent.  Equal timestamps are literally identical values, so the
    sort is unambiguous and the hash compare exact.

    Scale: per-key state is the customer's own order list — bounded here
    (tens of orders), but the cap (``slice`` to 100) is the contract that
    keeps one hot key (a bot account with 10^8 events) from OOMing a
    task at 100 TB.  The cap is applied AFTER the sort, so it is a
    deterministic "first 100 by date", not an arbitrary subset.  One
    shuffle on the join key; the groupBy reuses the customer-key
    partitioning only if the join key matches — here it does
    (c_custkey), so Catalyst plans a single exchange for join + agg.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
            F.array_join(
                F.transform(
                    F.slice(F.array_sort(F.collect_list("o_orderdate")), 1, 100),
                    lambda d: F.date_format(d, "yyyy-MM-dd HH:mm:ss"),
                ),
                ",",
            ).alias("order_dates"),
        )
    )


@register(
    "order_measures_unpivot",
    sql=f"""
    WITH agg AS (
      SELECT
        o_orderstatus,
        CAST(COUNT(*) AS DOUBLE) AS n_orders,
        {sql_dsum("o_totalprice")} AS total_revenue,
        {sql_davg("o_totalprice")} AS avg_revenue
      FROM orders
      GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, measure, value
    FROM agg
    UNPIVOT (value FOR measure IN (n_orders, total_revenue, avg_revenue))
    """,
    operators=("A1", "A3", "P1"),
)
def order_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (melt): per-status measures pivoted into
    (status, measure, value) rows — the inverse of
    ``order_priority_pivot`` and the shape BI/charting layers consume.

    Spark's native ``DataFrame.unpivot`` (SQL ``UNPIVOT``) expresses it
    declaratively; the measure columns are cast to a common double type
    first (unpivot requires a least-common value type).  All three
    measures route through the exact-decimal helpers so the melted
    doubles hash-match DuckDB bitwise.

    Scale: unpivot is a zero-shuffle Expand over the (tiny) aggregate —
    row count multiplies by the measure count AFTER aggregation, never
    on the fact table."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        dsum("o_totalprice").alias("total_revenue"),
        davg("o_totalprice").alias("avg_revenue"),
    )
    return agg.unpivot(
        ["o_orderstatus"],
        ["n_orders", "total_revenue", "avg_revenue"],
        "measure",
        "value",
    )
