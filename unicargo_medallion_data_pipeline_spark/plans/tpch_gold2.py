"""Gold queries, batch 2: time-bucketed analytics, windowed analytics,
set operations, dedup, and event-time operators (batch form).

SURVEY §2 coverage: A9-A14, W3-W5 extensions (lag/rank), O2, §2.7 set ops,
P10/P11 dedup, T6 event-time semantics expressed in batch (streaming
variants live in unicargo_medallion_data_pipeline_spark/streaming/)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.functions.exact import (
    DEC,
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)
from unicargo_medallion_data_pipeline_spark.plans.catalog import register
from unicargo_medallion_data_pipeline_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# A9: seasonal aggregation over a CASE-derived key
# ---------------------------------------------------------------------------

@register(
    "seasonal_order_agg",
    sql=f"""
    WITH seasoned AS (
      SELECT
        CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_year,
        CASE
          WHEN month(CAST(o_orderdate AS DATE)) IN (12, 1, 2) THEN 'Winter'
          WHEN month(CAST(o_orderdate AS DATE)) IN (3, 4, 5) THEN 'Spring'
          WHEN month(CAST(o_orderdate AS DATE)) IN (6, 7, 8) THEN 'Summer'
          ELSE 'Fall'
        END AS season,
        o_totalprice
      FROM orders
    )
    SELECT
      order_year,
      season,
      COUNT(*) AS total_orders,
      {sql_davg('o_totalprice')} AS avg_order_value,
      {sql_dsum('o_totalprice')} AS total_revenue
    FROM seasoned
    GROUP BY order_year, season
    """,
    operators=("A9", "P8", "O2"),
)
def seasonal_order_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Season bucket from month via when-chain + isin (reference:
    ``03_gold_unikargo_05_time_based_analytics.ipynb:67-86``)."""
    o = load_table(spark, sf_dir, "orders")
    m = F.month(F.to_date("o_orderdate"))
    season = (
        F.when(m.isin(12, 1, 2), "Winter")
        .when(m.isin(3, 4, 5), "Spring")
        .when(m.isin(6, 7, 8), "Summer")
        .otherwise("Fall")
    )
    return (
        o.select(
            F.year(F.to_date("o_orderdate")).alias("order_year"),
            season.alias("season"),
            "o_totalprice",
        )
        .groupBy("order_year", "season")
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            davg("o_totalprice").alias("avg_order_value"),
            dsum("o_totalprice").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# A10: weekend vs weekday split
# ---------------------------------------------------------------------------

@register(
    "weekend_vs_weekday_orders",
    sql=f"""
    WITH flagged AS (
      SELECT
        CASE WHEN dayname(CAST(o_orderdate AS DATE)) IN ('Saturday', 'Sunday')
             THEN 1 ELSE 0 END AS is_weekend,
        o_orderpriority,
        o_totalprice
      FROM orders
    )
    SELECT
      is_weekend,
      o_orderpriority,
      COUNT(*) AS total_orders,
      {sql_davg('o_totalprice')} AS avg_order_value,
      CASE WHEN is_weekend = 1 THEN 'Weekend' ELSE 'Weekday' END AS day_type
    FROM flagged
    GROUP BY is_weekend, o_orderpriority
    """,
    operators=("A10", "P4"),
)
def weekend_vs_weekday_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend/weekday comparison (reference:
    ``03_gold_unikargo_05_time_based_analytics.ipynb:108-118``).  Day names
    (not dayofweek ints) are used on both engines to sidestep the
    Sunday=1-vs-Monday=1 convention trap (SURVEY §7.4)."""
    o = load_table(spark, sf_dir, "orders")
    dayname = F.date_format(F.to_date("o_orderdate"), "EEEE")
    flagged = o.select(
        F.when(dayname.isin("Saturday", "Sunday"), 1).otherwise(0).alias("is_weekend"),
        "o_orderpriority",
        "o_totalprice",
    )
    return (
        flagged.groupBy("is_weekend", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            davg("o_totalprice").alias("avg_order_value"),
        )
        .withColumn(
            "day_type", F.when(F.col("is_weekend") == 1, "Weekend").otherwise("Weekday")
        )
    )


# ---------------------------------------------------------------------------
# A11: quarterly aggregation
# ---------------------------------------------------------------------------

@register(
    "quarterly_order_trends",
    sql=f"""
    SELECT
      CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_year,
      CAST(quarter(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_quarter,
      COUNT(*) AS total_orders,
      {sql_dsum('o_totalprice')} AS total_revenue,
      COUNT(DISTINCT o_custkey) AS active_customers
    FROM orders
    GROUP BY 1, 2
    """,
    operators=("A11",),
)
def quarterly_order_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarterly rollup (reference:
    ``03_gold_unikargo_05_time_based_analytics.ipynb:140-149``)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return (
        o.groupBy(F.year(d).alias("order_year"), F.quarter(d).alias("order_quarter"))
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            dsum("o_totalprice").alias("total_revenue"),
            F.countDistinct("o_custkey").alias("active_customers"),
        )
    )


# ---------------------------------------------------------------------------
# A13: two-level (nested) aggregation
# ---------------------------------------------------------------------------

@register(
    "customer_intensity_by_segment",
    sql="""
    WITH per_customer AS (
      SELECT c.c_mktsegment, o.o_custkey, COUNT(*) AS orders_per_customer
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, o.o_custkey
    )
    SELECT
      c_mktsegment,
      CAST(SUM(orders_per_customer) AS BIGINT) AS total_orders,
      COUNT(*) AS customers_with_orders,
      CAST(SUM(orders_per_customer) AS DOUBLE) / COUNT(*) AS avg_orders_per_customer,
      MAX(orders_per_customer) AS max_orders_per_customer
    FROM per_customer
    GROUP BY c_mktsegment
    """,
    operators=("A13", "J4"),
)
def customer_intensity_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level agg: per-customer order counts re-aggregated per segment
    (reference: flights/aircraft/day → per-airline,
    ``03_gold_unikargo_07_operational_efficiency_analytics.ipynb:68-77``).

    Both aggs partial-combine map-side; the second runs on the already
    customer-sized intermediate."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per_customer = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.count(F.lit(1)).alias("orders_per_customer"))
    )
    return per_customer.groupBy("c_mktsegment").agg(
        F.sum("orders_per_customer").alias("total_orders"),
        F.count(F.lit(1)).alias("customers_with_orders"),
        (F.sum("orders_per_customer").cast("double") / F.count(F.lit(1))).alias(
            "avg_orders_per_customer"
        ),
        F.max("orders_per_customer").alias("max_orders_per_customer"),
    )


# ---------------------------------------------------------------------------
# W5 (lag): per-customer order recency gaps
# ---------------------------------------------------------------------------

@register(
    "customer_order_gaps",
    sql="""
    WITH seq AS (
      SELECT
        o_custkey,
        CAST(o_orderdate AS DATE) AS order_date,
        o_orderkey,
        LAG(CAST(o_orderdate AS DATE)) OVER
          (PARTITION BY o_custkey
           ORDER BY CAST(o_orderdate AS DATE) NULLS LAST, o_orderkey NULLS LAST)
          AS prev_order_date
      FROM orders
    )
    SELECT
      o_custkey,
      order_date,
      o_orderkey,
      prev_order_date,
      CAST(date_diff('day', prev_order_date, order_date) AS INTEGER) AS days_since_prev_order
    FROM seq
    """,
    operators=("W5", "P4"),
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() recency analysis — an operator family the reference lacks
    (SURVEY §2.5 W5 'available free'), included for engine completeness.
    orderkey tiebreak makes the sequence deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last("order_date"), F.asc_nulls_last("o_orderkey")
    )  # pinned NULL order (r11 sweep)
    seq = o.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("order_date"),
        "o_orderkey",
    ).withColumn("prev_order_date", F.lag("order_date").over(w))
    return seq.withColumn(
        "days_since_prev_order", F.datediff("order_date", "prev_order_date")
    )


# ---------------------------------------------------------------------------
# W5 (row_number top-n per group): top customers per segment
# ---------------------------------------------------------------------------

@register(
    "top_customers_per_segment",
    sql=f"""
    WITH revenue AS (
      SELECT
        c.c_mktsegment,
        o.o_custkey,
        CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS customer_revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, o.o_custkey
    ),
    ranked AS (
      SELECT
        c_mktsegment, o_custkey, customer_revenue,
        CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
             ORDER BY customer_revenue DESC, o_custkey ASC) AS INTEGER) AS revenue_rank
      FROM revenue
    )
    SELECT * FROM ranked WHERE revenue_rank <= 5
    """,
    operators=("W5", "A1", "O3"),
)
def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 revenue customers per segment via partitioned row_number —
    the scalable form of per-group top-k (no global sort; W5 family)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    revenue = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("customer_revenue"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("customer_revenue").desc(), F.col("o_custkey").asc()
    )
    return (
        revenue.withColumn("revenue_rank", F.row_number().over(w))
        .filter(F.col("revenue_rank") <= 5)
    )


# ---------------------------------------------------------------------------
# §2.7 set operations: union / intersect / except
# ---------------------------------------------------------------------------

@register(
    "customer_cohort_set_ops",
    sql="""
    WITH c95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE year(CAST(o_orderdate AS DATE)) = 1995),
         c96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE year(CAST(o_orderdate AS DATE)) = 1996)
    SELECT 'retained' AS cohort, COUNT(*) AS n_customers
      FROM (SELECT * FROM c95 INTERSECT SELECT * FROM c96)
    UNION ALL
    SELECT 'churned' AS cohort, COUNT(*) AS n_customers
      FROM (SELECT * FROM c95 EXCEPT SELECT * FROM c96)
    UNION ALL
    SELECT 'either' AS cohort, COUNT(*) AS n_customers
      FROM (SELECT * FROM c95 UNION SELECT * FROM c96)
    """,
    operators=("P11",),
)
def customer_cohort_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT cohort analysis — absent from the
    reference (SURVEY §2.7), provided for engine completeness."""
    o = load_table(spark, sf_dir, "orders")
    yr = F.year(F.to_date("o_orderdate"))
    c95 = o.filter(yr == 1995).select("o_custkey").distinct()
    c96 = o.filter(yr == 1996).select("o_custkey").distinct()
    retained = c95.intersect(c96).agg(F.count(F.lit(1)).alias("n_customers")).select(
        F.lit("retained").alias("cohort"), "n_customers"
    )
    churned = c95.exceptAll(c96).distinct().agg(
        F.count(F.lit(1)).alias("n_customers")
    ).select(F.lit("churned").alias("cohort"), "n_customers")
    either = c95.union(c96).distinct().agg(F.count(F.lit(1)).alias("n_customers")).select(
        F.lit("either").alias("cohort"), "n_customers"
    )
    return retained.unionAll(churned).unionAll(either)


# ---------------------------------------------------------------------------
# P10: subset dedup with deterministic canonical row (window form)
# ---------------------------------------------------------------------------

@register(
    "first_lineitem_per_order",
    sql="""
    WITH ranked AS (
      SELECT
        l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
        CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
             ORDER BY l_linenumber NULLS LAST, l_partkey NULLS LAST,
                      l_suppkey NULLS LAST, l_quantity NULLS LAST)
             AS INTEGER) AS rn
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
    FROM ranked WHERE rn = 1
    """,
    operators=("P10", "W5"),
)
def first_lineitem_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic subset-dedup: keep ONE canonical row per key.

    The reference's ``dropDuplicates(subset)`` (``cleaning.py:60-87``,
    fact dedup ``...create_fact_flights.ipynb:65``) keeps an *arbitrary*
    row — fine for its pipeline, unacceptable for hash-compared results and
    for MERGE keys.  The engine's canonical form is row_number over an
    explicit tiebreak order, filtered to rn=1 (one shuffle on the key, no
    global sort).  The tiebreak must be a TOTAL order over the projected
    columns — the synthetic corpus repeats l_linenumber within an order."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.asc_nulls_last("l_linenumber"),
        F.asc_nulls_last("l_partkey"),
        F.asc_nulls_last("l_suppkey"),
        F.asc_nulls_last("l_quantity"),
    )  # pinned NULL order (r11 sweep)
    return (
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# P11: exact distinct
# ---------------------------------------------------------------------------

@register(
    "distinct_order_profiles",
    sql="""
    SELECT DISTINCT o_orderstatus, o_orderpriority,
           year(CAST(o_orderdate AS DATE)) IS NOT NULL AS has_date
    FROM orders
    """,
    operators=("P11", "P6"),
)
def distinct_order_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct over a projection (reference: distinct key counts,
    ``...create_fact_flights.ipynb`` cell 22)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderstatus",
        "o_orderpriority",
        F.year(F.to_date("o_orderdate")).isNotNull().alias("has_date"),
    ).distinct()


# ---------------------------------------------------------------------------
# §2.8 scalar-function showcase
# ---------------------------------------------------------------------------

@register(
    "order_id_formatting",
    sql="""
    SELECT
      o_orderkey,
      -- || not concat(): DuckDB's concat() treats NULL as '' while
      -- Spark's returns NULL; || propagates NULL like Spark (r11 sweep)
      'ORD-' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS order_code,
      strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date_str,
      upper(o_orderpriority) AS priority_upper,
      substring(o_orderpriority, 1, 1) AS priority_digit,
      CAST(length(o_orderpriority) AS INTEGER) AS priority_len,
      concat_ws('|', o_orderstatus, o_orderpriority) AS status_priority
    FROM orders
    """,
    operators=("P4", "P5"),
)
def order_id_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date scalar functions: concat, lpad, date_format, upper,
    substring, length, concat_ws (reference: zero-padded date key build,
    ``...create_fact_flights.ipynb:51-57``)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.concat(F.lit("ORD-"), F.lpad(F.col("o_orderkey").cast("string"), 12, "0")).alias(
            "order_code"
        ),
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("order_date_str"),
        F.upper("o_orderpriority").alias("priority_upper"),
        F.substring("o_orderpriority", 1, 1).alias("priority_digit"),
        F.length("o_orderpriority").alias("priority_len"),
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("status_priority"),
    )


# ---------------------------------------------------------------------------
# T6 (batch form): tumbling event-time windows
# ---------------------------------------------------------------------------

@register(
    "events_tumbling_5min",
    sql=f"""
    SELECT
      CAST(to_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300) AS TIMESTAMP)
        AS window_start,
      event_type,
      COUNT(*) AS n_events,
      {sql_dsum('value')} AS total_value,
      COUNT(DISTINCT user_id) AS unique_users
    FROM events
    GROUP BY 1, 2
    """,
    operators=("T6", "A4"),
    bench=True,
)
def events_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute event-time windows, batch form (the streaming
    variant with watermark lives in unicargo_medallion_data_pipeline_spark/streaming/windows.py;
    reference gap T6).  Bucket start is floor(epoch/300)*300 — expressed
    identically on both engines rather than via F.window so the oracle
    matches bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.floor(F.unix_timestamp("ts") / 300) * 300).cast("timestamp")
    return (
        ev.groupBy(bucket.alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
            F.countDistinct("user_id").alias("unique_users"),
        )
    )


# ---------------------------------------------------------------------------
# T6 (batch form): sessionization with a 30-minute inactivity gap
# ---------------------------------------------------------------------------

@register(
    "events_sessionization",
    sql=f"""
    WITH seq AS (
      SELECT
        user_id, ts, event_id, value,
        -- floor(epoch) = whole-second truncation, matching Spark's
        -- unix_timestamp (CAST would round in DuckDB)
        CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(LAG(ts) OVER
               (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
             OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS is_session_start
      FROM events WHERE ts IS NOT NULL
    ),
    sessions AS (
      SELECT
        user_id, ts, event_id, value,
        CAST(SUM(is_session_start) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      FROM seq
    )
    SELECT
      user_id,
      session_seq,
      COUNT(*) AS n_events,
      MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS session_start_epoch,
      MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS session_end_epoch,
      {sql_dsum('value')} AS session_value
    FROM sessions
    GROUP BY user_id, session_seq
    """,
    operators=("T6", "W5", "A13"),
    bench=True,  # r8 verdict task 3: stateful/mutation/iterative bench anchors
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min), batch form: lag → session-start
    flags → running sum → per-session rollup.  This is the deterministic
    batch mirror of session_window streaming (reference gap T6).

    Scale: one shuffle on user_id; window state is per-user sequential —
    exactly how Spark distributes it on a cluster.  Universe: timed
    events only — sessionization is undefined without an event time,
    exactly like its streaming twin behind the watermark (r11 sweep)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    prev_epoch = F.lag(epoch).over(w)
    seq = ev.select("user_id", "ts", "event_id", "value").withColumn(
        "is_session_start",
        F.when(prev_epoch.isNull() | ((epoch - prev_epoch) > 1800), 1).otherwise(0),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = seq.withColumn("session_seq", F.sum("is_session_start").over(wsum))
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_timestamp("ts")).alias("session_start_epoch"),
        F.max(F.unix_timestamp("ts")).alias("session_end_epoch"),
        dsum("value").alias("session_value"),
    )
