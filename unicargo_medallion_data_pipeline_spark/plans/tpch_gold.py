"""Gold-layer analytics over the driver's TPC-H-ish star schema.

Each query re-expresses a reference gold-notebook pattern (SURVEY §2.4-§2.6
ids cited per entry) on the driver's tables (orders/lineitem/customer/
supplier/nation/region/events), with an exactly-equivalent DuckDB oracle.

Determinism rules (see functions/exact.py): double sums go through
DECIMAL(18,2); averages/rates/stddev derive from exact sums with one final
IEEE division; top-k queries carry full tiebreak keys; date parts are cast
to INTEGER on the oracle side to match Spark's int32 outputs.

Scale notes: every aggregation here is a map-side-combinable hash agg; the
only full shuffles are on high-cardinality group keys, which AQE coalesces.
Broadcast policy: explicit ``F.broadcast`` hints are reserved for
fixed-cardinality dims (nation=25, region=5, generated date dims).
customer/supplier/part grow LINEARLY with SF (~3.5 GB at sf100, TBs at
100 TB) — a hard hint there overrides the size threshold and OOMs at
scale, so those joins carry no hint and the planner's
autoBroadcastJoinThreshold / AQE picks broadcast only while the table
actually fits (which it does at every oracle/bench SF; plan-asserted in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.functions.exact import (
    DEC,
    davg,
    dstddev_samp,
    dsum,
    rate_pct,
    sql_davg,
    sql_dstddev_samp,
    sql_dsum,
    sql_rate_pct,
)
from unicargo_medallion_data_pipeline_spark.plans.catalog import register
from unicargo_medallion_data_pipeline_spark.sources.readers import load_table


def _disc_price() -> F.Column:
    """l_extendedprice * (1 - l_discount) as an exact 4-decimal decimal."""
    return (F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC)))


_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape; reference A2/A3/A15 analogues)
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    sql=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_dsum('l_quantity')} AS sum_qty,
      {sql_dsum('l_extendedprice')} AS sum_base_price,
      CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(CAST({_SQL_DISC_PRICE} AS DECIMAL(18,4))
               * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
      {sql_davg('l_quantity')} AS avg_qty,
      {sql_davg('l_extendedprice')} AS avg_price,
      {sql_davg('l_discount')} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    operators=("A2", "A3", "A14", "A15", "P5", "P7"),
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (returnflag, linestatus) pricing rollup — the engine's flagship.

    Reference pattern: conditional/derived aggregation ladders of the gold
    notebooks (e.g. ``03_gold_flight_analytics.ipynb:173-181``) re-expressed
    on lineitem.  Single hash-agg over a pushed-down date filter.
    """
    li = load_table(spark, sf_dir, "lineitem")
    charge = (_disc_price().cast("decimal(18,4)") * (F.lit(1) + F.col("l_tax").cast(DEC))).cast(
        "decimal(27,6)"
    )
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# A7 scorecard: many aggregates per market segment (airline scorecard analog)
# ---------------------------------------------------------------------------

@register(
    "segment_scorecard",
    sql=f"""
    SELECT
      c.c_mktsegment,
      COUNT(*) AS total_orders,
      COUNT(DISTINCT o.o_custkey) AS unique_customers,
      {sql_dsum('o.o_totalprice')} AS total_revenue,
      {sql_davg('o.o_totalprice')} AS avg_order_value,
      MAX(o.o_totalprice) AS max_order_value,
      MIN(o.o_totalprice) AS min_order_value,
      {sql_rate_pct("o.o_orderstatus = 'F'")} AS fulfilled_rate_pct,
      {sql_rate_pct("o.o_orderpriority IN ('1-URGENT', '2-HIGH')")} AS urgent_rate_pct
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    operators=("A7", "A2", "A3", "J2", "J4", "P8"),
    bench=True,
)
def segment_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scorecard per market segment (reference: airline scorecard,
    ``03_gold_unikargo_02_airline_performance.ipynb:69-82``).

    customer grows linearly with SF, so the join carries no broadcast
    hint: the size threshold/AQE broadcasts it while it fits and falls
    back to a shuffle join beyond that; one hash-agg shuffle on the
    5-value segment key either way.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            F.countDistinct("o_custkey").alias("unique_customers"),
            dsum("o_totalprice").alias("total_revenue"),
            davg("o_totalprice").alias("avg_order_value"),
            F.max("o_totalprice").alias("max_order_value"),
            F.min("o_totalprice").alias("min_order_value"),
            rate_pct(F.col("o_orderstatus") == "F").alias("fulfilled_rate_pct"),
            rate_pct(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).alias("urgent_rate_pct"),
        )
    )


# ---------------------------------------------------------------------------
# A4 daily summary with conditional counts
# ---------------------------------------------------------------------------

@register(
    "daily_order_summary",
    sql=f"""
    SELECT
      CAST(o_orderdate AS DATE) AS order_date,
      COUNT(*) AS total_orders,
      {sql_davg('o_totalprice')} AS avg_order_value,
      {sql_dsum('o_totalprice')} AS daily_revenue,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
      CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_orders
    FROM orders
    GROUP BY CAST(o_orderdate AS DATE)
    """,
    operators=("A4", "A2", "P4", "P5"),
    bench=True,
)
def daily_order_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order rollup (reference: daily flight summary,
    ``03_gold_unikargo_01_daily_analytics.ipynb:68-79``)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("order_date", F.to_date("o_orderdate"))
        .groupBy("order_date")
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            davg("o_totalprice").alias("avg_order_value"),
            dsum("o_totalprice").alias("daily_revenue"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("fulfilled_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("open_orders"),
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias(
                "urgent_orders"
            ),
        )
    )


# ---------------------------------------------------------------------------
# A5 weekly aggregate with computed key + stddev
# ---------------------------------------------------------------------------

@register(
    "weekly_order_stats",
    sql=f"""
    SELECT
      CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_year,
      CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS week_of_year,
      o_orderpriority,
      COUNT(*) AS total_orders,
      MAX(o_totalprice) AS max_order_value,
      MIN(o_totalprice) AS min_order_value,
      {sql_dstddev_samp('o_totalprice')} AS stddev_order_value
    FROM orders
    GROUP BY 1, 2, 3
    """,
    operators=("A5", "P4"),
)
def weekly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly stats with expression group keys (reference:
    ``03_gold_unikargo_01_daily_analytics.ipynb:103-110``); stddev is the
    deterministic exact-sum formulation of ``F.stddev``."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return (
        o.groupBy(
            F.year(d).alias("order_year"),
            F.weekofyear(d).alias("week_of_year"),
            "o_orderpriority",
        ).agg(
            F.count(F.lit(1)).alias("total_orders"),
            F.max("o_totalprice").alias("max_order_value"),
            F.min("o_totalprice").alias("min_order_value"),
            dstddev_samp("o_totalprice").alias("stddev_order_value"),
        )
    )


# ---------------------------------------------------------------------------
# A6 monthly trends
# ---------------------------------------------------------------------------

@register(
    "monthly_order_trends",
    sql=f"""
    SELECT
      CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_year,
      CAST(month(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_month,
      o_orderpriority,
      COUNT(*) AS total_orders,
      {sql_davg('o_totalprice')} AS avg_order_value,
      {sql_dsum('o_totalprice')} AS total_revenue
    FROM orders
    GROUP BY 1, 2, 3
    """,
    operators=("A6",),
)
def monthly_order_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly trend rollup (reference:
    ``03_gold_unikargo_01_daily_analytics.ipynb:135-141``)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return (
        o.groupBy(F.year(d).alias("order_year"), F.month(d).alias("order_month"), "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            davg("o_totalprice").alias("avg_order_value"),
            dsum("o_totalprice").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# A1 + J3 + O3: nation-pair "routes" with role-playing dim joins and top-k
# ---------------------------------------------------------------------------

@register(
    "top_trade_routes",
    sql=f"""
    SELECT
      ns.n_name AS supp_nation,
      nc.n_name AS cust_nation,
      COUNT(*) AS total_shipments,
      COUNT(DISTINCT l.l_suppkey) AS unique_suppliers,
      COUNT(DISTINCT o.o_custkey) AS unique_customers,
      {sql_davg('l.l_quantity')} AS avg_quantity,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    GROUP BY ns.n_name, nc.n_name
    HAVING COUNT(*) >= 10
    ORDER BY total_revenue DESC, supp_nation ASC, cust_nation ASC
    LIMIT 10
    """,
    operators=("A1", "J1", "J3", "J4", "O1", "O3", "P7"),
    bench=True,
)
def top_trade_routes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 supplier-nation → customer-nation routes (reference: busiest
    routes with role-playing airport dim,
    ``03_gold_unikargo_03_route_analytics.ipynb:101-131``; significance
    floor at line 80 — scaled to ≥10 for the synthetic corpus' route
    cardinality; role-playing join ``...create_fact_flights.ipynb:262-300``).

    nation is joined twice under different roles via aliased selects.
    Only the fixed-25-row nation roles carry broadcast hints;
    supplier/customer grow linearly with SF so their joins are left to
    the size threshold/AQE (broadcast at oracle scale, shuffle beyond).
    The orderkey join and the final 16-ish-row agg are the only required
    shuffles.  Tie-broken ORDER BY keeps top-k hash-stable.

    The double countDistinct plans an ``Expand`` (×3 replicas into the
    agg shuffle).  Measured alternative — pre-aggregating at
    (route, l_suppkey, o_custkey) then re-aggregating — was bitwise
    equal but SLOWER (best-of-4 interleaved at sf0.1: 2.105s Expand vs
    2.177s two-phase), and shuffles more at scale: the triple's distinct
    cardinality (≤ shipments; every supplier×customer pair per route)
    dominates the Expand plan's per-column partials |route,supp| +
    |route,cust|, which map-side partial aggregation already dedups.
    Re-validated at the 10× (sf1.0-equivalent) point where the Expand
    multiplier dominates fixed overhead (round-11 verdict task 3,
    best-of-3 interleaved, probe spread 1.221): Expand 8.56s vs
    two-phase 13.67s — the gap WIDENS with data (1.04× → 1.60×), no
    crossover; the shuffle-volume argument above is what the
    measurement shows.  Expand is the right plan at this shape; kept.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    supp_nation = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_nation = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
    )
    return (
        joined.groupBy("supp_nation", "cust_nation")
        .agg(
            F.count(F.lit(1)).alias("total_shipments"),
            F.countDistinct("l_suppkey").alias("unique_suppliers"),
            F.countDistinct("o_custkey").alias("unique_customers"),
            davg("l_quantity").alias("avg_quantity"),
            F.sum(_disc_price()).cast("double").alias("total_revenue"),
        )
        .filter(F.col("total_shipments") >= 10)
        .orderBy(F.col("total_revenue").desc(), F.col("supp_nation"), F.col("cust_nation"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# W1 + J4: dimension build with deterministic surrogate keys
# ---------------------------------------------------------------------------

@register(
    "nation_dim",
    sql="""
    SELECT
      CAST(ROW_NUMBER() OVER (
        ORDER BY n.n_name NULLS LAST, r.r_name NULLS LAST,
                 n.n_nationkey NULLS LAST) AS INTEGER) AS nation_sk,
      n.n_name AS nation_name,
      r.r_name AS region_name
    FROM nation n
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    operators=("W1", "J4", "P1", "P3"),
)
def nation_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim build with row_number surrogate key (reference:
    ``02_silver_unicargo_create_dim_airlines.ipynb:99-105``).

    The unpartitioned Window.orderBy is single-partition by design — valid
    ONLY for dim-sized inputs (SURVEY §4 scale hazard 1); fact-sized keys
    use xxhash64 (see silver fact build)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # surrogate-key order is TOTAL over the emitted values (name, region,
    # natural key) with pinned NULL order — duplicate names must number
    # identically in both engines (r11 sweep, seed c)
    w = Window.orderBy(
        F.asc_nulls_last("n_name"),
        F.asc_nulls_last("r_name"),
        F.asc_nulls_last("n_nationkey"),
    )
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.row_number().over(w).alias("nation_sk"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


# ---------------------------------------------------------------------------
# W3: rolling 7-day average over pre-aggregated daily revenue
# ---------------------------------------------------------------------------

@register(
    "rolling_7day_revenue",
    sql=f"""
    WITH daily AS (
      SELECT
        o_orderpriority,
        CAST(o_orderdate AS DATE) AS order_date,
        SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders
      WHERE o_orderdate IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT
      o_orderpriority,
      order_date,
      CAST(rev_dec AS DOUBLE) AS daily_revenue,
      CAST(SUM(rev_dec) OVER w AS DOUBLE)
        / COUNT(*) OVER w AS rolling_7d_avg_revenue
    FROM daily
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY order_date
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    operators=("W3", "A4"),
    bench=True,
)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling average revenue per priority class (reference: rolling
    OTP, ``03_gold_unikargo_07_operational_efficiency_analytics.ipynb:98-108``).

    Pre-aggregating to one row per (priority, date) keeps the window state
    tiny and the frame deterministic; the rolling mean is a decimal frame
    sum divided by the frame count (exact)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()  # dated universe (r11 sweep)
    )
    daily = (
        o.groupBy("o_orderpriority", F.to_date("o_orderdate").alias("order_date"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("order_date")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "o_orderpriority",
        "order_date",
        F.col("rev_dec").cast("double").alias("daily_revenue"),
        (F.sum("rev_dec").over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "rolling_7d_avg_revenue"
        ),
    )


# ---------------------------------------------------------------------------
# A12 + W4: histogram buckets + share-of-total window
# ---------------------------------------------------------------------------

@register(
    "order_value_buckets",
    sql=f"""
    WITH bucketed AS (
      SELECT
        CASE
          WHEN o_totalprice <= 50000 THEN 'small'
          WHEN o_totalprice <= 150000 THEN 'medium'
          WHEN o_totalprice <= 300000 THEN 'large'
          ELSE 'jumbo'
        END AS value_bucket,
        o_totalprice
      FROM orders
    )
    SELECT
      value_bucket,
      COUNT(*) AS order_count,
      {sql_davg('o_totalprice')} AS avg_order_value,
      CAST(COUNT(*) AS DOUBLE) * 100.0
        / SUM(COUNT(*)) OVER () AS pct_of_all_orders
    FROM bucketed
    GROUP BY value_bucket
    """,
    operators=("A12", "W4", "P4"),
)
def order_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """When-ladder value buckets + share-of-total (reference: delay
    categories + pct, ``03_gold_unikargo_06_delay_analytics.ipynb:67-81``).

    The empty-partition window runs over the already-aggregated 4-row
    frame, so the single-partition warning is irrelevant at any scale."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") <= 50000, "small")
        .when(F.col("o_totalprice") <= 150000, "medium")
        .when(F.col("o_totalprice") <= 300000, "large")
        .otherwise("jumbo")
    )
    agg = (
        o.withColumn("value_bucket", bucket)
        .groupBy("value_bucket")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            davg("o_totalprice").alias("avg_order_value"),
        )
    )
    w = Window.partitionBy()
    return agg.select(
        "value_bucket",
        "order_count",
        "avg_order_value",
        (F.col("order_count").cast("double") * 100.0 / F.sum("order_count").over(w)).alias(
            "pct_of_all_orders"
        ),
    )


# ---------------------------------------------------------------------------
# J5 + Q2: orphan foreign-key audit via anti-joins
# ---------------------------------------------------------------------------

@register(
    "orphan_fk_audit",
    sql="""
    SELECT
      (SELECT COUNT(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        AS orphan_lineitem_orders,
      (SELECT COUNT(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        AS orphan_lineitem_part,
      (SELECT COUNT(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        AS orphan_orders_customer
    """,
    operators=("J5", "Q2", "A16"),
)
def orphan_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: count fact rows whose FK misses its dim
    (reference: ``...create_fact_flights.ipynb:435-444``).

    Expressed as three left-anti joins aggregated to single counts, then
    cross-joined into one row — fully lazy, no driver-side collects.
    part/customer grow linearly with SF, so the anti-joins carry no
    broadcast hint (the planner broadcasts while they fit)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    c = load_table(spark, sf_dir, "customer")
    a1 = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_lineitem_orders"))
    )
    a2 = (
        li.join(p, li.l_partkey == p.p_partkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_lineitem_part"))
    )
    a3 = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_orders_customer"))
    )
    return a1.crossJoin(a2).crossJoin(a3)


# ---------------------------------------------------------------------------
# A15 + A16: global (no-group) aggregate
# ---------------------------------------------------------------------------

@register(
    "global_order_stats",
    sql=f"""
    SELECT
      COUNT(*) AS total_orders,
      COUNT(DISTINCT o_custkey) AS unique_customers,
      MIN(CAST(o_orderdate AS DATE)) AS first_order_date,
      MAX(CAST(o_orderdate AS DATE)) AS last_order_date,
      {sql_dsum('o_totalprice')} AS lifetime_revenue
    FROM orders
    """,
    operators=("A15", "A16"),
)
def global_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global min/max/count aggregate (reference: date-range check,
    ``02_silver_unicargo_create_dim_date.ipynb`` cell 7)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("total_orders"),
        F.countDistinct("o_custkey").alias("unique_customers"),
        F.min(F.to_date("o_orderdate")).alias("first_order_date"),
        F.max(F.to_date("o_orderdate")).alias("last_order_date"),
        dsum("o_totalprice").alias("lifetime_revenue"),
    )


# ---------------------------------------------------------------------------
# A17 + Q4: single-pass per-column null profile
# ---------------------------------------------------------------------------

@register(
    "events_null_profile",
    sql="""
    SELECT
      COUNT(*) AS row_count,
      CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_id,
      CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
      CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
      CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
      CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
      CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props
    FROM events
    """,
    operators=("A17", "Q4", "P6"),
)
def events_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null profile in ONE pass (fixes the reference's N+1-job loop,
    ``bronze_orchestrator.py:186-192`` — SURVEY §4 scale hazard 3)."""
    ev = load_table(spark, sf_dir, "events")
    aggs = [F.count(F.lit(1)).alias("row_count")] + [
        F.sum(F.col(c).isNull().cast("int")).cast("long").alias(f"null_{c}")
        for c in ev.columns
    ]
    return ev.agg(*aggs)
