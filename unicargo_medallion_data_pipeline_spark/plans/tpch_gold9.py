"""Gold queries, batch 9: graph triangles, calendar gap-fill, the SQL
front door, and statistical outlier detection.

Four analytics shapes the earlier batches don't exercise:

* triangle counting — the classic "join the edge list to itself twice"
  graph motif, all-integer so it hash-verifies bitwise;
* calendar spine gap-fill — generate a dense date spine and left-join
  facts onto it so missing days surface as explicit zeros (every
  time-series dashboard needs this, and naive groupBy silently drops
  empty days);
* a query expressed as ANSI SQL through ``spark.sql`` over temp views,
  proving the engine's SQL entry point end-to-end against DuckDB
  running near-identical text;
* z-score outlier counts — the |x − μ| > 2σ gate computed from exact
  decimal sums (``functions/exact.py``) so the float threshold compares
  identically on any engine at any parallelism.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.functions.exact import (
    davg,
    dstddev_samp,
    sql_davg,
    sql_dstddev_samp,
    sql_dsum,
)
from unicargo_medallion_data_pipeline_spark.plans.catalog import register
from unicargo_medallion_data_pipeline_spark.sources.readers import load_table


@register(
    "nation_trade_triangles",
    sql="""
    WITH pairs AS (
      SELECT DISTINCT
        LEAST(s.s_nationkey, c.c_nationkey) AS a,
        GREATEST(s.s_nationkey, c.c_nationkey) AS b
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey
        AND o.o_orderpriority = '1-URGENT'
        AND o.o_orderdate >= DATE '1997-01-01'
        AND o.o_orderdate < DATE '1997-04-01'
    ),
    tri AS (
      SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM pairs e1
      JOIN pairs e2 ON e2.a = e1.b
      JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT na.n_name AS nation_a, nb.n_name AS nation_b, nc.n_name AS nation_c
    FROM tri
    JOIN nation na ON tri.a = na.n_nationkey
    JOIN nation nb ON tri.b = nb.n_nationkey
    JOIN nation nc ON tri.c = nc.n_nationkey
    """,
    operators=("J6", "P11", "A8"),
)
def nation_trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the nation trade graph: triples of
    nations that all trade pairwise (the clustering/motif primitive of
    graph analytics, cf. the connected-components operator in
    ``operators/graph.py``).

    Scale shape: the fact join projects to bare integer nation-key
    pairs BEFORE the distinct (payload-free shuffle), and the edge list
    is oriented a < b so each triangle is produced exactly once — the
    standard deduped triangle join, 1/6 the work of the naive version.
    Edge lists are |V|²-bounded (625 max here; graph edges generally ≪
    facts), so the self-joins run on a table many orders of magnitude
    smaller than the input and AQE broadcasts them.  The edge predicate
    (urgent orders, 1997 Q1) keeps the graph PARTIAL at the test scales
    — a complete graph would make every nation triple a triangle and
    the oracle undiscriminating.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit(datetime.date(1997, 1, 1)))
        & (F.col("o_orderdate") < F.lit(datetime.date(1997, 4, 1)))
    ).select("o_orderkey", "o_custkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .distinct()
    )
    e1 = pairs.alias("e1")
    e2 = pairs.alias("e2")
    e3 = pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .select(F.col("e1.a").alias("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c"))
    )
    return (
        tri.join(F.broadcast(n.withColumnsRenamed({"n_nationkey": "ka", "n_name": "nation_a"})), F.col("a") == F.col("ka"))
        .join(F.broadcast(n.withColumnsRenamed({"n_nationkey": "kb", "n_name": "nation_b"})), F.col("b") == F.col("kb"))
        .join(F.broadcast(n.withColumnsRenamed({"n_nationkey": "kc", "n_name": "nation_c"})), F.col("c") == F.col("kc"))
        .select("nation_a", "nation_b", "nation_c")
    )


@register(
    "daily_order_spine_filled",
    sql="""
    WITH spine AS (
      SELECT CAST(d AS DATE) AS order_day
      FROM generate_series(DATE '1997-01-01', DATE '1997-12-31',
                           INTERVAL 1 DAY) AS t(d)
    ),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS order_day, COUNT(*) AS cnt
      FROM orders
      WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
      GROUP BY 1
    )
    SELECT s.order_day, COALESCE(daily.cnt, 0) AS n_orders
    FROM spine s LEFT JOIN daily ON s.order_day = daily.order_day
    """,
    operators=("S4", "J7", "P9", "A4"),
)
def daily_order_spine_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: one row per 1997 day with the order count,
    zero for days with no orders.

    A bare groupBy(order_day) silently DROPS empty days — every
    time-series consumer downstream (rolling windows, day-over-day
    deltas, charts) then mis-computes.  The fix is a generated dense
    date spine (``sequence`` + explode — a generated local relation,
    never a driver loop) left-joined to the fact aggregate.  The spine
    is 365 rows regardless of data scale, so Spark broadcasts the
    aggregate join; at 100 TB the aggregate side is |distinct days| ≤
    spine size — this plan is scan-bound, full stop.
    """
    o = load_table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(datetime.date(1997, 1, 1)), F.lit(datetime.date(1997, 12, 31))
            )
        ).alias("order_day")
    )
    daily = (
        o.filter(
            (F.col("o_orderdate") >= F.lit(datetime.date(1997, 1, 1)))
            & (F.col("o_orderdate") < F.lit(datetime.date(1998, 1, 1)))
        )
        .select(F.col("o_orderdate").cast("date").alias("order_day"))
        .groupBy("order_day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return spine.join(daily, "order_day", "left").select(
        "order_day", F.coalesce("cnt", F.lit(0)).alias("n_orders")
    )


#: The Spark-side SQL text for the front-door query.  Same ANSI shape as
#: the DuckDB oracle below; the only divergence is the documented
#: decimal→double cast detour DuckDB needs (functions/exact.py).
_SQL_FRONTDOOR_SPARK = """
    SELECT
      o_orderpriority,
      CAST(year(o_orderdate) AS INT) AS order_year,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
    FROM {view}
    GROUP BY o_orderpriority, year(o_orderdate)
"""


@register(
    "sql_frontdoor_revenue",
    sql=f"""
    SELECT
      o_orderpriority,
      CAST(year(o_orderdate) AS INT) AS order_year,
      COUNT(*) AS n_orders,
      {sql_dsum('o_totalprice')} AS total_revenue
    FROM orders
    GROUP BY o_orderpriority, year(o_orderdate)
    """,
    operators=("A13", "P5"),
)
def sql_frontdoor_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority × year, expressed as ANSI SQL text run
    through ``spark.sql`` over a registered temp view — the engine's SQL
    front door, end-to-end.

    Every other catalog entry uses the DataFrame API; a user of the
    reference writes plain SQL too, and this entry proves that path
    compiles through the same Catalyst pipeline to the same results
    (DuckDB runs near-identical text as the oracle).  SQL text and
    DataFrame code produce literally identical plans in Spark, so
    everything the plan tests pin for DataFrame queries (pushdown,
    partial aggregation, AQE) holds here too.
    """
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("sqlfd_orders")
    return spark.sql(_SQL_FRONTDOOR_SPARK.format(view="sqlfd_orders"))


@register(
    "events_value_outliers",
    sql=f"""
    WITH stats AS (
      SELECT event_type,
             {sql_davg('value')} AS mu,
             {sql_dstddev_samp('value')} AS sigma
      FROM events
      GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN abs(e.value - s.mu) > 2.0 * s.sigma
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN stats s ON e.event_type = s.event_type
    GROUP BY e.event_type
    """,
    operators=("A3", "A13", "J2"),
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type count of 2-sigma outliers — the data-quality /
    anomaly gate run before metrics are trusted.

    The flag is |x − μ| > 2σ (no division: one subtraction and one
    multiply fewer than a z-score, same decision boundary).  μ and σ
    come from exact decimal sums (``functions/exact.py``), so the
    comparison's float inputs are bit-identical on Spark and DuckDB at
    any parallelism — a naive ``stddev(value)`` would drift in the last
    ulps and flip boundary rows.  Plan: one partial-aggregated pass for
    stats (|event_type| rows), broadcast back over the fact scan, one
    final aggregate — two scans, zero wide shuffles of the fact.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        davg("value").alias("mu"), dstddev_samp("value").alias("sigma")
    )
    flagged = ev.join(F.broadcast(stats), "event_type")
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.abs(F.col("value") - F.col("mu")) > 2.0 * F.col("sigma"), 1).otherwise(0)
        ).alias("n_outliers"),
    )


@register(
    "part_pareto_frontier",
    sql="""
    WITH u AS (
      -- dominance needs both measures: a NULL price/size part cannot
      -- be compared and falls outside the skyline universe (r11 sweep)
      SELECT p_partkey, p_retailprice, p_size FROM part
      WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
    )
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM u p
    WHERE NOT EXISTS (
      SELECT 1 FROM u q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size <= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
    )
    ORDER BY p.p_retailprice, p.p_size, p.p_partkey
    """,
    operators=("A1", "W5", "J4"),
)
def part_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline) of parts minimizing (retail price,
    size) — "no other part is both cheaper-or-equal and smaller-or-equal
    with at least one strict".  Börzsönyi et al., "The Skyline
    Operator" (ICDE'01); the oracle is the literal NOT EXISTS dominance
    definition, the engine is the sort-based O(n log n) equivalent.

    Engine shape — NO quadratic anti-join:

    1. reduce to per-price minima: groupBy(price) min(size).  Only a
       price group's min-size rows can survive (same-price, larger-size
       rows are strictly dominated), so this one keyed exchange shrinks
       the frontier computation to ≤ |distinct prices| rows;
    2. running strict-predecessor min over the minima, ordered by price
       (prices unique after step 1 → a ROWS frame is exact): a price
       level survives iff its min size is strictly below every cheaper
       level's min size;
    3. join the surviving (price, min size) levels back to the full
       table to emit ALL parts at a surviving (price, size) point —
       equal-price equal-size duplicates are mutually non-dominating
       and every one belongs on the frontier.

    The step-2 window is global but runs over the REDUCED frame,
    bounded by the price domain (cents-granular, catalog-bounded), not
    the row count; at lake scale with an unbounded numeric domain,
    range-partition the minima and two-phase the running min exactly as
    operators/ranks.py does for global rank.  Comparisons use the raw
    double prices both engines read from parquet — no quantization, so
    the dominance relation is bit-identical to the oracle's.
    """
    part = (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .filter(F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull())
    )
    minima = (
        part.groupBy(F.col("p_retailprice").alias("lvl_price"))
        .agg(F.min("p_size").alias("msz"))
    )
    w = Window.orderBy("lvl_price").rowsBetween(Window.unboundedPreceding, -1)
    frontier_levels = (
        minima.withColumn("prev_min", F.min("msz").over(w))
        .filter(F.col("prev_min").isNull() | (F.col("msz") < F.col("prev_min")))
        .select("lvl_price", "msz")
    )
    return (
        part.join(
            F.broadcast(frontier_levels),
            (F.col("p_retailprice") == F.col("lvl_price"))
            & (F.col("p_size") == F.col("msz")),
        )
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_size", "p_partkey")
    )


@register(
    "events_value_moments",
    sql="""
    WITH s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             SUM(c) AS s1,
             SUM(c * c) AS s2,
             SUM(c * c * c) AS s3,
             SUM(c * c * c * c) AS s4
      FROM (
        SELECT event_type,
               CAST(round(value * 100) AS HUGEINT) AS c
        FROM events
      )
      GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n_events,
             CAST(n_events AS DOUBLE) AS nd,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS s1d,
             CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS s2d,
             CAST(CAST(s3 AS VARCHAR) AS DOUBLE) AS s3d,
             CAST(CAST(s4 AS VARCHAR) AS DOUBLE) AS s4d
      FROM s
    ),
    mm AS (
      SELECT event_type, n_events,
             (s1d / nd) AS mu,
             (s2d / nd) AS r2,
             (s3d / nd) AS r3,
             (s4d / nd) AS r4
      FROM m
    ),
    cm AS (
      SELECT event_type, n_events,
             (r2 - (mu * mu)) AS m2,
             ((r3 - ((3.0 * mu) * r2)) + (((2.0 * mu) * mu) * mu)) AS m3,
             (((r4 - ((4.0 * mu) * r3)) + ((((6.0 * mu) * mu)) * r2))
               - ((((3.0 * mu) * mu) * mu) * mu)) AS m4
      FROM mm
    )
    SELECT event_type, n_events,
           (m3 / (m2 * sqrt(m2))) AS skewness,
           ((m4 / (m2 * m2)) - 3.0) AS excess_kurtosis
    FROM cm
    ORDER BY event_type
    """,
    operators=("A15", "A3"),
)
def events_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shape profile per event type: skewness and excess
    kurtosis from EXACT integer power sums — the one-pass moment
    pipeline a data-quality monitor runs to detect drift that mean/σ
    miss (heavy tails, asymmetry).

    Exactness strategy, same family as functions/exact.py: values are
    cent-quantized to DECIMAL(9,0), the four power sums accumulate in
    DECIMAL (c⁴ ≤ 10²⁰ rides DECIMAL(38,0) to ~10¹⁸ rows/group), so the
    distributed aggregation is ORDER-FREE; the float work happens once
    per group row, in an expression tree whose parenthesization is
    written IDENTICALLY here and in the oracle SQL (double + and × are
    not associative — same shape ⇒ same bits), and the only nonlinear
    call is sqrt, the one libm operation IEEE 754 requires correctly
    rounded (pow(x, 1.5) would NOT be).  Skew/kurtosis are
    scale-invariant, so the ×100 quantization cancels without any
    unscaling.  Oracle detail: the >2⁵³ power sums enter DOUBLE via a
    VARCHAR detour because DuckDB's HUGEINT→DOUBLE cast is not
    correctly rounded (observed 2 ulp off on s4; string→double is
    exact — same workaround as embedding_dim_covariance).
    Plan: one map-side-combined keyed aggregate, scalar
    epilogue — the moment sums are also MERGEABLE, so at 100 TB the
    per-partition sum rows roll up exactly like the additive-rollup
    contract.
    """
    c = F.round(F.col("value") * 100).cast("decimal(9,0)")
    s = (
        load_table(spark, sf_dir, "events")
        .select("event_type", c.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("c").cast("decimal(38,0)").alias("s1"),
            F.sum(F.col("c") * F.col("c")).cast("decimal(38,0)").alias("s2"),
            F.sum(F.col("c") * F.col("c") * F.col("c")).cast("decimal(38,0)").alias("s3"),
            F.sum(F.col("c") * F.col("c") * F.col("c") * F.col("c"))
            .cast("decimal(38,0)")
            .alias("s4"),
        )
    )
    m = s.select(
        "event_type",
        "n_events",
        F.col("n_events").cast("double").alias("nd"),
        F.col("s1").cast("double").alias("s1d"),
        F.col("s2").cast("double").alias("s2d"),
        F.col("s3").cast("double").alias("s3d"),
        F.col("s4").cast("double").alias("s4d"),
    )
    mm = m.select(
        "event_type",
        "n_events",
        (F.col("s1d") / F.col("nd")).alias("mu"),
        (F.col("s2d") / F.col("nd")).alias("r2"),
        (F.col("s3d") / F.col("nd")).alias("r3"),
        (F.col("s4d") / F.col("nd")).alias("r4"),
    )
    mu = F.col("mu")
    cm = mm.select(
        "event_type",
        "n_events",
        (F.col("r2") - (mu * mu)).alias("m2"),
        (
            (F.col("r3") - ((F.lit(3.0) * mu) * F.col("r2")))
            + (((F.lit(2.0) * mu) * mu) * mu)
        ).alias("m3"),
        (
            (
                (F.col("r4") - ((F.lit(4.0) * mu) * F.col("r3")))
                + ((((F.lit(6.0) * mu) * mu)) * F.col("r2"))
            )
            - ((((F.lit(3.0) * mu) * mu) * mu) * mu)
        ).alias("m4"),
    )
    m2 = F.col("m2")
    # try_divide: a constant group has m2 = 0 (exactly, in both engines
    # — the moment arithmetic is bit-identical) — skewness/kurtosis are
    # undefined and DuckDB's double x/0.0 is NULL (r13y sweep seed).
    return cm.select(
        "event_type",
        "n_events",
        F.try_divide(F.col("m3"), m2 * F.sqrt(m2)).alias("skewness"),
        (F.try_divide(F.col("m4"), m2 * m2) - F.lit(3.0)).alias("excess_kurtosis"),
    ).orderBy("event_type")


@register(
    "segment_revenue_trend_slope",
    sql="""
    WITH m AS (
      SELECT c.c_mktsegment AS segment,
             (CAST(year(o.o_orderdate) AS BIGINT) - 1997) * 12
               + (CAST(month(o.o_orderdate) AS BIGINT) - 1) AS x,
             CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderdate IS NOT NULL
      GROUP BY 1, 2
    ),
    s AS (
      SELECT segment,
             CAST(COUNT(*) AS BIGINT) AS n_months,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM m GROUP BY segment
    )
    SELECT segment, n_months,
           CASE WHEN n_months * sxx - sx * sx <> 0 THEN
             CAST(n_months * sxy - sx * sy AS DOUBLE)
               / CAST(n_months * sxx - sx * sx AS DOUBLE) / 100.0
           END AS slope_per_month
    FROM s
    ORDER BY segment
    """,
    operators=("A3", "J2"),
)
def segment_revenue_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares revenue trend per market segment: the
    slope of monthly revenue against a month index, computed from EXACT
    integer sums — the closed-form β̂ = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)
    with x zero-based at 1997-01 and y in cents, so every aggregate is
    BIGINT-exact and order-free; the single float step is one division
    of two exactly-represented integers (envelope: |nΣxy| < 2^53 up to
    ~10¹³ cents·month per segment — beyond that, route the two products
    through DECIMAL and the VARCHAR detour like events_value_moments).

    The per-(segment, month) pre-aggregate is the scale lever: the
    regression runs over |segments|×|months| rows no matter how many
    orders exist; one broadcast dim join, two keyed exchanges, both
    map-side combined.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .filter(F.col("o_orderdate").isNotNull())  # dated universe (r11 sweep)
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    x = (
        (F.year("o_orderdate").cast("bigint") - 1997) * 12
        + (F.month("o_orderdate").cast("bigint") - 1)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    m = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), x.alias("x"))
        .agg(F.sum(cents).cast("bigint").alias("y"))
    )
    s = m.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    denom = F.col("n_months") * F.col("sxx") - F.col("sx") * F.col("sx")
    # one-month segments have zero x-variance: slope undefined (Spark
    # ANSI raises on zero divisors — r11 sweep)
    slope = F.when(
        denom != 0,
        (F.col("n_months") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / denom.cast("double")
        / F.lit(100.0),
    )
    return s.select("segment", "n_months", slope.alias("slope_per_month")).orderBy(
        "segment"
    )
