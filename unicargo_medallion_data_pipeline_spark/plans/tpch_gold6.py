"""Gold queries, batch 6: pivot, cube grouping sets, exact percentiles,
and the events-family time/state queries (interval join, as-of, range
frame, hourly rollup, bitmap distinct).

Beyond-reference breadth (the reference's A2 builds pivot-style measures
by hand with when/otherwise ladders — ``03_gold_flight_analytics.ipynb:
178``): the engine also exposes the declarative forms Spark gives for
free, each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from unicargo_medallion_data_pipeline_spark.functions.exact import DEC, sql_dsum
from unicargo_medallion_data_pipeline_spark.operators.asof import asof_join_backward
from unicargo_medallion_data_pipeline_spark.operators.ranges import interval_join_binned
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
    -- Spark emits NO grouping-set rows over an empty relation (the SQL
    -- standard emits the () row with COUNT 0); mirror the engine —
    -- no-op on any non-empty input (r11 sweep)
    HAVING COUNT(*) > 0
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
      -- 4dp rounding: the two engines interpolate with different but
      -- equivalent formulas (lower + f*(upper-lower) vs a lerp), which
      -- can differ in the last ulp on adversarial value pairs (r11
      -- sweep, seed d); rounding pins the comparison without losing
      -- meaningful precision on 2dp money
      round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
      round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
      round(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders
    GROUP BY o_orderpriority
    """,
    operators=("A5", "A12"),
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per priority (Spark ``percentile``
    ≡ DuckDB ``quantile_cont``, verified bitwise-identical: both
    interpolate lower + frac·(upper−lower) over the sorted doubles).

    Output is one SCALAR column per requested quantile — the driver's
    canonicalizer cannot hash array-typed cells (driver contract:
    scalars only), and four named columns are the friendlier shape for
    downstream SQL anyway.  Spark still computes all four quantiles in
    ONE sort per group (Catalyst collapses the four percentile() calls
    over the same child into a single Percentile aggregate buffer).

    Scale note: exact percentile sorts each group's values — fine for
    bounded group cardinality × moderate group size; unbounded-cardinality
    profiling at 100 TB should use approx_percentile (t-digest sketch,
    one pass, mergeable) and accept no external oracle."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("round(percentile(o_totalprice, 0.25), 4)").alias("p25"),
        F.expr("round(percentile(o_totalprice, 0.50), 4)").alias("p50"),
        F.expr("round(percentile(o_totalprice, 0.75), 4)").alias("p75"),
        F.expr("round(percentile(o_totalprice, 0.95), 4)").alias("p95"),
    )


@register(
    "errors_in_session",
    sql="""
    WITH seq AS (
      SELECT
        user_id, ts, event_id, value,
        CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(LAG(ts) OVER
               (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
             OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS is_session_start
      FROM events WHERE ts IS NOT NULL
    ),
    tagged AS (
      SELECT
        user_id, ts, event_id,
        CAST(SUM(is_session_start) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      FROM seq
    ),
    sessions AS (
      SELECT user_id, session_seq,
             MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS session_start_epoch,
             MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS session_end_epoch
      FROM tagged GROUP BY user_id, session_seq
    ),
    errors AS (
      SELECT event_id AS error_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS error_s
      FROM events WHERE event_type = 'error'
    )
    SELECT e.error_id, e.user_id, e.error_s,
           s.session_seq, s.session_start_epoch, s.session_end_epoch,
           e.error_s - s.session_start_epoch AS secs_into_session
    FROM errors e JOIN sessions s
      ON e.user_id = s.user_id
     AND e.error_s BETWEEN s.session_start_epoch AND s.session_end_epoch
    """,
    operators=("J7", "W5", "T6"),
)
def errors_in_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: every error event attached to the session interval
    containing it, via the engine's binned interval join
    (operators/ranges.py — interval→bin explode + equi-join + exact
    BETWEEN filter; one shuffle, no per-key nested loop).  The oracle is
    DuckDB's inequality join over the same sessionization CTE."""
    from unicargo_medallion_data_pipeline_spark.plans.tpch_gold2 import events_sessionization

    ev = load_table(spark, sf_dir, "events")
    sessions = events_sessionization(spark, sf_dir).select(
        "user_id", "session_seq", "session_start_epoch", "session_end_epoch"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.unix_timestamp("ts").alias("error_s"),
    )
    j = interval_join_binned(
        errors,
        sessions,
        on=["user_id"],
        ts_col="error_s",
        start_col="session_start_epoch",
        end_col="session_end_epoch",
        bin_width=3600,
    )
    return j.select(
        "error_id",
        "user_id",
        "error_s",
        "session_seq",
        "session_start_epoch",
        "session_end_epoch",
        (F.col("error_s") - F.col("session_start_epoch")).alias("secs_into_session"),
    )


@register(
    "events_hourly_rollup",
    sql=f"""
    SELECT
      CAST(to_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600)
           AS TIMESTAMP) AS hour_start,
      event_type,
      COUNT(*) AS n_events,
      {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    operators=("A4", "A6"),
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup (continuous-aggregate pattern): the hourly
    aggregate is RE-AGGREGATED from the finished 5-minute aggregate, not
    from raw events — at lake scale the fine grain is materialized once
    and every coarser resolution reads 12× (hour) / 288× (day) fewer
    rows.  The oracle computes hourly DIRECTLY from raw events, proving
    the re-aggregation is exact.

    Only mergeable aggregates roll up (counts, decimal-exact sums — the
    5-min bucket sums are exact 2-decimal values, so re-summing through
    DECIMAL(18,2) loses nothing).  Non-mergeable ones (the 5-min grain's
    COUNT(DISTINCT user_id)) deliberately do NOT appear here: distinct
    counts cannot be summed across buckets; at the coarser grain they
    must be recomputed from raw (or approximated with mergeable HLL
    sketches — `approx_count_distinct`)."""
    from unicargo_medallion_data_pipeline_spark.plans.tpch_gold2 import events_tumbling_5min

    fine = events_tumbling_5min(spark, sf_dir)
    hour = (F.floor(F.unix_timestamp("window_start") / 3600) * 3600).cast("timestamp")
    return (
        fine.groupBy(hour.alias("hour_start"), "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum(F.col("total_value").cast(DEC)).cast("double").alias("total_value"),
        )
    )


@register(
    "clicks_asof_purchase",
    sql="""
    WITH purchases AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             MAX(event_id) AS purchase_id
      FROM events
      WHERE event_type = 'purchase' AND ts IS NOT NULL
        AND user_id IS NOT NULL
      GROUP BY 1, 2
    ),
    clicks AS (
      SELECT event_id AS click_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s
      FROM events
      WHERE event_type = 'click' AND ts IS NOT NULL AND user_id IS NOT NULL
    )
    SELECT c.click_id, c.user_id, c.s AS click_s,
           p.purchase_id, p.s AS purchase_s,
           c.s - p.s AS secs_since_purchase
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.s >= p.s
    """,
    operators=("J7", "W5"),
)
def clicks_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each click joined to the user's latest
    prior-or-same-second purchase via the engine's as-of join
    (operators/asof.py — union + carry-forward window, one shuffle);
    DuckDB's native ASOF JOIN is the oracle.  Purchases are
    canonicalized per (user, second) first — as-of picks among equal
    timestamps are arbitrary in any engine.  Timed universe: an event
    without a timestamp has no as-of position (r11 sweep)."""
    # keyed + timed universe: SQL ASOF equality never matches a NULL
    # key, while a union+carry-forward window would pool the NULL-key
    # rows into one partition and fabricate matches (r11 sweep)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    s = F.unix_timestamp("ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", s.alias("s")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", s.alias("s"))
        .agg(F.max("event_id").alias("purchase_id"))
        .withColumn("purchase_s", F.col("s"))
    )
    j = asof_join_backward(clicks, purchases, on=["user_id"], ts_col="s")
    return j.select(
        "click_id",
        "user_id",
        F.col("s").alias("click_s"),
        "purchase_id",
        "purchase_s",
        (F.col("s") - F.col("purchase_s")).alias("secs_since_purchase"),
    )


@register(
    "events_trailing_10min",
    sql="""
    SELECT
      event_id,
      user_id,
      epoch_us(ts) AS ts_us,
      CAST(COUNT(*) OVER w AS BIGINT) AS n_events_10m,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS VARCHAR) AS DOUBLE)
        AS value_10m
    FROM events
    WINDOW w AS (
      PARTITION BY user_id
      ORDER BY epoch_us(ts)
      RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW
    )
    """,
    operators=("W3", "W5"),
)
def events_trailing_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range window frame (``rangeBetween``): at every event, the
    user's event count and exact value sum over the trailing 10 minutes
    *of event time* — the per-entity rolling-rate shape (rate limiting,
    burst detection, velocity features) that a row-count frame (W3's
    ``rowsBetween``) cannot express, because the lookback must follow the
    clock, not the row count.

    Both engines order by the same integer — microseconds since epoch
    (`unix_micros` / `epoch_us`) — so the frame boundary comparison is
    exact integer arithmetic, with no interval or timezone semantics in
    play; the frame is value-inclusive on both ends in both engines.
    The windowed sum routes through DECIMAL(18,2) (functions/exact.py),
    so its value is independent of intra-frame addition order and
    hash-matches DuckDB bitwise.

    Scale: one hash exchange on ``user_id`` plus a per-partition sort by
    time — the same cost as any per-entity window.  Frame state is
    bounded by the 10-minute width, not partition size (Spark's
    WindowExec keeps a sliding buffer for range frames), so a hot user
    with months of history streams through without buffering it all.
    The streaming twin for unbounded data is the watermarked sliding
    window (streaming/windows.py); this batch form is the backfill path.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.count(F.lit(1)).over(w).alias("n_events_10m"),
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("value_10m"),
    )


@register(
    "distinct_users_bitmap",
    sql="""
    SELECT
      event_type,
      COUNT(DISTINCT user_id) AS n_distinct
    FROM events
    GROUP BY event_type
    """,
    operators=("A1", "A17"),
)
def distinct_users_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting routed through the MERGEABLE bitmap form
    (operators/rollup.py ``bitmap_grain``/``bitmap_distinct``): each
    distinct user sets one bit in its domain-bucket bitmap, per-type
    counts are sums of per-bucket bit counts.  The DuckDB oracle is the
    plain ``COUNT(DISTINCT ...)`` — the hash-match proves the bitmap
    path is exact, not approximate, which is what qualifies it to live
    in an incrementally-maintained rollup (bitwise-OR increments ==
    full recompute) where a plain COUNT DISTINCT cannot.

    Plan: two keyed shuffles — (type, bucket) bitmap build, then the
    per-type sum.  A one-shot ``countDistinct`` also needs two exchanges
    at this shape; the bitmap form's win is not the one-shot query, it
    is that the intermediate is STORABLE and mergeable, so at 100 TB the
    second shuffle reads a tiny maintained grain instead of re-scanning
    the fact table.
    """
    from unicargo_medallion_data_pipeline_spark.operators.rollup import (
        bitmap_distinct,
        bitmap_grain,
    )

    ev = load_table(spark, sf_dir, "events")
    grain = bitmap_grain(ev, ["event_type"], "user_id")
    return bitmap_distinct(grain, ["event_type"])
