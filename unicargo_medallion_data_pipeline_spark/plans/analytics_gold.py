"""Dataset-health analytics: snapshot diff, distribution drift, trend
slopes, correlation, winsorized stats, concentration (Gini).

The reference's quality surface stops at null profiles and row counts
(``src/data_quality_utils/data_profiling_utils.py``); a pipeline feeding
model training additionally needs to answer "did the data CHANGE?" —
between runs (snapshot diff), between time periods (distribution drift),
over time (trend), across columns (correlation), under outliers
(winsorized stats), and across contributors (concentration).  Each query
here is that check as a pure DataFrame plan with a DuckDB oracle.

Cross-engine determinism discipline (same as plans/tpch_gold.py): sums
are computed on DECIMAL casts (exact, order-insensitive), and the only
double-typed operations are division, multiplication, subtraction and
``sqrt`` — all IEEE-754 correctly-rounded, so both engines produce
bit-identical results.  ``ln``/``exp`` (NOT correctly-rounded, libm-
dependent) are deliberately avoided: the drift statistic below is the
chi-square-style discriminator, not KL/PSI, exactly for this reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from unicargo_medallion_data_pipeline_spark.functions.exact import exact_double
from unicargo_medallion_data_pipeline_spark.operators.diff import diff_summary
from unicargo_medallion_data_pipeline_spark.operators.ranks import global_row_number
from unicargo_medallion_data_pipeline_spark.plans.catalog import register
from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

#: split boundary for the drift query — events span 2024-01-01..01-30
_DRIFT_SPLIT = "2024-01-16 00:00:00"


@register(
    "orders_snapshot_diff",
    sql="""
    WITH old_snap AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 10 <> 0
    ),
    new_snap AS (
      SELECT o_orderkey,
             o_totalprice
               + CASE WHEN o_orderkey % 5 = 0 THEN 1.0 ELSE 0.0 END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT
      CASE
        WHEN o.o_orderkey IS NULL THEN 'added'
        WHEN n.o_orderkey IS NULL THEN 'removed'
        -- null-safe compare: NULL = NULL must read 'unchanged', like
        -- the engine's <=> column compare (r11 sweep)
        WHEN o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
             AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
          THEN 'unchanged'
        ELSE 'changed'
      END AS change_status,
      COUNT(*) AS n_keys
    FROM old_snap o
    FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
    GROUP BY 1
    ORDER BY change_status
    """,
    operators=("J7", "A2", "Q5"),
    bench=True,
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style reconciliation between two table versions via
    ``operators/diff.py::diff_summary``.

    The two snapshots are carved deterministically from the orders table
    (keys %10 ≠ 0 vs %7 ≠ 0, with a price bump on %5 keys) so the diff
    has all four statuses; real use diffs yesterday's and today's
    overwrite of the same silver table.  Plan: ONE full-outer
    hash-partitioned equi-join on the key, per-column null-safe compare
    post-join (codegen, no UDF), then a 4-group aggregate.  At lake
    scale, bucket both snapshots by the key to make the join
    zero-shuffle (sources/writers.py::write_bucketed).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old_snap = o.filter(F.col("o_orderkey") % 10 != 0)
    new_snap = o.filter(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_totalprice",
        F.col("o_totalprice")
        + F.when(F.col("o_orderkey") % 5 == 0, F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    return (
        diff_summary(old_snap, new_snap, keys=["o_orderkey"])
        .orderBy("change_status")
    )


@register(
    "events_value_drift",
    sql=f"""
    WITH b AS (
      SELECT CAST(FLOOR(value / 50) AS INT) AS value_bin,
             CAST(SUM(CASE WHEN ts <  TIMESTAMP '{_DRIFT_SPLIT}' THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_DRIFT_SPLIT}' THEN 1 ELSE 0 END) AS BIGINT) AS n_late
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1
    )
    SELECT value_bin, n_early, n_late,
           -- drift is defined only when both periods are populated and
           -- the bin is non-empty; Spark ANSI raises on ANY zero
           -- divisor, doubles included (r11 sweep)
           CASE WHEN SUM(n_early) OVER () > 0 AND SUM(n_late) OVER () > 0
                 AND n_early + n_late > 0 THEN
             (CAST(n_early AS DOUBLE) / SUM(n_early) OVER ()
                - CAST(n_late AS DOUBLE) / SUM(n_late) OVER ())
             * (CAST(n_early AS DOUBLE) / SUM(n_early) OVER ()
                - CAST(n_late AS DOUBLE) / SUM(n_late) OVER ())
             / (CAST(n_early AS DOUBLE) / SUM(n_early) OVER ()
                + CAST(n_late AS DOUBLE) / SUM(n_late) OVER ())
           END AS drift_contrib
    FROM b
    ORDER BY value_bin
    """,
    operators=("A12", "W4"),
)
def events_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift check between two time periods: bin the value
    column (width 50) and emit each bin's early/late counts plus its
    contribution (p−q)²/(p+q) to the chi-square-style drift statistic —
    the training-data "did the feature distribution move?" gate.

    The statistic is deliberately log-free: KL/PSI need ``ln``, which is
    not IEEE-correctly-rounded and differs between libm builds, so its
    result cannot be hash-verified across engines.  (p−q)²/(p+q) is the
    same discriminator (Neyman chi-square / 2) under exact arithmetic.

    Plan: one map-side-combined aggregate on ~10 bin groups, then a
    window over the 10-row result — bounded by the BIN count, never the
    event count, so the unpartitioned window is safe at any scale.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .select("ts", "value")
        .filter(F.col("ts").isNotNull())  # timed universe (r11 sweep)
    )
    split = F.lit(_DRIFT_SPLIT).cast("timestamp")
    b = ev.groupBy(
        F.floor(F.col("value") / 50).cast("int").alias("value_bin")
    ).agg(
        F.sum(F.when(F.col("ts") < split, 1).otherwise(0)).alias("n_early"),
        F.sum(F.when(F.col("ts") >= split, 1).otherwise(0)).alias("n_late"),
    )
    w = Window.partitionBy()  # 10 rows — bounded by bin count, documented
    p = F.col("n_early").cast("double") / F.sum("n_early").over(w)
    q = F.col("n_late").cast("double") / F.sum("n_late").over(w)
    defined = (
        (F.sum("n_early").over(w) > 0)
        & (F.sum("n_late").over(w) > 0)
        & (F.col("n_early") + F.col("n_late") > 0)
    )
    return (
        b.withColumn(
            "drift_contrib", F.when(defined, (p - q) * (p - q) / (p + q))
        ).orderBy("value_bin")
    )


@register(
    "segment_revenue_trend",
    sql="""
    WITH daily AS (
      SELECT c.c_mktsegment,
             CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o.o_orderdate AS DATE))
                  AS DECIMAL(8,0)) AS x,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                  AS DECIMAL(20,0)) AS y_c
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderdate IS NOT NULL
      GROUP BY 1, 2
    ),
    s AS (
      SELECT c_mktsegment,
             CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
             CAST(SUM(x) AS DECIMAL(18,0)) AS sx,
             CAST(SUM(y_c) AS DECIMAL(20,0)) AS sy,
             CAST(SUM(x * y_c) AS DECIMAL(28,0)) AS sxy,
             CAST(SUM(x * x) AS DECIMAL(28,0)) AS sxx
      FROM daily GROUP BY c_mktsegment
    )
    SELECT c_mktsegment,
           CAST(n AS BIGINT) AS n_days,
           -- a one-day segment has zero x-variance: slope undefined
           -- (Spark ANSI raises on zero divisors — r11 sweep)
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
               / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) / 100.0
           END AS slope_per_day
    FROM s
    ORDER BY c_mktsegment
    """,
    operators=("A13", "J2", "P4"),
)
def segment_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment OLS trend: slope of daily revenue against the day
    index, from the closed form (nΣxy − ΣxΣy)/(nΣx² − (Σx)²).

    The slope is assembled from EXACT integer sums: x is the day
    offset, y the daily revenue in CENTS (scale-0 decimal), so Σx, Σy,
    Σxy, Σx² and both closed-form combinations nΣxy−ΣxΣy / nΣx²−(Σx)²
    are exact scale-0 decimals, identical in both engines.  Doubles
    appear only in the final two divisions, and the decimal→double
    conversion is routed through a STRING cast: int128-backed engines
    convert wide decimals to double inexactly (measured 1-3 ulp off
    the correctly-rounded value at sf0.1), while decimal→string→double
    is exact digits then a correctly-rounded strtod/parseDouble in
    every engine — bit-identical at any width.  Built-in ``regr_slope``
    is engine-ordered double accumulation — unverifiable for the same
    reason stddev derives from exact sums (plans/tpch_gold.py A5).

    Plan: fact→dim equi-join (customer broadcasts via AQE at test SF),
    two keyed aggregates — (segment, day) then segment — both map-side
    combined; 5 output rows.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .filter(F.col("o_orderdate").isNotNull())  # dated universe (r11 sweep)
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_mktsegment",
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            .cast("decimal(8,0)")
            .alias("x"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("decimal(20,0)")
            .alias("y_c")
        )
    )
    s = daily.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("decimal(10,0)").alias("n"),
        F.sum("x").cast("decimal(18,0)").alias("sx"),
        F.sum("y_c").cast("decimal(20,0)").alias("sy"),
        F.sum(F.col("x") * F.col("y_c")).cast("decimal(28,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(28,0)").alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "c_mktsegment",
        F.col("n").cast("bigint").alias("n_days"),
        # one-day segments have zero x-variance: slope undefined, and
        # Spark ANSI raises on zero divisors (r11 sweep)
        F.when(
            denom != 0,
            exact_double(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / exact_double(denom)
            / F.lit(100.0),
        ).alias("slope_per_day"),
    ).orderBy("c_mktsegment")


@register(
    "lineitem_price_qty_corr",
    sql="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS xc,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS yc
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
             CAST(SUM(xc) AS DECIMAL(19,0)) AS sx,
             CAST(SUM(yc) AS DECIMAL(19,0)) AS sy,
             CAST(SUM(xc * xc) AS DECIMAL(28,0)) AS sxx,
             CAST(SUM(yc * yc) AS DECIMAL(28,0)) AS syy,
             CAST(SUM(xc * yc) AS DECIMAL(28,0)) AS sxy
      FROM c GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / (SQRT(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
                * SQRT(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)))
             AS corr_qty_price
    FROM s
    ORDER BY l_returnflag
    """,
    operators=("A14", "A15"),
)
def lineitem_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return
    flag, from exact integer-cents sums with the closed form evaluated
    in doubles at the end (the 100² scale factors cancel in the ratio).

    Built-in ``corr`` is a single-pass streaming covariance whose
    floating accumulation order is engine- and partition-dependent;
    the exact-sum form is order-insensitive.  Everything through
    nΣxy−ΣxΣy and the two variance terms stays in SCALE-0 decimals
    (exact integers); the decimal→double conversions go through a
    string cast because int128-backed engines convert wide decimals to
    double inexactly (1 ulp drift vs Spark's correctly-rounded
    BigDecimal path, observed at sf0.001 with the plain cast), whereas
    digits→strtod is correctly rounded everywhere.  SQRT is IEEE-754
    correctly-rounded (unlike ln/exp), so the final expression is
    bit-deterministic.  One map-side-combined aggregate, 3 output rows;
    single scan, no joins.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    xc = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("decimal(18,0)")
    yc = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("decimal(18,0)")
    c = li.select("l_returnflag", xc.alias("xc"), yc.alias("yc"))
    s = c.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("decimal(10,0)").alias("n"),
        F.sum("xc").cast("decimal(19,0)").alias("sx"),
        F.sum("yc").cast("decimal(19,0)").alias("sy"),
        F.sum(F.col("xc") * F.col("xc")).cast("decimal(28,0)").alias("sxx"),
        F.sum(F.col("yc") * F.col("yc")).cast("decimal(28,0)").alias("syy"),
        F.sum(F.col("xc") * F.col("yc")).cast("decimal(28,0)").alias("sxy"),
    )
    _d = exact_double  # see functions/exact.py for the rationale
    # try_divide: a constant series has zero variance — correlation is
    # undefined and DuckDB's double x/0.0 is NULL (r13y hazard class).
    corr = F.try_divide(
        _d(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")),
        F.sqrt(_d(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
        * F.sqrt(_d(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
    )
    return s.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_rows"),
        corr.alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@register(
    "events_winsorized_stats",
    sql="""
    WITH cuts AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p05,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           -- 4dp rounding on the EMITTED cuts only: the engines'
           -- quantile interpolation can differ in the final ulp on
           -- adversarial value pairs (r11 sweep, seed e); the clamp
           -- itself uses the raw cuts, and the winsorized mean is
           -- count x cut arithmetic that matched bit-for-bit
           round(c.p05, 4) AS p05, round(c.p95, 4) AS p95,
           (CAST(SUM(CASE WHEN e.value >= c.p05 AND e.value <= c.p95
                          THEN CAST(e.value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE)
              + CAST(SUM(CASE WHEN e.value < c.p05 THEN 1 ELSE 0 END) AS DOUBLE) * c.p05
              + CAST(SUM(CASE WHEN e.value > c.p95 THEN 1 ELSE 0 END) AS DOUBLE) * c.p95)
           / CAST(COUNT(*) AS DOUBLE) AS winsorized_mean
    FROM events e JOIN cuts c ON e.event_type = c.event_type
    GROUP BY e.event_type, c.p05, c.p95
    ORDER BY e.event_type
    """,
    operators=("A13", "J2", "P7"),
)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust mean per event type: clip values to the exact
    [p05, p95] per-group percentiles, then average.

    Two-pass shape: pass 1 computes the exact interpolated percentiles
    per group (5 groups → tiny), pass 2 re-joins the cuts (broadcast)
    and aggregates.  The clipped sum splits into an EXACT decimal sum
    of in-range values (raw values are 2-dp, so the decimal cast is
    lossless) plus count×cut terms for the tails, evaluated in doubles
    at the end — interpolated cut values never enter a multi-row float
    sum, keeping the result order-insensitive and hash-verifiable.

    Scale: exact percentile sorts per group — fine at bounded group
    cardinality; at 100 TB with high-cardinality groups, switch to
    approx_percentile (t-digest) and drop the external oracle.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    cuts = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    j = ev.join(F.broadcast(cuts), "event_type")
    mid_sum = F.sum(
        F.when(
            (F.col("value") >= F.col("p05")) & (F.col("value") <= F.col("p95")),
            F.col("value").cast("decimal(18,2)"),
        ).otherwise(F.lit(0))
    ).cast("double")
    n_low = F.sum(F.when(F.col("value") < F.col("p05"), 1).otherwise(0)).cast("double")
    n_high = F.sum(F.when(F.col("value") > F.col("p95"), 1).otherwise(0)).cast("double")
    n = F.count(F.lit(1)).cast("double")
    return (
        j.groupBy("event_type", "p05", "p95")
        .agg(
            (
                (mid_sum + n_low * F.col("p05") + n_high * F.col("p95")) / n
            ).alias("winsorized_mean")
        )
        .select(
            "event_type",
            F.round("p05", 4).alias("p05"),
            F.round("p95", 4).alias("p95"),
            "winsorized_mean",
        )
        .orderBy("event_type")
    )


@register(
    "user_activity_gini",
    sql="""
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n_events
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT n_events,
             ROW_NUMBER() OVER (ORDER BY n_events, user_id) AS rnk
      FROM per_user
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           (2.0 * CAST(SUM(rnk * n_events) AS DOUBLE))
             / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(n_events) AS DOUBLE))
           - (CAST(COUNT(*) AS DOUBLE) + 1.0) / CAST(COUNT(*) AS DOUBLE) AS gini
    FROM ranked
    """,
    operators=("A15", "W1"),
)
def user_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration of activity across users as a Gini coefficient —
    the "is 1% of users generating 99% of the corpus?" health check a
    training-data pipeline runs before sampling.

    Uses the rank form G = 2·Σ(i·xᵢ)/(n·Σxᵢ) − (n+1)/n over counts
    sorted ascending (ties totally ordered by user_id).  The global
    rank comes from ``operators/ranks.py::global_row_number`` — range
    repartition + per-partition offsets — NOT an unpartitioned window,
    so the plan holds at any user cardinality (SURVEY §4 hazard: a
    global ORDER BY window is a single-partition collapse).  All sums
    are integers; doubles appear only in the final scalar expression.
    """
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    ranked = global_row_number(per_user, ["n_events", "user_id"], rank_col="rnk")
    n = F.count(F.lit(1)).cast("double")
    tot = F.sum("n_events").cast("double")
    swx = F.sum(F.col("rnk") * F.col("n_events")).cast("double")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_events").alias("total_events"),
        (F.lit(2.0) * swx / (n * tot) - (n + F.lit(1.0)) / n).alias("gini"),
    )


@register(
    "events_reaggregation_chain",
    sql="""
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    operators=("A4", "A6", "A13"),
)
def events_reaggregation_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-aggregate reuse, proven: the engine derives weekly stats by
    CHAINING hour → day → week aggregates (the medallion pattern where
    an hourly gold table feeds the daily table feeds the weekly table),
    while the oracle aggregates the raw events directly — hash equality
    IS the proof that the chain loses nothing for additive measures.

    Why this works: counts and exact-decimal sums are associative, so
    re-summing partials equals the direct aggregate bitwise.  The same
    chain with avg or countDistinct would be WRONG (store exact sums +
    counts, or mergeable sketches — events_mergeable_hll_rollup — and
    finalize at read time).  At 100 TB this is the difference between
    a weekly query scanning 24×7 pre-agg rows per group and rescanning
    a week of raw facts; the chain costs three ever-shrinking keyed
    aggregates, each map-side combined.
    """
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    hour = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
    )
    day = hour.groupBy(
        F.date_trunc("day", "hour_start").alias("day_start"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("sv").alias("sv"))
    week = day.groupBy(
        F.date_trunc("week", "day_start").cast("date").alias("week_start"),
        "event_type",
    ).agg(F.sum("n_events").alias("n_events"), F.sum("sv").alias("sv"))
    return week.select(
        "week_start",
        "event_type",
        "n_events",
        F.col("sv").cast("double").alias("total_value"),
    )


def _hex15_sql(col: str) -> str:
    """Exact hex→int parse of the first 15 md5 digits (SQL): the
    '0x'-prefix BIGINT cast idiom proven cross-engine throughout the
    catalog (textops.analysis.sql_md5_int60) — replaces a hand-unrolled
    15-term strpos polynomial that interpolated the md5 expression 15
    times.  Max value 16^15−1 ≈ 1.15e18, exact in BIGINT."""
    return f"CAST(('0x' || substr({col}, 1, 15)) AS BIGINT)"


@register(
    "orders_content_fingerprint",
    sql=f"""
    WITH rowhash AS (
      SELECT {_hex15_sql("md5(concat_ws('|', "
            "COALESCE(CAST(o_orderkey AS VARCHAR), '<null>'), "
            "COALESCE(CAST(o_custkey AS VARCHAR), '<null>'), "
            "COALESCE(o_orderstatus, '<null>'), "
            "COALESCE(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), '<null>'), "
            "COALESCE(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), '<null>'), "
            "COALESCE(o_orderpriority, '<null>')))")}
        AS h
      FROM orders
    )
    SELECT COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(h AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS VARCHAR)
             AS content_hash
    FROM rowhash
    """,
    operators=("A15", "P4", "Q5"),
)
def orders_content_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table content fingerprint: md5 each row's
    canonical string form, parse the first 15 hex digits to an exact
    integer, SUM — one scalar that changes whenever any row changes,
    comparable across engines, runs, partitionings, and row orders.
    The data-diff primitive: compare fingerprints first (one scan, one
    scalar), run the full snapshot_diff only when they differ.

    Canonicalization rules (must match on every engine): doubles go
    through DECIMAL(18,2) before stringing (raw double→string
    formatting is engine-specific), timestamps through DATE, NULLs
    become an explicit '<null>' sentinel (concat_ws SKIPS nulls, so
    without the sentinel a null moving between columns would not
    change the hash), and columns join on '|'.  The row value is
    < 16^15 so the per-row BIGINT and the DECIMAL(38) sum are both
    exact.  The final hash is emitted as a STRING so engine decimal
    types cannot differ.  Collision odds: summing 60-bit values is not
    cryptographic, but flipping any row changes the sum unless an
    adversary constructs a canceling pair — fine for change DETECTION,
    not for integrity proofs.

    Plan: one scan, map-side md5 + arithmetic, single global aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    nul = F.lit("<null>")
    canon = F.concat_ws(
        "|",
        F.coalesce(F.col("o_orderkey").cast("string"), nul),
        F.coalesce(F.col("o_custkey").cast("string"), nul),
        F.coalesce(F.col("o_orderstatus"), nul),
        F.coalesce(F.col("o_totalprice").cast("decimal(18,2)").cast("string"), nul),
        F.coalesce(F.col("o_orderdate").cast("date").cast("string"), nul),
        F.coalesce(F.col("o_orderpriority"), nul),
    )
    h15 = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("decimal(19,0)")
    return o.select(h15.alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("h").cast("decimal(38,0)").cast("string").alias("content_hash"),
    )


@register(
    "distinct_users_sliding_7d",
    sql="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    ue AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events)
    SELECT d.day AS window_end,
           COUNT(DISTINCT u.user_id) AS n_users_7d
    FROM days d JOIN ue u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY 1
    ORDER BY window_end
    """,
    operators=("A15", "W3", "Q4"),
)
def distinct_users_sliding_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 7-day sliding distinct users — the classically hard rolling
    metric (distinct does NOT reaggregate: you cannot sum daily
    distincts), answered scalably with the bitmap-rollup machinery:
    per-(day, bucket) bitmaps, each replicated to the 7 windows it
    belongs to (map-side, like the spatial neighbor replication), OR-
    merged per window, bit-counted.

    Shuffle payload is |days|×7 bucket-bitmap rows — bounded by the
    DATE RANGE and the occupied id-domain, never the event count; the
    oracle's formulation (a day-spine range join over distinct
    (day, user) pairs) is the semantics spec, but shuffles |days|×|users|
    rows and is the thing NOT to run at lake scale.  Bitmap OR is
    idempotent/commutative, so the window merge is exact, and the same
    stored daily grain answers any window length (7d here, 28d, MTD)
    without touching raw events again.  Output limited to days present
    in the data (left-semi against the observed day set), so partial
    leading windows match the spec exactly.
    """
    from unicargo_medallion_data_pipeline_spark.operators.rollup import (
        BITMAP_BUCKET_COL,
        bitmap_distinct,
        bitmap_grain,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    grain = bitmap_grain(ev, ["day"], "user_id")
    spread = grain.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off")
    ).withColumn("window_end", F.date_add(F.col("day"), F.col("off")))
    merged = spread.groupBy("window_end", BITMAP_BUCKET_COL).agg(
        F.bitmap_or_agg("bitmap").alias("bitmap")
    )
    counts = bitmap_distinct(merged, ["window_end"])
    days = ev.select("day").distinct()
    return (
        counts.join(days, counts.window_end == days.day, "left_semi")
        .select("window_end", F.col("n_distinct").alias("n_users_7d"))
        .orderBy("window_end")
    )
