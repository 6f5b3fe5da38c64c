"""Dataset-health analytics, second batch: quota semantics under the
hash gate, A/B testing, order-statistics window functions, robust MAD.

Registered late in round 4 — these sit OUTSIDE the round-4 driver
window (it is fully allocated to that round's earlier additions) but
are locally oracle-verified at all three SFs and front-load the round-5
window rotation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from unicargo_medallion_data_pipeline_spark.functions.exact import exact_double
from unicargo_medallion_data_pipeline_spark.plans.catalog import register
from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

#: Per-user acceptance cap for the batch quota mirror (streaming/quota.py
#: enforces the same rule incrementally with keyed state).
_QUOTA_LIMIT = 40


@register(
    "events_user_quota_batch",
    sql=f"""
    WITH seq AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts NULLS LAST, event_id NULLS LAST) AS rn
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN rn <= {_QUOTA_LIMIT} THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
           CAST(SUM(CASE WHEN rn > {_QUOTA_LIMIT} THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected,
           MIN(CASE WHEN rn > {_QUOTA_LIMIT} THEN ts_s END) AS first_rejected_epoch
    FROM seq
    GROUP BY user_id
    ORDER BY user_id
    """,
    operators=("W5", "A13", "T6"),
)
def events_user_quota_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-key quota rule (first K events per user accepted, rest
    rejected — ``streaming/quota.py`` enforces it incrementally with
    keyed state) replayed as a BATCH plan and hash-verified: the
    batch-mirror discipline the streaming suite uses, now under the
    driver's oracle rather than pytest alone.

    Arrival order is the total (ts, event_id) order, so acceptance is
    deterministic under ties.  Plan: one user-key exchange shared by
    the row_number window and the per-user aggregate; O(1) window
    state.  At lake scale this is the backfill/repair path for the
    streaming quota (recompute a day's acceptance flags exactly).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    # Arrival order pins NULLS LAST explicitly: Spark defaults ASC
    # NULLS FIRST, other engines NULLS LAST — an unpinned sequence
    # diverges the moment a NULL timestamp appears (round-11 sweep).
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id")
    )
    seq = ev.select(
        "user_id",
        F.unix_timestamp("ts").alias("ts_s"),
        F.row_number().over(w).alias("rn"),
    )
    lim = F.lit(_QUOTA_LIMIT)
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("rn") <= lim, 1).otherwise(0)).alias("n_accepted"),
            F.sum(F.when(F.col("rn") > lim, 1).otherwise(0)).alias("n_rejected"),
            F.min(F.when(F.col("rn") > lim, F.col("ts_s"))).alias(
                "first_rejected_epoch"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "events_ab_value_ttest",
    sql="""
    WITH c AS (
      SELECT user_id % 2 AS arm,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS vc
      FROM events
    ),
    s AS (
      SELECT arm,
             CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
             CAST(SUM(vc) AS DECIMAL(19,0)) AS sx,
             CAST(SUM(vc * vc) AS DECIMAL(28,0)) AS sxx
      FROM c GROUP BY arm
    ),
    f AS (
      SELECT arm,
             CAST(n AS BIGINT) AS n_users_arm,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_value,
             CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 10000.0
               AS var_value
      FROM s
    )
    SELECT a.n_users_arm AS n_a, b.n_users_arm AS n_b,
           a.mean_value AS mean_a, b.mean_value AS mean_b,
           (a.mean_value - b.mean_value)
             / SQRT(a.var_value / a.n_users_arm + b.var_value / b.n_users_arm)
             AS t_stat
    FROM f a CROSS JOIN f b
    WHERE a.arm = 0 AND b.arm = 1
    """,
    operators=("A15", "A14"),
)
def events_ab_value_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t statistic between two deterministic arms
    (user_id parity) over the event value — the experiment-analysis
    primitive, built bit-deterministically: per-arm n/Σx/Σx² as exact
    integer-cents sums, sample variance from the decimal closed form
    through exact_double, then mean-difference over the pooled standard
    error (division/addition/SQRT — all correctly rounded).  The
    p-value is deliberately out of scope: the t→p transform needs the
    incomplete beta function (libm territory, not hash-verifiable);
    consumers threshold the t statistic directly.

    Plan: one 2-group map-side-combined aggregate, then a 2-row self
    join — all post-scan work is on two rows.
    """
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("arm"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("decimal(18,0)")
        .alias("vc"),
    )
    s = ev.groupBy("arm").agg(
        F.count(F.lit(1)).cast("decimal(10,0)").alias("n"),
        F.sum("vc").cast("decimal(19,0)").alias("sx"),
        F.sum(F.col("vc") * F.col("vc")).cast("decimal(28,0)").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    f = s.select(
        "arm",
        F.col("n").cast("bigint").alias("n_users_arm"),
        (F.col("sx").cast("double") / nd / F.lit(100.0)).alias("mean_value"),
        (
            exact_double(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            / (nd * (nd - F.lit(1.0)))
            / F.lit(10000.0)
        ).alias("var_value"),
    )
    a = f.filter(F.col("arm") == 0).alias("a")
    b = f.filter(F.col("arm") == 1).alias("b")
    return a.crossJoin(b).select(
        F.col("a.n_users_arm").alias("n_a"),
        F.col("b.n_users_arm").alias("n_b"),
        F.col("a.mean_value").alias("mean_a"),
        F.col("b.mean_value").alias("mean_b"),
        # try_divide: two zero-variance arms make the pooled standard
        # error 0 — the t statistic is undefined, NULL in both engines
        F.try_divide(
            F.col("a.mean_value") - F.col("b.mean_value"),
            F.sqrt(
                F.col("a.var_value") / F.col("a.n_users_arm")
                + F.col("b.var_value") / F.col("b.n_users_arm")
            ),
        ).alias("t_stat"),
    )


@register(
    "priority_price_extremes",
    sql="""
    WITH w AS (
      SELECT o_orderpriority,
             COUNT(*) OVER win AS n_orders,
             FIRST_VALUE(o_orderkey) OVER win AS cheapest_key,
             NTH_VALUE(o_orderkey, 2) OVER win AS second_cheapest_key,
             LAST_VALUE(o_orderkey) OVER win AS priciest_key,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey NULLS LAST) AS rn
      FROM orders
      WHERE o_totalprice IS NOT NULL
      WINDOW win AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey NULLS LAST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT o_orderpriority, n_orders, cheapest_key, second_cheapest_key,
           priciest_key
    FROM w WHERE rn = 1
    ORDER BY o_orderpriority
    """,
    operators=("W5", "O2"),
)
def priority_price_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The order-statistics window family not yet under the gate:
    FIRST_VALUE / NTH_VALUE / LAST_VALUE over an explicit full-partition
    frame (the default running frame makes LAST_VALUE the CURRENT row —
    the classic window-frame bug this query pins against both engines).
    Total tiebreak (price, orderkey) makes every extreme deterministic.

    Plan: one priority-key exchange, one window pass, rn=1 filter — at
    lake scale prefer the argmin/argmax aggregate form
    (cheapest_shipment_supplier) for the first/last pair; NTH_VALUE is
    the window-only capability this entry exists to verify.
    """
    # Cheapest/priciest are defined over PRICED orders only, and the
    # orderkey tiebreak pins NULLS LAST (round-11 sweep).
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .filter(F.col("o_totalprice").isNotNull())
    )
    order = [F.col("o_totalprice").asc(), F.col("o_orderkey").asc_nulls_last()]
    full = (
        Window.partitionBy("o_orderpriority")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    run = Window.partitionBy("o_orderpriority").orderBy(*order)
    w = o.select(
        "o_orderpriority",
        F.count(F.lit(1)).over(full).alias("n_orders"),
        F.first("o_orderkey").over(full).alias("cheapest_key"),
        F.nth_value("o_orderkey", 2).over(full).alias("second_cheapest_key"),
        F.last("o_orderkey").over(full).alias("priciest_key"),
        F.row_number().over(run).alias("rn"),
    )
    return (
        w.filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("o_orderpriority")
    )


@register(
    "events_value_mad",
    sql="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS median_value
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, m.median_value,
           quantile_cont(ABS(e.value - m.median_value), 0.5) AS mad
    FROM events e JOIN med m ON e.event_type = m.event_type
    GROUP BY e.event_type, m.median_value
    ORDER BY e.event_type
    """,
    operators=("A13", "J2"),
)
def events_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type — the robust dispersion
    companion to the sigma-gate (events_value_outliers): immune to the
    outliers it is used to find.  Two exact-percentile passes: per-group
    median, broadcast back, median of absolute deviations.  ABS and
    subtraction are exact on doubles; the interpolated percentile is the
    proven deterministic pattern (order_value_percentiles).  Scale note
    as there: exact percentiles sort per group — at unbounded group
    cardinality switch to approx_percentile and drop the oracle.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("median_value")
    )
    j = ev.join(F.broadcast(med), "event_type")
    return (
        j.groupBy("event_type", "median_value")
        .agg(
            F.expr("percentile(abs(value - median_value), 0.5)").alias("mad")
        )
        .orderBy("event_type")
    )


@register(
    "latest_orders_with_ties",
    sql="""
    WITH r AS (
      SELECT o_orderpriority, o_orderkey,
             CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
             RANK() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_orderdate DESC NULLS LAST) AS date_rank,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_orderdate DESC NULLS LAST,
                                         o_orderkey NULLS LAST) AS rn
      FROM orders
    )
    SELECT o_orderpriority, o_orderkey, order_date, date_rank, rn
    FROM r WHERE date_rank <= 3
    ORDER BY o_orderpriority, rn
    """,
    operators=("W5", "O3"),
)
def latest_orders_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-INCLUSIVE top-k: every order from each priority's 3 most
    recent order dates.  RANK() keeps whole tie groups — the correct
    semantics for "the latest days' orders", where ROW_NUMBER would
    truncate a tie group at an arbitrary member; the rn column (fully
    tie-broken) is emitted alongside to pin the contrast.  RANK under
    ties is deterministic without a tiebreak (equal keys get equal
    ranks); rn needs the orderkey tiebreak — same discipline as every
    top-k in this engine.  One priority-key exchange, one window pass.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_orderdate"
    )
    wr = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_orderdate").desc_nulls_last()
    )
    wn = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_orderdate").desc_nulls_last(), F.col("o_orderkey").asc_nulls_last()
    )
    r = o.select(
        "o_orderpriority",
        "o_orderkey",
        F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
        F.rank().over(wr).alias("date_rank"),
        F.row_number().over(wn).alias("rn"),
    )
    return (
        r.filter(F.col("date_rank") <= 3)
        .orderBy("o_orderpriority", "rn")
    )


@register(
    "nation_revenue_share_of_region",
    sql="""
    WITH nrev AS (
      SELECT n.n_name, n.n_regionkey,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
               AS rev_dec
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, n.n_regionkey
    )
    SELECT n_name, n_regionkey,
           CAST(rev_dec AS DOUBLE) AS nation_revenue,
           CAST(rev_dec AS DOUBLE)
             / CAST(SUM(rev_dec) OVER (PARTITION BY n_regionkey) AS DOUBLE)
             AS share_of_region,
           CAST(rev_dec AS DOUBLE)
             / CAST(SUM(rev_dec) OVER () AS DOUBLE) AS share_of_total
    FROM nrev
    ORDER BY n_name
    """,
    operators=("W4", "J2", "A13"),
)
def nation_revenue_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent in a dimensional hierarchy (nation → region →
    all): each nation's revenue as a fraction of its region and of the
    total — the drill-path ratio every OLAP tool computes.  Exact
    decimal revenue per nation first (25 rows), THEN the two share
    windows over that bounded aggregate — the windows never see fact
    rows.  The double sums inside the share windows are sums of ≤25
    exactly-representable values (< 2^53), so window order cannot
    perturb them.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    nrev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "n_regionkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("rev_dec")
        )
    )
    wreg = Window.partitionBy("n_regionkey")
    wall = Window.partitionBy()
    rev_d = F.col("rev_dec").cast("double")
    return nrev.select(
        "n_name",
        "n_regionkey",
        rev_d.alias("nation_revenue"),
        (rev_d / F.sum("rev_dec").over(wreg).cast("double")).alias(
            "share_of_region"
        ),
        (rev_d / F.sum("rev_dec").over(wall).cast("double")).alias(
            "share_of_total"
        ),
    ).orderBy("n_name")


@register(
    "monthly_revenue_mom",
    sql="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    )
    SELECT month_start, revenue,
           LAG(revenue) OVER (ORDER BY month_start) AS prev_revenue,
           (revenue - LAG(revenue) OVER (ORDER BY month_start))
             / LAG(revenue) OVER (ORDER BY month_start) * 100.0 AS mom_pct
    FROM m
    ORDER BY month_start
    """,
    operators=("A6", "W5"),
)
def monthly_revenue_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the period-comparison KPI:
    monthly exact-decimal revenue, previous month via LAG, percent
    delta (NULL for the first month in both engines).  The unpartitioned
    LAG window runs over the MONTH grain (≤ ~80 rows for this dataset's
    span), never the fact — the same bounded-window discipline as the
    drift and share queries.  One keyed aggregate + one tiny window.
    """
    # A time series is defined over DATED rows only (round-11 sweep:
    # a NULL month has no position in the LAG sequence and engines
    # disagree on where it sorts).
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderdate", "o_totalprice")
        .filter(F.col("o_orderdate").isNotNull())
    )
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("month_start")  # month grain — bounded, documented
    prev = F.lag("revenue").over(w)
    return m.select(
        "month_start",
        "revenue",
        prev.alias("prev_revenue"),
        ((F.col("revenue") - prev) / prev * F.lit(100.0)).alias("mom_pct"),
    ).orderBy("month_start")


@register(
    "daily_revenue_zscore_28d",
    sql="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS DECIMAL(20,0)) AS y_c
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ),
    w AS (
      SELECT day, y_c,
             CAST(COUNT(*) OVER win AS DECIMAL(10,0)) AS n,
             CAST(SUM(y_c) OVER win AS DECIMAL(28,0)) AS sy,
             CAST(SUM(y_c * y_c) OVER win AS DECIMAL(38,0)) AS syy
      FROM daily
      WINDOW win AS (ORDER BY day ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           CAST(y_c AS DOUBLE) / 100.0 AS revenue,
           CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_28d,
           CASE WHEN n >= 2 THEN
             (CAST(y_c AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             / SQRT(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
           END AS z_28d
    FROM w
    ORDER BY day
    """,
    operators=("W3", "A4", "A14"),
)
def daily_revenue_zscore_28d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed anomaly score: each day's revenue as a z-score against
    the trailing 28 days — the time-aware complement to the global
    sigma gate (events_value_outliers), catching "unusual FOR THIS
    period" rather than "unusual overall".

    Fully deterministic via the established discipline: the rolling
    Σy / Σy² run over integer-cents DECIMALS inside the ROWS frame
    (window accumulation order cannot matter when the sum is exact),
    the variance numerator nΣy²−(Σy)² stays in scale-0 decimals through
    exact_double, and the only double math is the final closed form
    with correctly-rounded SQRT.  First-day windows (n=1) emit NULL
    rather than 0/0 NaN.  One day-grain aggregate + one window over
    day-grain rows — bounded by the calendar, never the fact.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderdate", "o_totalprice")
        .filter(F.col("o_orderdate").isNotNull())  # dated universe (r11 sweep)
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(20,0)")
        .alias("y_c")
    )
    win = Window.orderBy("day").rowsBetween(-27, Window.currentRow)
    w = daily.select(
        "day",
        "y_c",
        F.count(F.lit(1)).over(win).cast("decimal(10,0)").alias("n"),
        F.sum("y_c").over(win).cast("decimal(28,0)").alias("sy"),
        F.sum(F.col("y_c") * F.col("y_c")).over(win).cast("decimal(38,0)").alias("syy"),
    )
    y_d = F.col("y_c").cast("double")
    n_d = F.col("n").cast("double")
    sy_d = F.col("sy").cast("double")
    # try_divide twice: a 1-row window has n(n-1) = 0 (variance
    # undefined) and a constant window has sd = 0 (z undefined) —
    # NULL in both engines, never an ANSI abort (r13y hazard class)
    z = F.try_divide(
        y_d - sy_d / n_d,
        F.sqrt(
            F.try_divide(
                exact_double(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
                n_d * (n_d - F.lit(1.0)),
            )
        ),
    )
    return w.select(
        "day",
        (y_d / F.lit(100.0)).alias("revenue"),
        (sy_d / n_d / F.lit(100.0)).alias("mean_28d"),
        F.when(F.col("n") >= 2, z).alias("z_28d"),
    ).orderBy("day")


@register(
    "corpus_type_token_ratio",
    sql=r"""
    WITH tok AS (
      SELECT lang, unnest(string_split(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT token) AS n_types,
           CAST(COUNT(DISTINCT token) AS DOUBLE) / COUNT(*) AS type_token_ratio
    FROM tok
    GROUP BY lang
    ORDER BY lang
    """,
    operators=("A13", "P4"),
)
def corpus_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per language — type/token ratio, the corpus
    health metric that flags both boilerplate floods (TTR collapses)
    and tokenizer breakage (TTR explodes).  Tokenization is the
    engine's canonical whitespace normalization (textops/analysis.py,
    byte-identical to the SQL macro used by the token-stats queries).

    Plan: explode → one (lang, token)-keyed distinct + lang aggregate;
    Spark's count_distinct handles the two-level shuffle.  At 100 TB
    the exact distinct over tokens is the expensive half — swap in
    approx_count_distinct (HLL) for monitoring and keep the exact form
    for audits.
    """
    from unicargo_medallion_data_pipeline_spark.textops import analysis as ta

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(ta.tokens("text")).alias("token"))
    return (
        tok.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("token").alias("n_types"),
            (
                F.countDistinct("token").cast("double") / F.count(F.lit(1))
            ).alias("type_token_ratio"),
        )
        .orderBy("lang")
    )


@register(
    "customer_rfm_scores",
    sql="""
    WITH ref AS (
      SELECT MAX(CAST(o_orderdate AS DATE)) AS ref_day FROM orders
      WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
    ),
    base AS (
      SELECT o.o_custkey AS c_custkey,
             DATEDIFF('day', MAX(CAST(o.o_orderdate AS DATE)), r.ref_day)
               AS recency_days,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
      FROM (SELECT * FROM orders
            WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL) o
      CROSS JOIN ref r
      GROUP BY o.o_custkey, r.ref_day
    ),
    scored AS (
      SELECT c_custkey, recency_days, n_orders, monetary,
             NTILE(5) OVER (ORDER BY recency_days, c_custkey) AS r_q,
             NTILE(5) OVER (ORDER BY -n_orders, c_custkey) AS f_q,
             NTILE(5) OVER (ORDER BY -monetary, c_custkey) AS m_q
      FROM base
    )
    SELECT c_custkey, recency_days, n_orders, monetary, r_q, f_q, m_q,
           CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR) || CAST(m_q AS VARCHAR)
             AS rfm_code
    FROM scored
    ORDER BY c_custkey
    """,
    operators=("W5", "A13", "P4"),
)
def customer_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency / frequency / monetary
    quintiles plus the concatenated RFM code, the classic marketing
    segmentation table.  Quintile 1 is best on every axis (most recent,
    most orders, highest spend), encoded by ranking on negated F/M.

    All three quintile assignments run through ``operators/ranks.py::
    global_ntile`` — the range-partitioned form with NO unpartitioned
    window, exact NTILE semantics (first total%5 tiles get the extra
    row), and (value, custkey) total tiebreaks so ties cannot float
    between quintiles across runs.  The oracle uses plain NTILE windows
    — declarative mirror of the distributed rank.  Monetary is an
    exact-decimal sum; the negation trick keeps ascending-order ntile
    semantics identical in both engines.
    """
    from unicargo_medallion_data_pipeline_spark.operators.ranks import global_ntile

    # An RFM profile needs dated, priced orders: undated rows have no
    # recency and unpriced rows no monetary value, and a NULL entering
    # an NTILE ordering diverges across engines (round-11 sweep).
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .filter(F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull())
    )
    ref = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("ref_day"))
    base = (
        o.crossJoin(F.broadcast(ref))
        .groupBy(F.col("o_custkey").alias("c_custkey"), "ref_day")
        .agg(
            F.datediff(F.col("ref_day"), F.max(F.col("o_orderdate").cast("date"))).alias(
                "_r"
            ),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
        .select(
            "c_custkey",
            F.col("_r").alias("recency_days"),
            "n_orders",
            "monetary",
            (-F.col("n_orders")).alias("_neg_f"),
            (-F.col("monetary")).alias("_neg_m"),
        )
    )
    r = global_ntile(base, 5, ["recency_days", "c_custkey"], tile_col="r_q")
    f = global_ntile(r, 5, ["_neg_f", "c_custkey"], tile_col="f_q")
    m = global_ntile(f, 5, ["_neg_m", "c_custkey"], tile_col="m_q")
    return m.select(
        "c_custkey",
        "recency_days",
        "n_orders",
        "monetary",
        "r_q",
        "f_q",
        "m_q",
        F.concat(
            F.col("r_q").cast("string"),
            F.col("f_q").cast("string"),
            F.col("m_q").cast("string"),
        ).alias("rfm_code"),
    ).orderBy("c_custkey")


@register(
    "revenue_dow_seasonality",
    sql="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
               AS rev
      FROM orders GROUP BY 1
    )
    SELECT dayofweek(day) + 1 AS dow,
           COUNT(*) AS n_days,
           CAST(CAST(SUM(rev) AS DECIMAL(38,2)) AS DOUBLE)
             / COUNT(*) AS mean_daily_revenue,
           (CAST(CAST(SUM(rev) AS DECIMAL(38,2)) AS DOUBLE) / COUNT(*))
             / ((SELECT CAST(CAST(SUM(rev) AS DECIMAL(38,2)) AS DOUBLE)
                 FROM daily)
                / (SELECT CAST(COUNT(*) AS DOUBLE) FROM daily))
             AS seasonal_index
    FROM daily
    GROUP BY 1
    ORDER BY dow
    """,
    operators=("A10", "A14"),
)
def revenue_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality indices: each weekday's mean daily
    revenue relative to the overall daily mean (index 1.0 = typical
    day) — the multiplicative seasonal factors a demand forecast
    divides out.  Exact decimal day sums feed both the per-dow and
    global means; the index is a ratio of two deterministic doubles.
    DOW numbering is remapped in the oracle (+1): Spark's dayofweek is
    1=Sunday..7, DuckDB's is 0=Sunday..6 — the same off-by-one family
    as the reference's Sunday=1 bug (SURVEY §4), pinned here instead of
    papered over.  Two day-grain aggregates + a broadcast
    scalar — fact rows are touched once.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("rev")
    )
    glob = daily.agg(
        F.sum("rev").cast("decimal(38,2)").cast("double").alias("g_rev"),
        F.count(F.lit(1)).cast("double").alias("g_days"),
    )
    dow = daily.groupBy(F.dayofweek("day").alias("dow")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("rev").cast("decimal(38,2)").cast("double").alias("s_rev"),
    )
    return (
        dow.crossJoin(F.broadcast(glob))
        .select(
            "dow",
            "n_days",
            (F.col("s_rev") / F.col("n_days")).alias("mean_daily_revenue"),
            (
                (F.col("s_rev") / F.col("n_days"))
                / (F.col("g_rev") / F.col("g_days"))
            ).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


@register(
    "funnel_time_to_convert",
    sql="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    ),
    lags AS (
      SELECT 'view_to_click' AS stage,
             CAST(floor(epoch(c.t_click)) AS BIGINT)
               - CAST(floor(epoch(v.t_view)) AS BIGINT) AS lag_s
      FROM c JOIN v ON c.user_id = v.user_id
      UNION ALL
      SELECT 'click_to_purchase' AS stage,
             CAST(floor(epoch(p.t_purchase)) AS BIGINT)
               - CAST(floor(epoch(c.t_click)) AS BIGINT) AS lag_s
      FROM p JOIN c ON p.user_id = c.user_id
    )
    SELECT stage, COUNT(*) AS n_users,
           quantile_cont(lag_s, 0.5) AS median_lag_s,
           quantile_cont(lag_s, 0.9) AS p90_lag_s
    FROM lags GROUP BY stage
    ORDER BY stage
    """,
    operators=("A13", "J2", "T6"),
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How LONG conversion takes, not just whether it happens: median
    and p90 first-touch-to-first-touch latency for each funnel stage
    (same strictly-ordered stage semantics as events_funnel_conversion).
    Lags are whole-second integers, so the interpolated percentiles are
    the proven deterministic pattern.  Stage frames shrink every hop;
    the percentile sort runs over the CONVERTED population only.
    """
    from unicargo_medallion_data_pipeline_spark.plans.events_gold import (
        funnel_stage_frames,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v, c, p = funnel_stage_frames(ev)
    vc = c.join(v, "user_id").select(
        F.lit("view_to_click").alias("stage"),
        (F.unix_timestamp("t_click") - F.unix_timestamp("t_view")).alias("lag_s"),
    )
    cp = p.join(c.select("user_id", "t_click"), "user_id").select(
        F.lit("click_to_purchase").alias("stage"),
        (F.unix_timestamp("t_purchase") - F.unix_timestamp("t_click")).alias("lag_s"),
    )
    return (
        vc.unionByName(cp)
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.expr("percentile(lag_s, 0.5)").alias("median_lag_s"),
            F.expr("percentile(lag_s, 0.9)").alias("p90_lag_s"),
        )
        .orderBy("stage")
    )


@register(
    "dedup_savings_by_source",
    sql=r"""
    WITH fp AS (
      SELECT doc_id, source,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
             len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
               AS n_tokens
      FROM documents
    ),
    flagged AS (
      SELECT source, n_tokens,
             doc_id = MIN(doc_id) OVER (PARTITION BY fingerprint) AS keep
      FROM fp
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN keep THEN 0 ELSE n_tokens END) AS BIGINT)
             AS tokens_saved,
           CAST(SUM(CASE WHEN keep THEN 0 ELSE n_tokens END) AS DOUBLE)
             / SUM(n_tokens) * 100.0 AS savings_pct
    FROM flagged
    GROUP BY source
    ORDER BY source
    """,
    operators=("P10", "A13", "W5"),
)
def dedup_savings_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup REPORT: per source, how many documents and tokens the
    exact-fingerprint pass removes — the artifact that justifies (or
    kills) a dedup stage in a curation pipeline.  Global fingerprint
    partitioning (dups counted wherever they hide), savings attributed
    to the source of each DROPPED copy (the canonical keeper is the
    min doc_id, same rule as doc_fingerprint_dedup).  Integer token
    counts keep every measure exact; one fingerprint-keyed window +
    one source aggregate.
    """
    from unicargo_medallion_data_pipeline_spark.textops import analysis as ta

    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        "source",
        ta.fingerprint("text").alias("fingerprint"),
        ta.token_count("text").alias("n_tokens"),
    )
    w = Window.partitionBy("fingerprint")
    flagged = fp.select(
        "source",
        "n_tokens",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
    )
    saved = F.sum(F.when(F.col("keep"), 0).otherwise(F.col("n_tokens")))
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("n_dropped"),
            F.sum("n_tokens").alias("tokens_total"),
            saved.alias("tokens_saved"),
            (saved.cast("double") / F.sum("n_tokens") * F.lit(100.0)).alias(
                "savings_pct"
            ),
        )
        .orderBy("source")
    )


@register(
    "revenue_top_decile_share",
    sql="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS DECIMAL(20,0)) AS rev_c
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY o_custkey
    ),
    tiled AS (
      SELECT o_custkey, rev_c,
             NTILE(10) OVER (ORDER BY -rev_c, o_custkey) AS decile
      FROM cust
    )
    SELECT COUNT(*) AS n_customers,
           CAST(CAST(SUM(CASE WHEN decile = 1 THEN rev_c ELSE 0 END)
                     AS DECIMAL(28,0)) AS DOUBLE) / 100.0
             AS top_decile_revenue,
           CAST(CAST(SUM(rev_c) AS DECIMAL(28,0)) AS DOUBLE) / 100.0
             AS total_revenue,
           CAST(CAST(SUM(CASE WHEN decile = 1 THEN rev_c ELSE 0 END)
                     AS DECIMAL(28,0)) AS DOUBLE)
             / CAST(CAST(SUM(rev_c) AS DECIMAL(28,0)) AS DOUBLE)
             AS top_decile_share
    FROM tiled
    """,
    operators=("W5", "A15"),
)
def revenue_top_decile_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration, pointwise: the share of revenue from the
    top 10% of customers — the number executives quote and the Gini's
    (user_activity_gini) interpretable companion.  Customer revenue in
    exact integer cents, deciles from the range-partitioned
    global_ntile (decile 1 = highest spenders via negated ordering, full
    tiebreak), exact decimal sums per side, doubles only in the final
    division.
    """
    from unicargo_medallion_data_pipeline_spark.operators.ranks import global_ntile

    # Priced universe: an all-NULL-price customer would carry a NULL
    # revenue into the decile ordering (round-11 sweep).
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .filter(F.col("o_totalprice").isNotNull())
    )
    cust = o.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(20,0)")
        .alias("rev_c")
    )
    tiled = global_ntile(
        cust.withColumn("_neg", -F.col("rev_c")), 10, ["_neg", "o_custkey"],
        tile_col="decile",
    )
    top = F.sum(F.when(F.col("decile") == 1, F.col("rev_c")).otherwise(0)).cast(
        "decimal(28,0)"
    )
    tot = F.sum("rev_c").cast("decimal(28,0)")
    return tiled.agg(
        F.count(F.lit(1)).alias("n_customers"),
        (top.cast("double") / F.lit(100.0)).alias("top_decile_revenue"),
        (tot.cast("double") / F.lit(100.0)).alias("total_revenue"),
        (top.cast("double") / tot.cast("double")).alias("top_decile_share"),
    )


@register(
    "hourly_error_rate_24h",
    sql="""
    WITH hourly AS (
      SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600)
                  AS TIMESTAMP) AS hour_start,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_errors,
             COUNT(*) AS n_events
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    )
    SELECT hour_start, n_errors, n_events,
           CAST(SUM(n_errors) OVER w AS BIGINT) AS errors_24h,
           CAST(SUM(n_events) OVER w AS BIGINT) AS events_24h,
           CAST(SUM(n_errors) OVER w AS DOUBLE)
             / CAST(SUM(n_events) OVER w AS DOUBLE) * 100.0 AS error_rate_24h_pct
    FROM hourly
    WINDOW w AS (ORDER BY hour_start ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    ORDER BY hour_start
    """,
    operators=("W3", "A4", "Q1"),
)
def hourly_error_rate_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO burn monitoring: each hour's trailing-24h error rate — the
    event-weighted rolling ratio (integer window sums, one division per
    row; the avg-of-hourly-rates form would both mislead operationally
    and break hash verification).  Window runs over HOUR-grain rows —
    bounded by the calendar.  The streaming twin is a watermarked
    sliding window (streaming/windows.py); this is its exact batch
    backfill.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .select("ts", "event_type")
        .filter(F.col("ts").isNotNull())  # timed universe (r11 sweep)
    )
    hourly = ev.groupBy(
        F.timestamp_seconds(
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("bigint")
        ).alias("hour_start")
    ).agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_errors"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.orderBy("hour_start").rowsBetween(-23, Window.currentRow)
    return hourly.select(
        "hour_start",
        "n_errors",
        "n_events",
        F.sum("n_errors").over(w).alias("errors_24h"),
        F.sum("n_events").over(w).alias("events_24h"),
        (
            F.sum("n_errors").over(w).cast("double")
            / F.sum("n_events").over(w).cast("double")
            * F.lit(100.0)
        ).alias("error_rate_24h_pct"),
    ).orderBy("hour_start")


@register(
    "daily_new_vs_returning",
    sql="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    first_day AS (
      SELECT user_id, MIN(day) AS d0 FROM ud GROUP BY user_id
    )
    SELECT ud.day,
           CAST(SUM(CASE WHEN ud.day = f.d0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(SUM(CASE WHEN ud.day > f.d0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning
    FROM ud JOIN first_day f ON ud.user_id = f.user_id
    GROUP BY ud.day
    ORDER BY ud.day
    """,
    operators=("A4", "J2", "A13"),
)
def daily_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The growth-accounting split: per day, active users who are NEW
    (first-ever activity) vs RETURNING — the daily companion to
    user_weekly_retention's cohort view.  User-grain first-touch joined
    back to the (user, day) activity grain; all intermediates are
    user- or day-grain, never event-grain past the first distinct.
    """
    ud = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    first_day = ud.groupBy("user_id").agg(F.min("day").alias("d0"))
    return (
        ud.join(first_day, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("d0"), 1).otherwise(0)).alias("n_new"),
            F.sum(F.when(F.col("day") > F.col("d0"), 1).otherwise(0)).alias(
                "n_returning"
            ),
        )
        .orderBy("day")
    )


@register(
    "user_longest_streak",
    sql="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    islands AS (
      SELECT user_id, day,
             CAST(day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                             AS INTEGER) AS DATE) AS island_key
      FROM ud
    ),
    streaks AS (
      SELECT user_id, island_key, COUNT(*) AS streak_len
      FROM islands GROUP BY user_id, island_key
    )
    SELECT user_id,
           MAX(streak_len) AS longest_streak_days,
           COUNT(*) AS n_streaks
    FROM streaks
    GROUP BY user_id
    ORDER BY user_id
    """,
    operators=("W5", "A13"),
)
def user_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active
    days (plus how many distinct runs they had) — the engagement-streak
    metric, via the classic island key ``day − row_number`` (consecutive
    days share a constant anchor date; any gap shifts it).  Purely
    integer/date arithmetic, one user-key window + two aggregates —
    the pattern every "streak" feature reduces to.
    """
    ud = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = ud.select(
        "user_id",
        "day",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("island_key"),
    )
    streaks = islands.groupBy("user_id", "island_key").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("streak_len").alias("longest_streak_days"),
            F.count(F.lit(1)).alias("n_streaks"),
        )
        .orderBy("user_id")
    )


@register(
    "nation_supplier_hhi",
    sql="""
    WITH srev AS (
      SELECT s.s_nationkey, l.l_suppkey,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 100
                  AS DECIMAL(20,0)) AS rev_c
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey
    ),
    agg AS (
      SELECT s_nationkey,
             COUNT(*) AS n_suppliers,
             CAST(SUM(rev_c * rev_c) AS DECIMAL(38,0)) AS sum_sq,
             CAST(SUM(rev_c) AS DECIMAL(28,0)) AS tot
      FROM srev GROUP BY s_nationkey
    )
    SELECT a.s_nationkey, n.n_name, a.n_suppliers,
           CAST(CAST(a.sum_sq AS VARCHAR) AS DOUBLE)
             / (CAST(CAST(a.tot AS VARCHAR) AS DOUBLE)
                * CAST(CAST(a.tot AS VARCHAR) AS DOUBLE)) AS hhi
    FROM agg a JOIN nation n ON a.s_nationkey = n.n_nationkey
    ORDER BY a.s_nationkey
    """,
    operators=("A13", "J2", "A14"),
)
def nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman supplier concentration per nation: HHI =
    Σrevᵢ² / (Σrevᵢ)² ∈ (1/n, 1] — the antitrust-style "is this
    nation's supply dominated by a few suppliers?" metric,
    complementing Gini (inequality) and top-decile share (pointwise).
    The share-squared SUM is kept exact: integer-cents revenues, Σrev²
    and (Σrev)² in scale-0 decimals through exact_double (squaring
    shares first would float-sum in engine order).  One supplier-grain
    aggregate, one nation aggregate, broadcast name join.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    srev = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("decimal(20,0)")
            .alias("rev_c")
        )
    )
    agg = srev.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.col("rev_c") * F.col("rev_c")).cast("decimal(38,0)").alias("sum_sq"),
        F.sum("rev_c").cast("decimal(28,0)").alias("tot"),
    )
    # try_divide: a nation whose every supplier revenue is 0 has a 0
    # denominator — concentration is undefined, NULL in both engines
    hhi = F.try_divide(
        exact_double(F.col("sum_sq")),
        exact_double(F.col("tot")) * exact_double(F.col("tot")),
    )
    return (
        agg.join(F.broadcast(n), agg.s_nationkey == n.n_nationkey)
        .select("s_nationkey", "n_name", "n_suppliers", hhi.alias("hhi"))
        .orderBy("s_nationkey")
    )


@register(
    "daily_reactivations",
    sql="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    seq AS (
      SELECT user_id, day,
             LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
      FROM ud
    )
    SELECT day,
           CAST(SUM(CASE WHEN prev_day IS NOT NULL
                     AND day - prev_day >= 7 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_reactivated,
           CAST(SUM(CASE WHEN prev_day IS NOT NULL
                     AND day - prev_day = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_continuing
    FROM seq
    GROUP BY day
    ORDER BY day
    """,
    operators=("W5", "A4"),
)
def daily_reactivations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-and-return accounting: per day, users REACTIVATING after a
    ≥7-day absence vs users continuing a streak (active yesterday) —
    the engagement-mix metric between daily_new_vs_returning (ever-new)
    and user_longest_streak (run lengths).  One user-key LAG over the
    (user, day) grain, then a day aggregate; date subtraction is exact
    integer-day arithmetic in both engines.
    """
    ud = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    seq = ud.withColumn("prev_day", F.lag("day").over(w))
    gap = F.datediff(F.col("day"), F.col("prev_day"))
    return (
        seq.groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("prev_day").isNotNull() & (gap >= 7), 1).otherwise(0)
            ).alias("n_reactivated"),
            F.sum(
                F.when(F.col("prev_day").isNotNull() & (gap == 1), 1).otherwise(0)
            ).alias("n_continuing"),
        )
        .orderBy("day")
    )


@register(
    "record_revenue_days",
    sql="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS DECIMAL(20,0)) AS rev_c
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ),
    runs AS (
      SELECT day, rev_c,
             MAX(rev_c) OVER (ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prior_max_c
      FROM daily
    )
    SELECT day,
           CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
           CAST(prior_max_c AS DOUBLE) / 100.0 AS prior_record,
           CAST(CAST(rev_c - prior_max_c AS VARCHAR) AS DOUBLE) / 100.0
             AS margin
    FROM runs
    WHERE prior_max_c IS NULL OR rev_c > prior_max_c
    ORDER BY day
    """,
    operators=("W3", "A4", "P7"),
)
def record_revenue_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-time-high detection: the days whose revenue broke every
    prior record (running-max frame ending 1 PRECEDING, so the first
    day qualifies with a NULL prior record) plus the margin over the
    old record — the "new record!" feed.  Revenue comparisons happen in
    integer cents (record-breaking must not hinge on a float ulp); the
    running MAX over a monotone frame is order-exact by definition.
    Window runs at day grain — bounded by the calendar.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderdate", "o_totalprice")
        .filter(F.col("o_orderdate").isNotNull())  # dated universe (r11 sweep)
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(20,0)")
        .alias("rev_c")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    runs = daily.withColumn("prior_max_c", F.max("rev_c").over(w))
    return (
        runs.filter(
            F.col("prior_max_c").isNull() | (F.col("rev_c") > F.col("prior_max_c"))
        )
        .select(
            "day",
            (F.col("rev_c").cast("double") / F.lit(100.0)).alias("revenue"),
            (F.col("prior_max_c").cast("double") / F.lit(100.0)).alias(
                "prior_record"
            ),
            (
                (F.col("rev_c") - F.col("prior_max_c"))
                .cast("string")
                .cast("double")
                / F.lit(100.0)
            ).alias("margin"),
        )
        .orderBy("day")
    )


@register(
    "customer_running_balance",
    sql="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey,
             CAST(o_orderdate AS DATE) AS order_date,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(20,0))
               AS amt_c,
             ROW_NUMBER() OVER w AS order_seq,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS DECIMAL(20,0))) OVER
               (PARTITION BY o_custkey
                ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST,
                         o_totalprice NULLS LAST
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DECIMAL(28,0)) AS bal_c
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST,
                            o_totalprice NULLS LAST)
    )
    SELECT o_custkey, o_orderkey, order_date, order_seq,
           CAST(amt_c AS DOUBLE) / 100.0 AS order_amount,
           CAST(bal_c AS DOUBLE) / 100.0 AS running_total
    FROM seq
    WHERE o_custkey % 100 = 0
    ORDER BY o_custkey, order_seq
    """,
    operators=("W3", "W5", "A13"),
)
def customer_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bank-statement pattern: each customer's orders in time order
    with sequence number and running lifetime spend — the per-entity
    cumulative ledger every account view renders.  The running SUM is
    an integer-cents decimal over a (custkey)-partitioned window with a
    total (date, orderkey) tiebreak — exact at any parallelism, O(1)
    frame state, partition-parallel across customers (never a global
    window).  Output thinned to every 100th customer purely to keep
    the oracle row count proportionate; the plan is identical without
    the filter.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    amt_c = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("decimal(20,0)")
    # Statement order pins NULLS LAST and includes the amount in the
    # tiebreak: near-duplicate rows differing only in price must
    # sequence identically in both engines (round-11 sweep).
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last(F.col("o_orderdate").cast("date")),
        F.asc_nulls_last("o_orderkey"),
        F.asc_nulls_last("o_totalprice"),
    )
    seq = o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        amt_c.alias("amt_c"),
        F.row_number().over(w).alias("order_seq"),
        F.sum(amt_c)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("decimal(28,0)")
        .alias("bal_c"),
    )
    return (
        seq.filter(F.col("o_custkey") % 100 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            "order_date",
            "order_seq",
            (F.col("amt_c").cast("double") / F.lit(100.0)).alias("order_amount"),
            (F.col("bal_c").cast("double") / F.lit(100.0)).alias("running_total"),
        )
        .orderBy("o_custkey", "order_seq")
    )


@register(
    "daily_revenue_autocorr",
    sql="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS DECIMAL(20,0)) AS y_c
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ),
    pairs AS (
      SELECT y_c AS y, LAG(y_c) OVER (ORDER BY day) AS x
      FROM daily
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
             CAST(SUM(x) AS DECIMAL(28,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(28,0)) AS sy,
             CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy,
             CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy
      FROM pairs WHERE x IS NOT NULL
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / (SQRT(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
                * SQRT(CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)))
             AS lag1_autocorr
    FROM s
    """,
    operators=("W5", "A14", "A15"),
)
def daily_revenue_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of daily revenue — the persistence
    diagnostic a forecaster checks before choosing a model (white noise
    vs momentum).  The Pearson machinery applied to the self-lagged
    day series: integer-cents pairs via LAG over the day grain, exact
    decimal sums, closed form through exact_double with
    correctly-rounded SQRT.  Width note: n·Σxy at scale-0 cents² can
    reach ~1e21 — exact in DECIMAL(38), and the string-routed
    conversion keeps the final doubles bit-identical.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderdate", "o_totalprice")
        .filter(F.col("o_orderdate").isNotNull())  # dated universe (r11 sweep)
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(20,0)")
        .alias("y_c")
    )
    w = Window.orderBy("day")  # day grain — bounded, documented
    pairs = daily.select(
        F.col("y_c").alias("y"), F.lag("y_c").over(w).alias("x")
    ).filter(F.col("x").isNotNull())
    s = pairs.agg(
        F.count(F.lit(1)).cast("decimal(10,0)").alias("n"),
        F.sum("x").cast("decimal(28,0)").alias("sx"),
        F.sum("y").cast("decimal(28,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    # try_divide: a constant series has zero variance — correlation is
    # undefined and DuckDB's double x/0.0 is NULL (r13y hazard class).
    corr = F.try_divide(
        exact_double(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")),
        F.sqrt(exact_double(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
        * F.sqrt(exact_double(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_pairs"), corr.alias("lag1_autocorr")
    )


@register(
    "events_hourly_burstiness",
    sql="""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_idx,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
             CAST(SUM(c) AS DECIMAL(19,0)) AS sx,
             CAST(SUM(c * c) AS DECIMAL(28,0)) AS sxx
      FROM hourly GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_hours,
           CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_per_hour,
           CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_per_hour,
           (CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
             / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS fano_factor
    FROM s
    ORDER BY event_type
    """,
    operators=("A13", "A14"),
)
def events_hourly_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness per event type: the Fano factor (variance /
    mean of hourly counts — 1 ≈ Poisson arrivals, >1 bursty, <1
    regular), the dispersion diagnostic capacity planning and anomaly
    thresholds depend on.  Hourly counts are integers, so Σx / Σx² are
    exact; variance through the decimal closed form + exact_double;
    three final double divisions.  ACTIVE hours only (an empty hour
    contributes no row) — declared spec, identical in both engines.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("hour_idx"),
    ).agg(F.count(F.lit(1)).alias("c"))
    s = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(10,0)").alias("n"),
        F.sum("c").cast("decimal(19,0)").alias("sx"),
        F.sum(F.col("c") * F.col("c")).cast("decimal(28,0)").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    # try_divide: a single-hour group has n(n-1) = 0 — sample variance
    # is undefined and DuckDB's double x/0.0 is NULL (r13y sweep seed).
    var = F.try_divide(
        exact_double(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
        nd * (nd - F.lit(1.0)),
    )
    mean = F.col("sx").cast("double") / nd
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_hours"),
        mean.alias("mean_per_hour"),
        var.alias("var_per_hour"),
        (var / mean).alias("fano_factor"),
    ).orderBy("event_type")
