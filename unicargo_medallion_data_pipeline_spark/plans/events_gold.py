"""Event-sequence analytics: conversion funnel, cohort retention,
transition matrix.

The product-analytics trio every event pipeline ships: "how many users
complete view→click→purchase in order", "of the users who first showed
up in week W, how many were still active in week W+k", and "which event
usually follows which".  All three are pure groupBy/window/join
compositions over the events fact — no UDFs, no driver loops — and all
outputs are integers/dates, so they hash-verify bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from unicargo_medallion_data_pipeline_spark.plans.catalog import register
from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
from unicargo_medallion_data_pipeline_spark.textops import analysis as ta


def funnel_stage_frames(ev: DataFrame):
    """The strictly-ordered view → click → purchase stage frames
    (first-touch timestamps per user; step k counts only AFTER the
    user's first step-(k−1) event).  ONE definition shared by
    events_funnel_conversion and analytics_gold2's
    funnel_time_to_convert — a one-sided edit to the ordering rule
    (e.g. ``>=`` instead of ``>``) must not silently de-synchronize the
    two funnels' populations."""
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "t_click"), "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return v, c, p


@register(
    "events_funnel_conversion",
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
    )
    SELECT
      (SELECT COUNT(*) FROM v) AS n_viewed,
      (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
      (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
    operators=("A2", "A15", "J2"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel view → click → purchase:
    users counted at step k only if step k's first event happens AFTER
    their first step-(k−1) event.

    Each stage is a type-filtered aggregate equi-joined on user_id to
    the previous stage's first-touch timestamps — keyed shuffles on the
    funnel population (which shrinks every stage), never a window over
    the whole fact.  The unordered "has all three types" shortcut gives
    WRONG funnels (a purchase before the first view must not count) —
    sequencing needs the stage joins.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v, c, p = funnel_stage_frames(ev)
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )


#: Deterministic user-day activity thinning (keep ~1 in 5).  The synthetic
#: corpus has every user active essentially every day, which collapses
#: cohort analysis to a single cohort; hashing (user_id, day) spreads
#: first-activity days across the month IDENTICALLY on both engines, so
#: the retention matrix has real structure to verify.  Production drops
#: this filter — the operator shape is unchanged.
_THIN_SQL = (
    ta.sql_md5_int60(
        "CAST(user_id AS VARCHAR) || ':' || CAST(CAST(ts AS DATE) AS VARCHAR)"
    )
    + " % 5 = 0"
)


@register(
    "user_weekly_retention",
    sql=f"""
    WITH thinned AS (
      SELECT user_id, ts FROM events WHERE {_THIN_SQL}
    ),
    first_week AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM thinned GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
      FROM thinned
    )
    SELECT
      f.cohort_week,
      CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INT) AS week_offset,
      COUNT(*) AS n_users
    FROM first_week f JOIN active a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
    operators=("A13", "J2", "P11"),
    bench=True,  # r8 verdict task 3: stateful/mutation/iterative bench anchors
)
def user_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their first
    (thinned) activity, counted in every later week they were active
    (long-form (cohort_week, week_offset, n_users) — the pivot to a
    triangle matrix is presentation, not computation).

    Shape: one aggregate for first-touch (user grain), one distinct for
    (user, week) activity — both partial-aggregate map-side — then an
    equi-join on user_id and a final small aggregate.  Both
    intermediates are user-grain (≪ fact), so the join shuffles rows
    proportional to |users|·|weeks|, not |events|.  The deterministic
    hash thinning (see ``_THIN_SQL``) exists only to de-degenerate the
    synthetic corpus's everyone-active-always pattern.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    day = F.col("ts").cast("date")
    thin_key = ta.md5_int60(
        F.concat(F.col("user_id").cast("string"), F.lit(":"), day.cast("string"))
    )
    thinned = ev.filter(thin_key % 5 == 0)
    # ONE pass over events instead of two, and no user-grain join (r15,
    # guide §2.3-2.4): the pre-r15 plan scanned + md5-thinned events
    # twice (first-touch aggregate AND activity distinct), then joined
    # the two user-grain frames back together.  The cohort week is just
    # min(active_week) per user (date_trunc is monotone, so trunc(min
    # ts) == min(trunc ts) over the user's distinct weeks), so the
    # activity distinct ALONE carries everything: dedup to (user, week)
    # first — full map-side partial aggregation, so the exchange moves
    # user-week grain, never raw events — then attach the cohort with a
    # per-user min window over that deduped frame.  NULL user_ids /
    # NULL ts never reach this point — the md5 thinning key is NULL for
    # them in both engines, so the former join's NULL-key drop is
    # preserved exactly.  Values re-proven against the oracle +
    # robustness sweeps r15.
    weeks = thinned.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("active_week")
    ).distinct()
    w_user = Window.partitionBy("user_id")
    return (
        weeks.withColumn("cohort_week", F.min("active_week").over(w_user))
        .select(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "event_transition_matrix",
    sql="""
    WITH seq AS (
      SELECT event_type AS prev_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id
               ORDER BY ts, event_id NULLS LAST) AS next_type
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    )
    SELECT prev_type, next_type, COUNT(*) AS n_transitions
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
    operators=("W5", "A13"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive events
    of the same user (ordered by ts with event_id tiebreak — equal
    timestamps must not make the matrix run-dependent).

    One hash exchange on user_id feeds the LEAD window, then the
    25-cell aggregate partial-aggregates map-side.  Per-user event
    sequences are the natural partition; a skewed power user inflates
    one window partition but the state is one row (LEAD of 1), so no
    memory hazard — unlike collect_list-based sequence builds.
    """
    # Sequencing needs a time and the matrix an alphabet: NULL-ts and
    # NULL-type events are outside the universe (r11 sweep); event_id
    # tiebreak pins NULLS LAST.
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts", F.asc_nulls_last("event_id"))
    return (
        ev.select(
            F.col("event_type").alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "events_value_forward_fill",
    sql="""
    WITH nulled AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id, user_id,
           LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY user_id
             ORDER BY ts, event_id NULLS LAST, v NULLS FIRST
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM nulled WHERE ts IS NOT NULL
    """,
    operators=("W3", "W5", "P9"),
)
def events_value_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user forward fill (LOCF — last observation carried forward):
    error events carry no measurement (their value is masked to NULL
    here to stand in for sensor gaps), and each gap takes the most
    recent prior value of the same user.

    ``last(..., ignorenulls=True)`` over a running row frame is the
    declarative LOCF: one hash exchange on user_id, one sort per
    partition, O(1) state per row — where a naive self-join
    ("latest non-null before me") is quadratic per key.  The tiebreak
    on event_id keeps equal timestamps deterministic.  Leading NULLs
    (user starts with an error) stay NULL by definition.
    """
    # Timed universe; the tiebreak pins event_id NULLS LAST and orders
    # the masked value NULLS FIRST so a null-measurement row tied with a
    # sibling observation fills from the same prior value in both
    # engines (r11 sweep).
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.asc_nulls_last("event_id"), F.asc_nulls_first(v))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(v, ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "event_halves_nullsafe_join",
    sql="""
    WITH keyed AS (
      SELECT CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS event_key,
             ts
      FROM events
    ),
    first_half AS (
      SELECT event_key, COUNT(*) AS n_first_half
      FROM keyed WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY event_key
    ),
    second_half AS (
      SELECT event_key, COUNT(*) AS n_second_half
      FROM keyed WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY event_key
    )
    SELECT f.event_key, f.n_first_half, s.n_second_half
    FROM first_half f JOIN second_half s
      ON f.event_key IS NOT DISTINCT FROM s.event_key
    """,
    operators=("J4", "J7", "A2"),
)
def event_halves_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-half activity comparison joined on a NULLABLE key with
    null-safe equality (``<=>`` / IS NOT DISTINCT FROM): the NULL bucket
    (masked error events) must pair up across the halves instead of
    silently vanishing, which is exactly what a plain equi-join on a
    nullable key does.

    Null-safe equality stays a hash-join key in Spark (EqualNullSafe is
    a valid equi-join expression — no fallback to nested-loop), so the
    plan is the same broadcast/shuffled hash join as the plain version.
    """
    ev = load_table(spark, sf_dir, "events")
    key = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("event_type")
    )
    cutoff = "2024-01-16 00:00:00"
    keyed = ev.select(key.alias("event_key"), "ts")
    first_half = (
        keyed.filter(F.col("ts") < F.lit(cutoff).cast("timestamp"))
        .groupBy("event_key")
        .agg(F.count(F.lit(1)).alias("n_first_half"))
    )
    second_half = (
        keyed.filter(F.col("ts") >= F.lit(cutoff).cast("timestamp"))
        .groupBy("event_key")
        .agg(F.count(F.lit(1)).alias("n_second_half"))
    )
    return first_half.alias("f").join(
        second_half.alias("s"),
        F.col("f.event_key").eqNullSafe(F.col("s.event_key")),
    ).select("f.event_key", "n_first_half", "n_second_half")


@register(
    "top_event_paths",
    sql="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
        CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                  - CAST(floor(epoch(LAG(ts) OVER
                      (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
               OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS is_session_start
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ),
    sessions AS (
      SELECT user_id, ts, event_id, event_type,
        CAST(SUM(is_session_start) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      FROM seq
    ),
    paths AS (
      SELECT user_id, session_seq,
             string_agg(event_type, '>'
                        ORDER BY ts, event_id NULLS FIRST, event_type) AS path,
             COUNT(*) AS path_len
      FROM sessions GROUP BY user_id, session_seq
    )
    SELECT path, COUNT(*) AS n_sessions,
           CAST(SUM(path_len) AS BIGINT) AS total_events
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 15
    """,
    operators=("T6", "W5", "A13", "O3"),
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: the 15 most common within-session event
    sequences ("view>click>purchase") — the navigation-pattern query
    product analytics runs after sessionization.

    Session boundaries are IDENTICAL to ``events_sessionization``
    (whole-second epoch gap > 1800 s, (ts, event_id) total order).  The
    ordered path string is built engine-portably: Spark sorts the
    collected (ts, event_id, event_type) structs and joins the types
    (``array_sort`` compares struct fields left-to-right, so the unique
    event_id tiebreak makes the order total); DuckDB uses
    ``string_agg(... ORDER BY ts, event_id)``.  Both are deterministic
    because the sort key is unique — an un-tiebroken ORDER BY ts alone
    would be run-dependent on equal timestamps.

    Scale: one user-key exchange feeds both window passes and the
    session aggregate (same partitioning, reused); the path strings are
    bounded by session length — cap pathological sessions (bots) with a
    path_len filter before the path-grain aggregate, which shuffles
    only (path, 1) pairs.  Top-15 is TakeOrderedAndProject.
    """
    # Timed + typed universe (a path is a sequence of symbols over
    # time); the struct sort key adds event_type so same-(ts,id) rows
    # with different types order identically in both engines — Spark's
    # struct comparison and DuckDB's NULLS FIRST agree on NULL ids
    # (r11 sweep).
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    seq = ev.withColumn(
        "is_session_start",
        F.when(
            F.lag(epoch).over(w).isNull()
            | ((epoch - F.lag(epoch).over(w)) > 1800),
            1,
        ).otherwise(0),
    )
    sessions = seq.withColumn(
        "session_seq",
        F.sum("is_session_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = sessions.groupBy("user_id", "session_seq").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).alias("path_len"),
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("path_len").alias("total_events"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(15)
    )


@register(
    "peak_concurrent_sessions",
    sql="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             CASE WHEN LAG(CAST(floor(epoch(ts)) AS BIGINT))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                    OR CAST(floor(epoch(ts)) AS BIGINT)
                       - LAG(CAST(floor(epoch(ts)) AS BIGINT))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    sess AS (
      -- cumsum MUST ride the same (ts, event_id) TOTAL order as the
      -- lag above: ordering by the truncated second alone lets rows
      -- tied on ts_s permute across the is_start row, assigning them
      -- to the neighboring session engine-dependently
      SELECT user_id,
             SUM(is_start) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq,
             ts_s
      FROM seq
    ),
    bounds AS (
      SELECT user_id, session_seq,
             MIN(ts_s) AS start_s, MAX(ts_s) AS end_s
      FROM sess GROUP BY user_id, session_seq
    ),
    deltas AS (
      SELECT start_s AS at_s, 1 AS delta FROM bounds
      UNION ALL
      SELECT end_s + 1 AS at_s, -1 AS delta FROM bounds
    ),
    swept AS (
      SELECT at_s,
             SUM(SUM(delta)) OVER (ORDER BY at_s ROWS UNBOUNDED PRECEDING)
               AS concurrent
      FROM deltas GROUP BY at_s
    ),
    peak AS (SELECT MAX(concurrent) AS peak_concurrent FROM swept)
    SELECT CAST(p.peak_concurrent AS BIGINT) AS peak_concurrent,
           CAST(to_timestamp(MIN(s.at_s)) AS TIMESTAMP) AS first_reached_at
    FROM swept s CROSS JOIN peak p
    WHERE s.concurrent = p.peak_concurrent
    GROUP BY p.peak_concurrent
    """,
    operators=("W3", "W5", "A15"),
)
def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak session CONCURRENCY via a sweep line — the interval-overlap
    maximum (how many sessions were simultaneously open, and when the
    peak was first reached).  Sessions are the catalog's standard
    gap>1800s split ((ts, event_id) total order); each becomes +1 at
    its start second and −1 one second after its end (closed-interval
    convention: a session ending at t still overlaps one starting at
    t), the deltas aggregate per second, and a running sum sweeps the
    timeline.

    Scale: the per-user sessionization is the usual keyed window; the
    sweep runs over the per-SECOND aggregated delta frame (bounded by
    distinct boundary seconds, not events).  The single-partition
    running sum over that bounded frame is the honest cost of an exact
    global maximum — at lake scale, sweep per day/shard and merge with
    boundary carry-over."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.floor(F.unix_timestamp("ts")).cast("bigint")
    seq = ev.withColumn(
        "is_start",
        F.when(
            F.lag(epoch).over(w).isNull() | ((epoch - F.lag(epoch).over(w)) > 1800),
            1,
        ).otherwise(0),
    ).withColumn("ts_s", epoch)
    # same (ts, event_id) TOTAL order as the lag — ts_s alone is not a
    # total order and same-second ties would permute across the
    # session-start row (mirrored in the SQL above)
    wcum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = seq.withColumn("session_seq", F.sum("is_start").over(wcum))
    bounds = sess.groupBy("user_id", "session_seq").agg(
        F.min("ts_s").alias("start_s"), F.max("ts_s").alias("end_s")
    )
    deltas = bounds.select(
        F.col("start_s").alias("at_s"), F.lit(1).alias("delta")
    ).unionByName(
        bounds.select(
            (F.col("end_s") + 1).alias("at_s"), F.lit(-1).alias("delta")
        )
    )
    per_sec = deltas.groupBy("at_s").agg(F.sum("delta").alias("d"))
    wsweep = Window.orderBy("at_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    swept = per_sec.withColumn("concurrent", F.sum("d").over(wsweep))
    peak = swept.agg(F.max("concurrent").alias("peak_concurrent"))
    return (
        swept.join(
            F.broadcast(peak),
            swept.concurrent == peak.peak_concurrent,
        )
        .groupBy("peak_concurrent")
        .agg(
            F.min("at_s").cast("timestamp").alias("first_reached_at"),
        )
        .select(
            F.col("peak_concurrent").cast("bigint").alias("peak_concurrent"),
            "first_reached_at",
        )
    )


@register(
    "purchase_click_attribution",
    sql="""
    WITH pc AS (
      SELECT p.event_id AS purchase_id,
             hour(c.ts) AS click_hour
      FROM events p
      JOIN events c
        ON c.user_id = p.user_id
       AND c.event_type = 'click'
       AND p.event_type = 'purchase'
       AND c.ts >= p.ts - INTERVAL 7 DAY
       AND c.ts < p.ts
    ),
    credited AS (
      SELECT click_hour,
             CAST(1000000 AS BIGINT)
               // COUNT(*) OVER (PARTITION BY purchase_id) AS credit
      FROM pc
    )
    SELECT click_hour,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(credit) AS BIGINT) AS credit_micros
    FROM credited
    GROUP BY click_hour
    ORDER BY click_hour
    """,
    operators=("J7", "W5", "A2"),
)
def purchase_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution: every click in the 7 days before
    a purchase by the same user shares that purchase's credit equally;
    credit is summed per click hour-of-day (the "when do converting
    touches happen" marketing view).

    Credit is FIXED-POINT — each touch gets 1000000 DIV n_touches
    micro-credits (integer floor division) — so the distributed sum is
    exact integer arithmetic, immune to float summation order; the
    deliberate floor remainder (≤ n−1 micros per purchase) is the
    documented price of a deterministic distributed sum (summing 1.0/n
    doubles would hash-differently under every partitioning).  DuckDB
    needs the explicit ``//`` operator (its ``/`` is float division
    even on BIGINTs); the Spark side's double-divide-then-truncate is
    provably floor here — 10⁶/n sits ≥ 1/n ≥ 10⁻⁶ away from any
    integer it isn't equal to, far beyond double rounding error.

    Plan: the touch join is USER-keyed (one exchange per side, skew
    bounded by per-user activity), the per-purchase count is a window
    over purchase-sized partitions, the final rollup is a 24-row
    aggregate.  At 100 TB the 7-day predicate makes this a bounded
    range join — pair volume is Σ_u clicks_u × purchases_u within the
    window, linear in users for bounded per-user activity.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    pc = p.join(
        c,
        (F.col("cu") == F.col("pu"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS"))
        & (F.col("cts") < F.col("pts")),
    ).select("purchase_id", F.hour("cts").alias("click_hour"))
    credited = pc.select(
        "click_hour",
        (
            F.lit(1000000).cast("bigint")
            / F.count(F.lit(1)).over(Window.partitionBy("purchase_id"))
        ).cast("bigint").alias("credit"),
    )
    return (
        credited.groupBy("click_hour")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("credit").cast("bigint").alias("credit_micros"),
        )
        .orderBy("click_hour")
    )


@register(
    "user_churn_labels",
    sql="""
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events
    ),
    cut AS (
      SELECT CAST(d0 + CAST((d1 - d0) // 2 AS INTEGER) AS DATE) AS cutoff FROM bounds
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    feat AS (
      SELECT e.user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events_28d,
             CAST(COUNT(DISTINCT CAST(e.ts AS DATE)) AS BIGINT) AS n_active_days_28d,
             CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_purchases_28d
      FROM events e CROSS JOIN cut
      WHERE e.ts >= CAST(cut.cutoff AS TIMESTAMP) - INTERVAL 28 DAY
        AND e.ts < CAST(cut.cutoff AS TIMESTAMP)
      GROUP BY e.user_id
    ),
    future AS (
      SELECT DISTINCT e.user_id
      FROM events e CROSS JOIN cut
      WHERE e.ts >= CAST(cut.cutoff AS TIMESTAMP)
        AND e.ts < CAST(cut.cutoff AS TIMESTAMP) + INTERVAL 28 DAY
    )
    SELECT u.user_id,
           COALESCE(f.n_events_28d, 0) AS n_events_28d,
           COALESCE(f.n_active_days_28d, 0) AS n_active_days_28d,
           COALESCE(f.n_purchases_28d, 0) AS n_purchases_28d,
           CASE WHEN fu.user_id IS NULL THEN 1 ELSE 0 END AS churned
    FROM users u
    LEFT JOIN feat f ON u.user_id = f.user_id
    LEFT JOIN future fu ON u.user_id = fu.user_id
    ORDER BY u.user_id
    """,
    operators=("J7", "A2", "P9"),
)
def user_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-label generation — the leakage-safe labeling pattern
    every ML training pipeline needs: per user, FEATURES from the 28
    days before a cutoff and a CHURN LABEL ("no activity in the 28 days
    after") strictly from after it, in one relational plan whose
    feature/label windows provably cannot overlap.

    The cutoff is derived from the data (midpoint of the observed ts
    span, integer day arithmetic) so every scale factor labels itself
    deterministically and the oracle re-derives the identical split.
    Label skew note: the anti-join side ("churned") is the SMALL side at
    lake scale; Spark plans it as a broadcast-able distinct over the
    future window's users.  Plan: one bounds aggregate (broadcast
    scalar), two filtered scans aggregated per user on one key exchange
    each, two left joins on the user spine — linear, no windows over
    data-sized partitions.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    b = e.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    cut = b.select(
        F.date_add(
            "d0", (F.datediff("d1", "d0") / 2).cast("int")
        ).alias("cutoff")
    )
    ec = e.crossJoin(F.broadcast(cut))
    lo = F.col("cutoff").cast("timestamp") - F.expr("INTERVAL 28 DAYS")
    hi = F.col("cutoff").cast("timestamp")
    hi2 = F.col("cutoff").cast("timestamp") + F.expr("INTERVAL 28 DAYS")
    feat = (
        ec.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events_28d"),
            F.countDistinct(F.col("ts").cast("date")).cast("bigint").alias(
                "n_active_days_28d"
            ),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("n_purchases_28d"),
        )
    )
    future = (
        ec.filter((F.col("ts") >= hi) & (F.col("ts") < hi2))
        .select("user_id")
        .distinct()
        .withColumn("seen_after", F.lit(1))
    )
    users = e.select("user_id").distinct()
    return (
        users.join(feat, "user_id", "left")
        .join(future, "user_id", "left")
        .select(
            "user_id",
            F.coalesce("n_events_28d", F.lit(0)).cast("bigint").alias("n_events_28d"),
            F.coalesce("n_active_days_28d", F.lit(0))
            .cast("bigint")
            .alias("n_active_days_28d"),
            F.coalesce("n_purchases_28d", F.lit(0))
            .cast("bigint")
            .alias("n_purchases_28d"),
            F.when(F.col("seen_after").isNull(), 1).otherwise(0).alias("churned"),
        )
        .orderBy("user_id")
    )
