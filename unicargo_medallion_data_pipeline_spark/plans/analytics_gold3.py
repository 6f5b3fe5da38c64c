"""Round-5 analytics batch: mergeable binned quantiles, windowed top-k
with ties, cross-document duplicate n-gram detection, and the
key-erasure (GDPR delete) mutation operator under the hash gate.

Registered in round 5 — these sit OUTSIDE the round-5 driver window
(fully allocated to the 50 never-driver-verified round-4 entries) but
are locally oracle-verified at sf0.001/0.01/0.1 and front-load the
round-6 rotation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.operators.deletes import propagate_deletes
from unicargo_medallion_data_pipeline_spark.plans.catalog import register
from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
from unicargo_medallion_data_pipeline_spark.sources.staging import scratch_dir

# ---------------------------------------------------------------------------
# Mergeable binned quantiles — the scale twin of exact percentiles
# ---------------------------------------------------------------------------

#: Bin width in cents: value ∈ [0, 100) with 2 decimals → 25-cent bins
#: give 400 bins, a fixed-size mergeable summary per group.
_BIN_CENTS = 25


@register(
    "events_value_binned_quantiles",
    sql=f"""
    WITH b AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) // {_BIN_CENTS} AS bin,
             COUNT(*) AS c
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, bin, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM b
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN bin END) * 0.25
                AS DOUBLE) AS p50_est,
           CAST(MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN bin END) * 0.25
                AS DOUBLE) AS p90_est,
           CAST(MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN bin END) * 0.25
                AS DOUBLE) AS p99_est
    FROM t
    GROUP BY event_type
    ORDER BY event_type
    """,
    operators=("A12", "W3", "A15"),
)
def events_value_binned_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a fixed-width bin histogram — the
    MERGEABLE scale path beside the exact `order_value_percentiles`
    sort-based twin.

    The summary per group is ≤400 (bin, count) pairs regardless of input
    size: partial aggregation combines map-side, the shuffle carries
    bins not rows, and summaries merge associatively (the property HLL
    gives distinct counts, here for quantiles).  The estimate is the
    lower edge of the bin where the cumulative count first reaches
    ceil(q·n) — deterministic, and reproduced bit-for-bit by the oracle
    because every threshold is computed in INTEGER arithmetic
    ((n+1)//2, (9n+9)//10, (99n+99)//100) and bin edges are exact
    quarter multiples.  At 100 TB the exact twin needs a full sort per
    group; this needs one map-side-combined shuffle of ≤400-row
    summaries.
    """
    # A histogram is defined over VALUED rows: a NULL value has no bin,
    # and a NULL bin entering the cumulative window diverges across
    # engines (round-11 sweep).
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    b = (
        ev.select(
            "event_type",
            F.expr(
                f"CAST(round(value*100) AS BIGINT) DIV {_BIN_CENTS}"
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = Window.partitionBy("event_type").orderBy("bin")
    wall = Window.partitionBy("event_type")
    t = b.select(
        "event_type",
        "bin",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )

    def est(threshold_sql: str, name: str):
        hit = F.min(
            F.when(F.col("cum") >= F.expr(threshold_sql), F.col("bin"))
        )
        return (hit * 0.25).cast("double").alias(name)

    return (
        t.groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            est("(n + 1) DIV 2", "p50_est"),
            est("(9*n + 9) DIV 10", "p90_est"),
            est("(99*n + 99) DIV 100", "p99_est"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Windowed top-k with ties — tumbling window × rank
# ---------------------------------------------------------------------------


@register(
    "events_window_top_types",
    sql="""
    WITH w AS (
      SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300)
               AS TIMESTAMP) AS window_start,
             event_type, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events
    FROM (SELECT *, RANK() OVER (PARTITION BY window_start
                                 ORDER BY n_events DESC) AS rk FROM w)
    WHERE rk = 1
    """,
    operators=("T6", "W5", "O3"),
)
def events_window_top_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per tumbling 5-minute window, the most frequent event type(s) —
    ties kept via RANK, so the result is deterministic without a
    tie-breaking collation.  This is the batch mirror of the classic
    streaming "trending items per window" query (window agg →
    per-window top-k); the streaming form is the same plan under a
    watermark.

    Plan: one (window, type) aggregate — the bucket expression is
    floor(epoch/300)·300, identical on both engines — then a rank over
    groups ~5 rows wide; Spark's WindowGroupLimit pushes the rk=1
    filter into the window operator, so no full sort of the aggregate
    survives in the physical plan.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.floor(F.unix_timestamp("ts") / 300) * 300).cast("timestamp")
    w = ev.groupBy(bucket.alias("window_start"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    rk = Window.partitionBy("window_start").orderBy(F.col("n_events").desc())
    return (
        w.withColumn("rk", F.rank().over(rk))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


# ---------------------------------------------------------------------------
# Cross-document duplicate n-grams — corpus-level contamination signal
# ---------------------------------------------------------------------------

#: N-gram order for the cross-document duplicate scan (word 5-grams, the
#: C4/Gopher-family convention for boilerplate/near-dup detection).
_NGRAM = 5


@register(
    "doc_duplicate_ngram_rate",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    ng AS (
      SELECT doc_id, lang,
             list_transform(range(1, len(t) - {_NGRAM - 2}),
               i -> substring(md5(concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4])), 1, 16)
             ) AS grams
      FROM toks
    ),
    inst AS (SELECT doc_id, lang, unnest(grams) AS g FROM ng),
    corpus AS (
      SELECT g, COUNT(DISTINCT doc_id) AS n_docs
      FROM inst GROUP BY g
    )
    SELECT i.doc_id,
           MIN(i.lang) AS lang,
           COUNT(*) AS n_ngrams,
           CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_instances,
           CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS shared_ngram_rate
    FROM inst i JOIN corpus c ON i.g = c.g
    GROUP BY i.doc_id
    ORDER BY i.doc_id
    """,
    operators=("P10", "A13", "J4"),
    bench=True,
)
def doc_duplicate_ngram_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document, the fraction of its word 5-gram instances that also
    appear in at least one OTHER document — the cross-document
    complement of the within-doc `doc_repetition_signals`, and the
    practical scalable approximation of suffix-array substring dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): a high shared-n-gram rate marks boilerplate and
    copy-paste families that per-doc fingerprints miss.

    Scale shape: n-grams are hashed to a 16-hex-char md5 prefix (64
    bits) BEFORE the shuffle, so the corpus-frequency aggregate and the
    instance join carry fixed-width keys, not text.  Both sides of the
    join are the same exploded frame partitioned by gram hash —
    candidates come from an equi-join, never a cross product; the
    per-gram doc count is a map-side-combinable aggregate.  At 100 TB
    this is the standard explode→count→join-back scan, linear in corpus
    size, with the heaviest key (a boilerplate gram shared by millions
    of docs) handled by AQE skew splitting.  Docs with < 5 tokens
    contribute no instances and are absent from the output (they have
    no 5-grams to share).
    """
    docs = load_table(spark, sf_dir, "documents")
    # Materialize the token array ONCE before indexing into it: an
    # element_at over the raw split(...) expression re-evaluates the
    # split per access (5 accesses per gram → O(tokens²) per doc,
    # measured 32s vs 2s at sf0.1); over a projected attribute it is
    # O(1) array indexing.
    toked = docs.select(
        "doc_id",
        "lang",
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
        ).alias("t"),
    )
    t = F.col("t")
    n = F.size(t)
    grams = F.when(
        n >= _NGRAM,
        F.transform(
            F.sequence(F.lit(1), n - (_NGRAM - 1)),
            lambda i: F.substring(
                F.md5(
                    F.concat_ws(
                        " ",
                        *[F.element_at(t, i + k) for k in range(_NGRAM)],
                    )
                ),
                1,
                16,
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # JOIN-FREE shared-gram classification (r16, guide §2.4 — remove
    # shuffles outright): "this instance's gram appears in >= 2 distinct
    # docs" is a per-gram-group fact, so it rides WINDOW aggregates over
    # the g-partitioning instead of a corpus aggregate joined back.  The
    # r15 shape paid: an eager localCheckpoint of the exploded frame (a
    # whole materialization job — the pin existed only because the frame
    # fed two plan branches), a g-keyed aggregate exchange, and a
    # broadcast/shuffle join of the corpus table against the instances.
    # Here the exploded frame shuffles by g exactly once, ONE WindowExec
    # computes min(doc_id)/max(doc_id) over each gram group (same
    # partitioning, no second exchange; entire-partition frames are
    # evaluated once per group, not per row), and the join, the
    # broadcast, the checkpoint job and the second execution of the
    # tokenize→md5→explode subtree all disappear — the plan census is
    # scans 1, exchanges 3 (g window, doc_id agg, orderBy range), joins
    # 0.  Hot-gram skew lands where it always did (the g-keyed
    # shuffle); a gram group is one window partition, the same unit the
    # old join's probe side concentrated anyway.
    #
    # "Shared" only ever means COUNT(DISTINCT doc_id) >= 2, and a gram
    # hits two distinct docs exactly when min(doc_id) != max(doc_id)
    # (r15, guide §2.3 — min/max need no distinct pass).  Window min/max
    # ignore NULL doc_ids exactly as the aggregate forms do: an all-NULL
    # gram group yields NULL != NULL → NULL → otherwise(0), matching
    # countDistinct(doc_id)=0.  Row multiplicity is untouched — a window
    # never drops or duplicates rows, exactly like the old always-
    # matching inner join (every instance's gram was in `corpus` by
    # construction).  The DuckDB mirror keeps the declarative
    # COUNT(DISTINCT) + join form — outputs are value-identical (oracle
    # at both SFs + empty + fresh hostile seeds, re-proven r16).
    inst = toked.select("doc_id", "lang", F.explode(grams).alias("g"))
    w = Window.partitionBy("g")
    shared1 = F.when(
        F.min("doc_id").over(w) != F.max("doc_id").over(w), 1
    ).otherwise(0)
    return (
        inst.withColumn("_s1", shared1)
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum("_s1").alias("n_shared_instances"),
            (F.sum("_s1").cast("double") / F.count(F.lit(1))).alias(
                "shared_ngram_rate"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Key-erasure propagation under the hash gate (mutation-op projection)
# ---------------------------------------------------------------------------

#: Deterministic erasure cohort: every 97th user id.
_ERASE_MOD = 97


@register(
    "events_user_erasure_audit",
    sql=f"""
    SELECT event_type AS partition,
           COUNT(*) AS rows_before,
           -- rows_after = everything not deleted (a NULL user_id is
           -- KEPT — the erasure anti-join can never match it), so the
           -- audit identity before = after + deleted must hold with
           -- NULLs present (r11 sweep)
           CAST(COUNT(*) - SUM(CASE WHEN user_id % {_ERASE_MOD} = 0
                                    THEN 1 ELSE 0 END)
                AS BIGINT) AS rows_after,
           CAST(SUM(CASE WHEN user_id % {_ERASE_MOD} = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS rows_deleted
    FROM events
    WHERE event_type IS NOT NULL AND event_type != ''
      AND length(event_type) <= 128
    GROUP BY event_type
    HAVING SUM(CASE WHEN user_id % {_ERASE_MOD} = 0 THEN 1 ELSE 0 END) > 0
    ORDER BY event_type
    """,
    operators=("S12", "J5", "A2"),
)
def events_user_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The key-erasure mutation operator (`operators/deletes.py` —
    GDPR-style delete propagation) end-to-end under the hash gate, via
    the same bridge as `scd2_as_of_snapshot`: materialize `events`
    partitioned by event_type in a session-temp table, erase a FIXED
    deterministic cohort (user_id ≡ 0 mod {_ERASE_MOD}), and return the
    operator's own per-partition audit.  The oracle recomputes the
    before/after/deleted counts declaratively, so a green row proves
    the partition-scoped rewrite deleted exactly the requested keys and
    nothing else — including the audit arithmetic.
    """
    # partition-key sanity universe (same contract as
    # rollup_incremental_equals_full: Hive layout can't carry NULL-vs-''
    # distinctly or >128-char values — r11 sweep)
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .filter(
            F.col("event_type").isNotNull()
            & (F.col("event_type") != "")
            & (F.length("event_type") <= 128)
        )
    )
    path = os.path.join(scratch_dir("erase_q_"), "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    cohort = (
        ev.filter(F.col("user_id") % _ERASE_MOD == 0)
        .select("user_id")
        .distinct()
    )
    from pyspark.errors import AnalysisException

    try:
        audit = propagate_deletes(
            spark, path, cohort, key_cols=["user_id"], partition_col="event_type"
        )
    except AnalysisException:
        # nothing was ever materialized (empty universe writes no
        # partition files): the audit is empty by definition
        return spark.createDataFrame(
            [],
            "partition string, rows_before bigint, rows_after bigint, "
            "rows_deleted bigint",
        )
    return audit.select(
        "partition", "rows_before", "rows_after", "rows_deleted"
    ).orderBy("partition")


# ---------------------------------------------------------------------------
# Declarative expectation suite under the hash gate
# ---------------------------------------------------------------------------


@register(
    "orders_expectation_report",
    sql="""
    SELECT 'not_null' AS rule, 'o_custkey' AS target,
           CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS violations,
           COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) = 0
             AS passed
    FROM orders
    UNION ALL
    -- engine unique semantics: violations = rows beyond the FIRST per
    -- key, with the NULL group counting like any other (one NULL row is
    -- not a duplicate); COUNT(*) - COUNT(DISTINCT k) alone would call
    -- every NULL row a violation (r11 sweep)
    SELECT 'unique', 'o_orderkey',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey)
                - CASE WHEN COUNT(*) > COUNT(o_orderkey) THEN 1 ELSE 0 END
                AS BIGINT),
           COUNT(*) - COUNT(DISTINCT o_orderkey)
             - CASE WHEN COUNT(*) > COUNT(o_orderkey) THEN 1 ELSE 0 END = 0
    FROM orders
    UNION ALL
    SELECT 'in_range', 'o_totalprice',
           CAST(COALESCE(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000
                         THEN 1 ELSE 0 END), 0) AS BIGINT),
           COALESCE(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000
                    THEN 1 ELSE 0 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'accepted_values', 'o_orderstatus',
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('O', 'F', 'P')
                         THEN 1 ELSE 0 END), 0) AS BIGINT),
           COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL
                     AND o_orderstatus NOT IN ('O', 'F', 'P')
                    THEN 1 ELSE 0 END), 0) = 0
    FROM orders
    UNION ALL
    SELECT 'foreign_key', 'o_custkey',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE o.o_custkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) = 0
    """,
    operators=("Q1", "Q2", "A15", "J5"),
)
def orders_expectation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative expectation suite (`quality/expectations.py` —
    the dbt-test/Deequ-style table contract, evaluated in 1 + |unique|
    + |fk| jobs instead of the reference's job-per-column) run against
    `orders` with a fixed five-rule contract and hash-compared: the
    oracle recomputes each rule's violation count declaratively, so a
    green row pins both the rule semantics (three-valued logic for
    range/accepted on NULLs, NULL-insensitive FK, duplicate counting
    beyond first occurrence) and the report assembly.
    """
    from unicargo_medallion_data_pipeline_spark.quality.expectations import (
        accepted_values,
        foreign_key,
        in_range,
        not_null,
        run_suite,
        unique,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    suite = [
        not_null("o_custkey"),
        unique("o_orderkey"),
        in_range("o_totalprice", 0, 1_000_000),
        accepted_values("o_orderstatus", "O", "F", "P"),
        foreign_key("o_custkey", c, "c_custkey"),
    ]
    return run_suite(o, suite)


# ---------------------------------------------------------------------------
# Sliding-window batch mirror (T6 overlapping buckets) under the hash gate
# ---------------------------------------------------------------------------


@register(
    "events_sliding_10min_counts",
    sql="""
    WITH e AS (
      SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 AS w0,
             event_type, value
      FROM events
    ),
    x AS (
      SELECT unnest([w0 - 300, w0]) AS ws, event_type, value FROM e
    )
    SELECT CAST(to_timestamp(ws) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM x
    GROUP BY 1, 2
    """,
    operators=("T6", "A4"),
)
def events_sliding_10min_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (width 10 min, slide 5 min) as a batch plan with
    the overlap made EXPLICIT: each event belongs to exactly two
    windows, emitted map-side as a two-element array explode — the same
    multiplicity `F.window("ts", "10 minutes", "5 minutes")` produces
    (pinned by a pytest equivalence check), but expressed identically
    on both engines so the driver hash gate covers the one T6 shape
    (overlapping buckets) that previously had only pytest coverage.

    Scale: the explode doubles rows BEFORE the partial aggregate, which
    immediately combines them map-side to (window, type) grain — the
    standard cost of sliding windows (width/slide copies), paid in the
    combiner, not the shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    w0 = (F.floor(F.unix_timestamp("ts") / 300) * 300).cast("bigint")
    from unicargo_medallion_data_pipeline_spark.functions.exact import dsum

    return (
        ev.select(
            F.explode(F.array(w0 - 300, w0)).alias("ws"), "event_type", "value"
        )
        .groupBy(
            F.col("ws").cast("timestamp").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-based source mixture weights (training-data mixing, r6)
# ---------------------------------------------------------------------------

# alpha = 0.5 temperature sampling (the multilingual-pretraining
# up/down-weighting rule published with mC4/XLM-R: w_i ∝ t_i^alpha).
# sqrt is the alpha=0.5 instance — chosen because IEEE sqrt is
# correctly rounded on every engine, so the weight is bit-deterministic
# once the per-source token sums are exact integers and the sqrt is
# quantized (floor to 1e-6) BEFORE the cross-source normalization sum.


@register(
    "source_mixture_weights",
    sql="""
    WITH per_source AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '
             ))) AS BIGINT) AS n_tokens
      FROM documents
      GROUP BY source
    ),
    q AS (
      SELECT source, n_docs, n_tokens,
             CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
               AS sqrt_tokens_q
      FROM per_source
    )
    SELECT source, n_docs, n_tokens,
           CAST(sqrt_tokens_q AS DOUBLE) / SUM(sqrt_tokens_q) OVER ()
             AS mixture_weight,
           CAST(sqrt_tokens_q AS DOUBLE) / SUM(sqrt_tokens_q) OVER ()
             / (CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER ())
             AS upweight_factor
    FROM q
    ORDER BY source
    """,
    operators=("A13", "W4"),
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights for training-data mixing at
    temperature alpha = 0.5 (w_i ∝ tokens_i^0.5, the published
    multilingual-pretraining rule: rare sources up-weighted, dominant
    sources down-weighted), plus the up/down-weight factor vs natural
    token share.

    Determinism at the hash gate: token counts sum exactly as BIGINT;
    sqrt is IEEE-correctly-rounded on both engines and is quantized to
    1e-6 by FLOOR *before* the cross-source normalization sum, so the
    normalizer is an exact integer sum — no float-summation-order
    drift.  The share windows run over ≤ |sources| aggregated rows.
    Scale shape: one map-side-combinable aggregate over the corpus;
    everything after is per-source metadata."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.size(
                F.split(
                    F.trim(
                        F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
                    ),
                    " ",
                )
            )
        ).alias("n_tokens"),
    )
    q = per_source.withColumn(
        "sqrt_tokens_q",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1e6).cast("bigint"),
    )
    w = Window.partitionBy()
    return (
        q.withColumn(
            "mixture_weight",
            F.col("sqrt_tokens_q").cast("double") / F.sum("sqrt_tokens_q").over(w),
        )
        .withColumn(
            "upweight_factor",
            F.col("mixture_weight")
            / (F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)),
        )
        .drop("sqrt_tokens_q")
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Time-series depth (r6): time-weighted average + OHLC bars
# ---------------------------------------------------------------------------


@register(
    "user_value_twap",
    sql="""
    WITH seq AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             LEAD(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id
                     ORDER BY ts, event_id NULLS LAST,
                              CAST(round(value * 100) AS BIGINT) NULLS LAST)
               AS next_s
      FROM events WHERE ts IS NOT NULL
    ),
    held AS (
      SELECT user_id, cents, next_s - ts_s AS dt
      FROM seq WHERE next_s IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dt) AS BIGINT) AS held_seconds,
           CAST(CAST(SUM(cents * dt) AS DOUBLE)
                / (100.0 * SUM(dt)) AS DOUBLE) AS twap
    FROM held
    GROUP BY user_id
    HAVING SUM(dt) > 0
    ORDER BY user_id
    """,
    operators=("W5", "A13"),
)
def user_value_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-WEIGHTED average value per user (the TimescaleDB
    ``time_weight`` operator): each observation holds until the next
    one, so the mean weights each value by its holding interval —
    the correct aggregate for irregularly-sampled state (a plain AVG
    over-weights bursty periods).  Step-function (LOCF) convention;
    the final open-ended observation carries no weight.

    Exactness: cents (BIGINT) × whole seconds (BIGINT) keeps the
    numerator an exact integer; one final IEEE division.  Scale: one
    user-keyed window (LEAD) + one keyed aggregate — both map-side
    partial where possible, shuffled once on user_id."""

    # Timed universe + total tie-break (event_id, then cents): a
    # zero-length interval carries no weight, but WHICH of two same-ts
    # rows closes the group decides whose value holds until the next
    # observation — both engines must agree (round-11 sweep).
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_id",
            "ts",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
            F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ts_s"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        "ts", F.asc_nulls_last("event_id"), F.asc_nulls_last("cents")
    )
    held = (
        ev.withColumn("next_s", F.lead("ts_s").over(w))
        .filter(F.col("next_s").isNotNull())
        .select("user_id", "cents", (F.col("next_s") - F.col("ts_s")).alias("dt"))
    )
    return (
        held.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dt").alias("held_seconds"),
            (
                F.sum(F.col("cents") * F.col("dt")).cast("double")
                / (F.lit(100.0) * F.sum("dt"))
            ).alias("twap"),
        )
        .filter(F.col("held_seconds") > 0)
        .orderBy("user_id")
    )


@register(
    "events_hourly_ohlc",
    sql="""
    WITH seq AS (
      SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600)
                  AS TIMESTAMP) AS hour_start,
             value, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY CAST(floor(epoch(ts) / 3600) AS BIGINT)
                                ORDER BY ts, event_id NULLS LAST,
                                         value NULLS LAST) AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY CAST(floor(epoch(ts) / 3600) AS BIGINT)
                                ORDER BY ts DESC, event_id DESC NULLS LAST,
                                         value DESC NULLS LAST) AS rn_close
      FROM events WHERE ts IS NOT NULL
    )
    SELECT hour_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(CASE WHEN rn_open = 1 THEN value END) AS DOUBLE) AS open,
           CAST(MAX(value) AS DOUBLE) AS high,
           CAST(MIN(value) AS DOUBLE) AS low,
           CAST(MIN(CASE WHEN rn_close = 1 THEN value END) AS DOUBLE) AS close
    FROM seq
    GROUP BY hour_start
    ORDER BY hour_start
    """,
    operators=("W5", "A12", "T6"),
)
def events_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars (open/high/low/close — the canonical financial
    downsampling rollup): first and last value per tumbling hour with
    deterministic (ts, event_id) tie-breaks, plus min/max.  The
    candlestick shape TimescaleDB/kdb expose as a first-class rollup.

    Plan: ONE hour-keyed exchange serves both row_number windows and the
    final aggregate (same partitioning); open/close resolve via
    rank-1-flag min/max so no second shuffle or self-join appears."""

    # Timed universe + total (ts, event_id, value) tie-break: open and
    # close must resolve identically in both engines even for
    # same-timestamp same-id rows that disagree on value (r11 sweep).
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "value",
            "ts",
            "event_id",
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
            .cast("timestamp")
            .alias("hour_start"),
        )
    )
    w_open = Window.partitionBy("hour_start").orderBy(
        "ts", F.asc_nulls_last("event_id"), F.asc_nulls_last("value")
    )
    w_close = Window.partitionBy("hour_start").orderBy(
        F.col("ts").desc(),
        F.col("event_id").desc_nulls_last(),
        F.col("value").desc_nulls_last(),
    )
    seq = ev.withColumn("rn_open", F.row_number().over(w_open)).withColumn(
        "rn_close", F.row_number().over(w_close)
    )
    return (
        seq.groupBy("hour_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.when(F.col("rn_open") == 1, F.col("value")))
            .cast("double")
            .alias("open"),
            F.max("value").cast("double").alias("high"),
            F.min("value").cast("double").alias("low"),
            F.min(F.when(F.col("rn_close") == 1, F.col("value")))
            .cast("double")
            .alias("close"),
        )
        .orderBy("hour_start")
    )


@register(
    "cohort_ltv_matrix",
    sql="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(date_trunc('month', o_orderdate)) AS cohort_month
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY o_custkey
    ),
    flows AS (
      SELECT f.cohort_month,
             CAST((YEAR(date_trunc('month', o.o_orderdate))
                   - YEAR(f.cohort_month)) * 12
                  + (MONTH(date_trunc('month', o.o_orderdate))
                     - MONTH(f.cohort_month)) AS INTEGER) AS age_months,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM (SELECT * FROM orders WHERE o_orderdate IS NOT NULL) o
      JOIN firsts f ON o.o_custkey = f.o_custkey
    ),
    cohort_sizes AS (
      SELECT cohort_month, COUNT(*) AS n_customers
      FROM firsts GROUP BY cohort_month
    ),
    per_age AS (
      SELECT cohort_month, age_months,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM flows GROUP BY cohort_month, age_months
    )
    SELECT p.cohort_month,
           p.age_months,
           CAST(s.n_customers AS BIGINT) AS n_customers,
           CAST(CAST(SUM(p.cents) OVER (PARTITION BY p.cohort_month
                                        ORDER BY p.age_months) AS DOUBLE)
                / 100 AS DOUBLE) AS cum_revenue,
           CAST(CAST(SUM(p.cents) OVER (PARTITION BY p.cohort_month
                                        ORDER BY p.age_months) AS DOUBLE)
                / (100.0 * s.n_customers) AS DOUBLE) AS ltv_per_customer
    FROM per_age p JOIN cohort_sizes s ON p.cohort_month = s.cohort_month
    ORDER BY p.cohort_month, p.age_months
    """,
    operators=("A13", "W3", "J2"),
)
def cohort_ltv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix — the canonical growth analytic:
    customers grouped by first-order month, revenue accumulated by
    cohort age in months, normalized to LTV per customer.  Each
    (cohort, age) cell's running total is an exact integer-cents window
    sum over the ≤|ages| aggregated rows of its cohort; the only float
    ops are the two presentation divisions.

    Scale: one customer-keyed aggregate for cohorts (map-side
    combinable), one broadcast-ready join of the tiny firsts frame back
    to orders, one (cohort, age) aggregate, and a window over
    months-count-sized partitions — no customer-grain window anywhere."""
    # Dated universe: cohorts and ages are month arithmetic (r11 sweep).
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(
            "o_custkey",
            # cast to DATE: Spark date_trunc yields timestamp, DuckDB date —
            # the type lattice flags the mismatch before the driver would
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )
    firsts = o.groupBy("o_custkey").agg(
        F.min("order_month").alias("cohort_month")
    )
    sizes = firsts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    flows = o.join(firsts, "o_custkey").select(
        "cohort_month",
        (
            (F.year("order_month") - F.year("cohort_month")) * 12
            + (F.month("order_month") - F.month("cohort_month"))
        )
        .cast("int")
        .alias("age_months"),
        "cents",
    )
    per_age = flows.groupBy("cohort_month", "age_months").agg(
        F.sum("cents").alias("cents")
    )

    wcum = Window.partitionBy("cohort_month").orderBy("age_months")
    return (
        per_age.join(sizes, "cohort_month")
        .select(
            "cohort_month",
            "age_months",
            F.col("n_customers").cast("bigint").alias("n_customers"),
            (F.sum("cents").over(wcum).cast("double") / 100).alias("cum_revenue"),
            (
                F.sum("cents").over(wcum).cast("double")
                / (F.lit(100.0) * F.col("n_customers"))
            ).alias("ltv_per_customer"),
        )
        .orderBy("cohort_month", "age_months")
    )


@register(
    "daily_revenue_cusum",
    sql="""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY o_orderdate
    ),
    seq AS (
      SELECT day, cents,
             CAST(SUM(cents) OVER (ORDER BY day) AS BIGINT) AS prefix,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k,
             CAST(SUM(cents) OVER () AS BIGINT) AS total,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM daily
    ),
    stat AS (
      SELECT day, cents, n,
             ABS(n * prefix - k * total) AS d_raw
      FROM seq
    ),
    stat2 AS (
      SELECT *, MAX(d_raw) OVER () AS d_max FROM stat
    ),
    stat3 AS (
      SELECT *, MIN(CASE WHEN d_raw = d_max THEN day END) OVER () AS cp_day
      FROM stat2
    )
    SELECT day,
           CAST(CAST(cents AS DOUBLE) / 100 AS DOUBLE) AS revenue,
           CAST(CAST(d_raw AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0)
                AS DOUBLE) AS cusum_stat,
           d_raw = d_max AND day = cp_day AS is_changepoint
    FROM stat3
    ORDER BY day
    """,
    operators=("W3", "A4", "W4"),
)
def daily_revenue_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over the daily revenue series — the
    classic mean-shift screen (the day maximizing |n·prefix_k −
    k·total| is the estimated changepoint, the integer-arithmetic form
    of max cumulative deviation from a constant-mean fit).

    Exactness: the statistic is |n·prefix − k·total| over BIGINT cents —
    no float accumulates; the two output divisions are presentation
    only; the argmax tie-breaks to the earliest day.  Scale: the series
    is one map-side-combinable daily aggregate (≤ calendar-days rows);
    every window runs over that aggregated frame, never the fact."""

    daily = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())  # dated universe (r11 sweep)
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
    )
    wseq = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    seq = daily.select(
        "day",
        "cents",
        F.sum("cents").over(wseq).alias("prefix"),
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("k"),
        F.sum("cents").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).withColumn(
        "d_raw",
        F.abs(F.col("n") * F.col("prefix") - F.col("k") * F.col("total")),
    )
    dmax = F.max("d_raw").over(wall)
    first_arg = F.min(F.when(F.col("d_raw") == dmax, F.col("day"))).over(wall)
    return seq.select(
        "day",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        (F.col("d_raw").cast("double") / (F.col("n").cast("double") * 100.0)).alias(
            "cusum_stat"
        ),
        ((F.col("d_raw") == dmax) & (F.col("day") == first_arg)).alias(
            "is_changepoint"
        ),
    ).orderBy("day")


@register(
    "corpus_datasheet",
    sql="""
    WITH base AS (
      SELECT doc_id, lang, source,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
             len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))
               AS n_tokens,
             length(text) AS n_chars
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_exact_dups,
           CASE WHEN COUNT(*) > 0 THEN
             CAST(CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*)
                  AS DOUBLE) END AS exact_dup_rate,
           CASE WHEN COUNT(*) > 0 THEN
             CAST(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS DOUBLE)
             END AS mean_tokens_per_doc,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
    FROM base
    """,
    operators=("A15", "P10"),
)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus DATASHEET ("Datasheets for Datasets" — the
    summary card a training-data release ships with): document/token/
    char volumes, language and source coverage, exact-duplicate count
    and rate (whitespace-normalized md5 fingerprints, the same
    canonicalization the dedup operators use), and token-length
    envelope.  One map-side-combinable pass over the corpus; every
    count is exact, the two rates are single final divisions."""
    from unicargo_medallion_data_pipeline_spark.textops import analysis as ta

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        "source",
        ta.fingerprint("text").alias("fp"),
        ta.token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    return base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_exact_dups"),
        # rates are undefined on an empty corpus: NULL, not 0/0 (Spark
        # ANSI raises on zero divisors even for doubles — r11 sweep)
        F.when(
            F.count(F.lit(1)) > 0,
            (F.count(F.lit(1)) - F.countDistinct("fp")).cast("double")
            / F.count(F.lit(1)),
        ).alias("exact_dup_rate"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.sum("n_tokens").cast("double") / F.count(F.lit(1)),
        ).alias("mean_tokens_per_doc"),
        F.min("n_tokens").cast("bigint").alias("min_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
    )
