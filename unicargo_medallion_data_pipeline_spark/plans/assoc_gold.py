"""Association & sampling analytics: market-basket co-occurrence,
contrastive negative-pair sampling, mergeable-sketch rollup.

Three patterns a lake-scale pipeline runs that the earlier batches don't
cover: "which items appear together" (association mining, the retail
classic), "give every document k pseudo-random non-matching partners"
(negative sampling for contrastive training), and "store per-partition
sketches, merge at query time" (the pre-aggregated sketch-table
architecture that makes distinct-count rollups O(sketch) instead of
O(data) at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from unicargo_medallion_data_pipeline_spark.functions.exact import exact_double
from unicargo_medallion_data_pipeline_spark.operators.ranks import global_row_number
from unicargo_medallion_data_pipeline_spark.plans.catalog import register
from unicargo_medallion_data_pipeline_spark.plans.similarity_gold import (
    _SQL_DOCS1,
    _SQL_EMB1,
    _docs_with_text,
    _embeddings_valid,
)
from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

#: Knuth multiplicative constant + a small odd stride — the pure-integer
#: mix both engines evaluate identically (no engine hash functions, which
#: differ between Spark and DuckDB).
_MIX_A = 2654435761
_MIX_B = 40503


@register(
    "part_pair_cooccurrence",
    sql="""
    WITH op AS (
      -- basket universe: a NULL order key is not a basket (Spark's
      -- groupBy would pool all such rows into one giant phantom basket)
      -- and a NULL part is not an item (r11 sweep)
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
    ),
    n AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op
    ),
    pc AS (
      SELECT l_partkey, COUNT(*) AS n_with FROM op GROUP BY l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_together
      FROM op a
      JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT p.p1, p.p2, p.n_together,
           CAST(p.n_together AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
             / (CAST(c1.n_with AS DOUBLE) * CAST(c2.n_with AS DOUBLE)) AS lift
    FROM pairs p
    CROSS JOIN n
    JOIN pc c1 ON p.p1 = c1.l_partkey
    JOIN pc c2 ON p.p2 = c2.l_partkey
    ORDER BY p.n_together DESC, p.p1, p.p2
    LIMIT 20
    """,
    operators=("J6", "A13", "O3"),
)
def part_pair_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: the 20 part pairs most often ordered
    together, with their lift n_together·N / (n_a·n_b) (>1 ⇒ the pair
    co-occurs more than independence predicts).

    The fact is scanned ONCE: baskets are grouped into sorted distinct
    item arrays and pinned with an eager localCheckpoint, so the three
    consumers (pair counts, per-item counts, basket total) share the
    materialization instead of each re-scanning the fact (the naive
    four-branch formulation scanned lineitem 10x in the physical plan).
    Pairs are generated MAP-SIDE from each basket's array (indexed
    ``transform`` over suffix slices — each unordered pair once,
    p1 < p2), so there is no self-join at all; fan-out per basket is
    C(items, 2), bounded by basket size (≤7 in TPC-H-shaped data),
    linear in baskets.  Skew guard at lake scale: cap or
    frequency-filter pathological baskets before pair expansion (one
    1000-item basket alone emits 500k pairs).  Lift's per-item counts
    join back on part id (AQE broadcasts them at test SF); the final
    top-20 is TakeOrderedAndProject with a total-order tiebreak.
    """
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .filter(F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("items"))
        .localCheckpoint(eager=True)  # one fact scan shared by 3 consumers
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    pc = (
        baskets.select(F.explode("items").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_with"))
    )
    pair_expr = F.expr(
        """
        flatten(transform(items, (x, i) ->
          transform(slice(items, i + 2, size(items) - i - 1),
                    y -> named_struct('p1', x, 'p2', y))))
        """
    )
    pairs = (
        baskets.select(F.explode(pair_expr).alias("pr"))
        .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .agg(F.count(F.lit(1)).alias("n_together"))
    )
    c1 = pc.select(F.col("l_partkey").alias("p1"), F.col("n_with").alias("n_with_1"))
    c2 = pc.select(F.col("l_partkey").alias("p2"), F.col("n_with").alias("n_with_2"))
    lift = (
        F.col("n_together").cast("double")
        * F.col("n_orders").cast("double")
        / (F.col("n_with_1").cast("double") * F.col("n_with_2").cast("double"))
    )
    return (
        pairs.crossJoin(F.broadcast(n))
        .join(c1, "p1")
        .join(c2, "p2")
        .select("p1", "p2", "n_together", lift.alias("lift"))
        .orderBy(F.col("n_together").desc(), "p1", "p2")
        .limit(20)
    )


@register(
    "doc_negative_pairs",
    sql=f"""
    WITH d AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS idx,
             COUNT(*) OVER () AS n
      FROM ({_SQL_DOCS1})
    ),
    pairs AS (
      SELECT d.doc_id, j.neg_rank,
             (d.idx + 1 + (d.doc_id * {_MIX_A} + j.neg_rank * {_MIX_B}) % (d.n - 1)) % d.n AS neg_idx
      FROM d
      CROSS JOIN (SELECT * FROM (VALUES (1), (2), (3)) AS t(neg_rank)) j
    )
    SELECT p.doc_id, p.neg_rank, d2.doc_id AS neg_doc_id, d2.lang AS neg_lang
    FROM pairs p JOIN d d2 ON p.neg_idx = d2.idx
    ORDER BY p.doc_id, p.neg_rank
    """,
    operators=("W1", "J6", "P4"),
)
def doc_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive negative sampling: k=3 deterministic pseudo-random
    non-self partners per document — the negatives table a contrastive
    training run joins against, reproducible across reruns and engines.

    The partner choice is pure integer arithmetic on a dense row index
    (Knuth-mix offset in [1, n−1], so never self), NOT an engine hash or
    rand() — both of which differ across engines/reruns and would break
    the oracle and run-to-run reproducibility.  The dense index comes
    from operators/ranks.py (range-partitioned rank — no unpartitioned
    window); the partner lookup is an equi-join on the index.  Cost at
    any scale: one range exchange + one keyed join of k·n id-only rows.
    """
    # canonical universe: the dense index is ORDER BY doc_id, so ids
    # must be unique and non-NULL for the sampler to be well-defined
    # (r11 sweep, seed d)
    docs = _docs_with_text(spark, sf_dir).select("doc_id", "lang")
    d = global_row_number(docs, ["doc_id"], rank_col="_rnk").withColumn(
        "idx", F.col("_rnk") - 1
    )
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        d.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "idx",
            "n",
            F.explode(F.sequence(F.lit(1), F.lit(3))).alias("neg_rank"),
        )
        .withColumn(
            "neg_idx",
            (
                F.col("idx")
                + 1
                + (F.col("doc_id") * _MIX_A + F.col("neg_rank") * _MIX_B)
                % (F.col("n") - 1)
            )
            % F.col("n"),
        )
    )
    d2 = d.select(
        F.col("idx").alias("neg_idx"),
        F.col("doc_id").alias("neg_doc_id"),
        F.col("lang").alias("neg_lang"),
    )
    return (
        pairs.join(d2, "neg_idx")
        .select("doc_id", "neg_rank", "neg_doc_id", "neg_lang")
        .orderBy("doc_id", "neg_rank")
    )


@register(
    "events_mergeable_hll_rollup",
    sql="""
    SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS merge_matches_direct,
           TRUE AS estimate_within_5pct
    FROM events WHERE ts IS NOT NULL
    """,
    operators=("A15", "Q4"),
)
def events_mergeable_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-aggregated sketch-table architecture: per-day DataSketches
    HLL sketches of user_id, unioned into a global estimate, checked
    against both the direct one-pass sketch and the exact count.

    This is the invariant-oracle pattern (like events_sketch_profile):
    DuckDB cannot evaluate DataSketches, so the oracle pins the exact
    distinct counts and asserts the two engine-side invariants are TRUE:
    (1) estimate(union(daily sketches)) equals estimate(direct sketch)
    to within 1% — the mergeability contract that lets a 100 TB lake
    store tiny per-partition sketch rows and answer "distinct users over
    any date range" by merging those rows instead of rescanning facts;
    (2) the merged estimate is within 5% of truth (lgK=12 ⇒ ~1.6% rsd).

    Plan: one keyed day-grain aggregate producing |days| binary sketch
    rows, then a single-row union agg over them — the expensive scan
    happens once, every subsequent rollup is O(days).
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())  # a NULL day is not a day (r11 sweep)
        .select(F.col("ts").cast("date").alias("day"), "user_id")
    )
    daily = ev.groupBy("day").agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    merged = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("direct_est"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return merged.crossJoin(F.broadcast(direct)).select(
        "n_days",
        "exact_users",
        (
            F.abs(F.col("merged_est") - F.col("direct_est"))
            <= F.lit(0.01) * F.col("direct_est")
        ).alias("merge_matches_direct"),
        (
            F.abs(F.col("merged_est").cast("double") - F.col("exact_users").cast("double"))
            <= F.lit(0.05) * F.col("exact_users").cast("double")
        ).alias("estimate_within_5pct"),
    )


#: Quantization scale for the covariance query: |x| < 0.6, so q ≤ 6e3,
#: q² ≤ 3.6e7, and every closed-form combination stays exact in DECIMAL.
_COV_SCALE = 10_000


@register(
    "embedding_dim_covariance",
    sql=f"""
    WITH q AS (
      SELECT list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_COV_SCALE}) AS BIGINT)) AS q
      FROM ({_SQL_EMB1})
    ),
    n AS (SELECT CAST(COUNT(*) AS DECIMAL(10,0)) AS n FROM q),
    dimsum AS (
      SELECT i.i AS dim, CAST(SUM(q.q[i.i]) AS DECIMAL(19,0)) AS sx
      FROM q, generate_series(1, 64) i(i)
      GROUP BY i.i
    ),
    pairsum AS (
      SELECT i.i AS di, j.j AS dj,
             CAST(SUM(q.q[i.i] * q.q[j.j]) AS DECIMAL(28,0)) AS sxy
      FROM q, generate_series(1, 63) i(i), generate_series(1, 64) j(j)
      WHERE j.j > i.i
      GROUP BY 1, 2
    )
    SELECT p.di AS dim_i, p.dj AS dim_j,
           CAST(CAST(n.n * p.sxy - a.sx * b.sx AS VARCHAR) AS DOUBLE)
             / (CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE)
                * {_COV_SCALE}.0 * {_COV_SCALE}.0) AS cov
    FROM pairsum p
    CROSS JOIN n
    JOIN dimsum a ON a.dim = p.di
    JOIN dimsum b ON b.dim = p.dj
    ORDER BY ABS(cov) DESC, dim_i, dim_j
    LIMIT 20
    """,
    operators=("A13", "J6", "O3"),
)
def embedding_dim_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-covariance matrix over the embedding dimensions — the 20
    strongest off-diagonal covariances, i.e. the redundant/correlated
    feature pairs a dimensionality-reduction or whitening pass targets.

    This is the distributed Gram/covariance pattern done the scalable
    way: each row emits its C(d,2) upper-triangle products MAP-SIDE
    (indexed ``sequence``/``element_at`` transforms — no self-join, no
    explode-then-join on row id), and the only shuffles are the (i,j)
    pair aggregate (d²/2 = 2016 groups regardless of row count) and the
    64-group dim aggregate.  Shuffle payload is bounded by d², never by
    n — at 10^9 rows the reduce side still sees 2016 groups.

    Determinism: floats are quantized (floor ×1e4, the engine's
    established quantized-embedding discipline), all sums are exact
    integers, the covariance closed form n·Σxy − Σx·Σy runs in
    scale-0 decimals, and the final conversion routes through
    exact_double (string cast) before the one division.  ABS for the
    ranking is exact on doubles.
    """
    e = _embeddings_valid(spark, sf_dir)  # canonical universe (r11 sweep)
    q = e.select(
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * _COV_SCALE).cast("long"),
        ).alias("q")
    ).localCheckpoint(eager=True)  # one scan shared by n / dimsum / pairsum
    n = q.agg(F.count(F.lit(1)).cast("decimal(10,0)").alias("n"))
    dimsum = (
        q.select(F.posexplode("q").alias("pos", "qv"))
        .groupBy((F.col("pos") + 1).alias("dim"))
        .agg(F.sum("qv").cast("decimal(19,0)").alias("sx"))
    )
    pair_expr = F.expr(
        """
        flatten(transform(sequence(1, 63), i ->
          transform(sequence(i + 1, 64), j ->
            named_struct('di', i, 'dj', j,
                         'xy', element_at(q, i) * element_at(q, j)))))
        """
    )
    pairsum = (
        q.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.di").alias("di"), F.col("p.dj").alias("dj"))
        .agg(F.sum("p.xy").cast("decimal(28,0)").alias("sxy"))
    )
    a = dimsum.select(F.col("dim").alias("di"), F.col("sx").alias("sx_i"))
    b = dimsum.select(F.col("dim").alias("dj"), F.col("sx").alias("sx_j"))
    num = exact_double(F.col("n") * F.col("sxy") - F.col("sx_i") * F.col("sx_j"))
    den = (
        F.col("n").cast("double")
        * F.col("n").cast("double")
        * F.lit(float(_COV_SCALE))
        * F.lit(float(_COV_SCALE))
    )
    return (
        pairsum.crossJoin(F.broadcast(n))
        .join(F.broadcast(a), "di")
        .join(F.broadcast(b), "dj")
        .select(
            F.col("di").alias("dim_i"),
            F.col("dj").alias("dim_j"),
            (num / den).alias("cov"),
        )
        .orderBy(F.abs(F.col("cov")).desc(), "dim_i", "dim_j")
        .limit(20)
    )


@register(
    "part_also_bought_top3",
    sql="""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
    ),
    pairs AS (
      SELECT a.l_partkey AS part, b.l_partkey AS partner, COUNT(*) AS n_together
      FROM op a
      JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT part, partner, n_together,
             ROW_NUMBER() OVER (PARTITION BY part
                                ORDER BY n_together DESC, partner) AS rec_rank
      FROM pairs
    )
    SELECT part, partner, n_together, rec_rank
    FROM ranked WHERE rec_rank <= 3
    ORDER BY part, rec_rank
    """,
    operators=("W5", "A13", "O3"),
)
def part_also_bought_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item recommendation table: each part's top-3 co-purchased
    partners — the "customers also bought" artifact, i.e. the
    item-grain view of part_pair_cooccurrence's global top pairs.

    Same scale discipline as the co-occurrence query: baskets pinned
    once (localCheckpoint), DIRECTED pairs generated map-side from each
    basket's array (every ordered pair (x,y), x≠y — each item sees all
    its partners), one (part, partner) aggregate, then a per-part
    window top-3 (WindowGroupLimit prunes map-side).  Never a self-join
    on the item catalog; fan-out is basket_size·(basket_size−1) per
    basket.
    """
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .filter(F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("items"))
        .localCheckpoint(eager=True)
    )
    pair_expr = F.expr(
        """
        flatten(transform(items, x ->
          transform(filter(items, y -> y != x),
                    y -> named_struct('part', x, 'partner', y))))
        """
    )
    pairs = (
        baskets.select(F.explode(pair_expr).alias("pr"))
        .groupBy(F.col("pr.part").alias("part"), F.col("pr.partner").alias("partner"))
        .agg(F.count(F.lit(1)).alias("n_together"))
    )
    w = Window.partitionBy("part").orderBy(
        F.col("n_together").desc(), F.col("partner")
    )
    return (
        pairs.withColumn("rec_rank", F.row_number().over(w))
        .filter(F.col("rec_rank") <= 3)
        .orderBy("part", "rec_rank")
    )


@register(
    "embedding_label_lang_alignment",
    sql="""
    WITH j AS (
      SELECT d.lang, e.label
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    )
    SELECT lang, label, COUNT(*) AS n_docs,
           CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY lang) AS share_of_lang
    FROM j
    GROUP BY lang, label
    ORDER BY lang, label
    """,
    operators=("J2", "A13", "W4"),
)
def embedding_label_lang_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality sanity check: the contingency table between the
    document table's language and the embedding table's cluster label
    (doc_id ≡ vec_id) with per-language shares — the "do the embedding
    clusters respect the text metadata?" audit run before trusting
    either side for curation decisions.  One id equi-join + one
    (lang, label) aggregate; the share window runs over the ≤
    |langs|×|labels| contingency cells (integer counts → the double
    division is the only float op).
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    j = d.join(e, d.doc_id == e.vec_id)
    cells = j.groupBy("lang", "label").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("lang")
    return (
        cells.select(
            "lang",
            "label",
            "n_docs",
            (
                F.col("n_docs").cast("double")
                / F.sum("n_docs").over(w).cast("double")
            ).alias("share_of_lang"),
        )
        .orderBy("lang", "label")
    )


@register(
    "embedding_dim_profile",
    sql=f"""
    WITH q AS (
      SELECT list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_COV_SCALE}) AS BIGINT)) AS q
      FROM ({_SQL_EMB1})
    ),
    per_dim AS (
      SELECT i.i AS dim,
             CAST(COUNT(*) AS DECIMAL(10,0)) AS n,
             MIN(q.q[i.i]) AS min_q,
             MAX(q.q[i.i]) AS max_q,
             CAST(SUM(q.q[i.i]) AS DECIMAL(19,0)) AS sx,
             CAST(SUM(q.q[i.i] * q.q[i.i]) AS DECIMAL(28,0)) AS sxx
      FROM q, generate_series(1, 64) i(i)
      GROUP BY i.i
    )
    SELECT dim, CAST(n AS BIGINT) AS n_vectors, min_q, max_q,
           CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
             / ({_COV_SCALE}.0 * {_COV_SCALE}.0) AS variance,
           max_q = min_q AS is_constant
    FROM per_dim
    ORDER BY dim
    """,
    operators=("A13", "P4", "Q4"),
)
def embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension feature profile: min / max / sample variance and a
    constant-dimension flag — the near-zero-variance screen a feature
    pipeline runs before PCA/whitening (a dead dimension wastes index
    space in every ANN structure downstream).  Diagonal companion to
    embedding_dim_covariance, same discipline: quantized integers,
    exact decimal sums, closed-form variance through exact_double.
    Shuffle payload is 64 dimension groups regardless of corpus size.
    """
    e = _embeddings_valid(spark, sf_dir)  # canonical universe (r11 sweep)
    q = e.select(
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * _COV_SCALE).cast("long"),
        ).alias("q")
    )
    per_dim = (
        q.select(F.posexplode("q").alias("pos", "qv"))
        .groupBy((F.col("pos") + 1).alias("dim"))
        .agg(
            F.count(F.lit(1)).cast("decimal(10,0)").alias("n"),
            F.min("qv").alias("min_q"),
            F.max("qv").alias("max_q"),
            F.sum("qv").cast("decimal(19,0)").alias("sx"),
            F.sum(F.col("qv") * F.col("qv")).cast("decimal(28,0)").alias("sxx"),
        )
    )
    nd = F.col("n").cast("double")
    variance = (
        exact_double(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        / (nd * (nd - F.lit(1.0)))
        / F.lit(float(_COV_SCALE) * float(_COV_SCALE))
    )
    return per_dim.select(
        "dim",
        F.col("n").cast("bigint").alias("n_vectors"),
        "min_q",
        "max_q",
        variance.alias("variance"),
        (F.col("max_q") == F.col("min_q")).alias("is_constant"),
    ).orderBy("dim")


#: KMV (bottom-k / K-Minimum-Values) sketch parameters.  The "hash" is a
#: modular affine permutation h(u) = (A·(u mod P) + B) mod P over the
#: Mersenne prime P = 2^31 − 1 — pure BIGINT arithmetic both Spark and
#: DuckDB evaluate bit-identically (A·(u mod P) < 2^62, no overflow),
#: unlike engine hash builtins which differ between the two.  k = 64
#: gives a ~1/sqrt(62) ≈ 13% rsd estimator — the catalog query pins the
#: exact value-level outputs, not just the tolerance.
from unicargo_medallion_data_pipeline_spark.operators.sketch import (  # noqa: E402
    KMV_A as _KMV_A,
    KMV_B as _KMV_B,
    KMV_K as _KMV_K,
    KMV_P as _KMV_P,
    kmv_hash as _kmv_hash,
)


# pmod form, mirroring operators/sketch.kmv_hash: DuckDB's % keeps the
# dividend's sign, so the inner ((u % P) + P) % P folds negative ids into
# [0, P); the outer term is then nonnegative and plain % suffices.
_KMV_SQL_HASH = (
    f"(({_KMV_A} * ((user_id % {_KMV_P} + {_KMV_P}) % {_KMV_P})"
    f" + {_KMV_B}) % {_KMV_P})"
)


@register(
    "events_kmv_distinct_rollup",
    sql=f"""
    WITH u AS (
      SELECT DISTINCT event_type, user_id, {_KMV_SQL_HASH} AS h FROM events
      WHERE user_id IS NOT NULL
    ),
    sk AS (
      SELECT event_type, user_id, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h, user_id) AS rn
      FROM u
    ),
    kept AS (SELECT * FROM sk WHERE rn <= {_KMV_K}),
    per_type AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS sketch_rows,
             CAST(MAX(h) AS BIGINT) AS kth_hash
      FROM kept GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_users
      FROM u GROUP BY event_type
    ),
    merged_in AS (SELECT DISTINCT user_id, h FROM kept),
    merged_k AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h, user_id) AS rn FROM merged_in
    ),
    merged AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m_rows, CAST(MAX(h) AS BIGINT) AS m_kth
      FROM merged_k WHERE rn <= {_KMV_K}
    ),
    direct_k AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h, user_id) AS rn
      FROM (SELECT DISTINCT user_id, h FROM u)
    ),
    direct AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS d_rows, CAST(MAX(h) AS BIGINT) AS d_kth
      FROM direct_k WHERE rn <= {_KMV_K}
    )
    SELECT p.event_type,
           e.exact_users,
           p.sketch_rows,
           p.kth_hash,
           CASE WHEN p.sketch_rows < {_KMV_K}
                THEN CAST(p.sketch_rows AS DOUBLE)
                ELSE CAST({(_KMV_K - 1)} * CAST({_KMV_P} AS BIGINT) AS DOUBLE)
                     / CAST(p.kth_hash AS DOUBLE) END AS kmv_est,
           CASE WHEN m.m_rows < {_KMV_K}
                THEN CAST(m.m_rows AS DOUBLE)
                ELSE CAST({(_KMV_K - 1)} * CAST({_KMV_P} AS BIGINT) AS DOUBLE)
                     / CAST(m.m_kth AS DOUBLE) END AS merged_est,
           CASE WHEN d.d_rows < {_KMV_K}
                THEN CAST(d.d_rows AS DOUBLE)
                ELSE CAST({(_KMV_K - 1)} * CAST({_KMV_P} AS BIGINT) AS DOUBLE)
                     / CAST(d.d_kth AS DOUBLE) END AS direct_est
    FROM per_type p
    JOIN exact e USING (event_type)
    CROSS JOIN merged m
    CROSS JOIN direct d
    ORDER BY p.event_type
    """,
    operators=("A15", "W5", "Q4"),
)
def events_kmv_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) mergeable distinct sketch with a FULL value-level
    oracle — the deterministic complement to events_mergeable_hll_rollup.

    Per event_type, keep the k=64 users with the smallest modular-affine
    hash (ties broken on user_id); the k-th smallest hash yields the
    classic KMV estimate (k−1)·P/h_(k) (Bar-Yossef et al., RANDOM'02;
    the DataSketches theta-sketch family is this idea industrialized).
    Mergeability is structural: the global bottom-k of a union is the
    bottom-k of the union of per-part bottom-k's — any user among the k
    globally-smallest hashes has fewer than k users below it in its own
    type, so it survives the per-type cut.  merged_est (rollup of the
    per-type sketch rows) therefore equals direct_est (one-pass global
    sketch) EXACTLY, and the oracle hash-compares both as values —
    unlike HLL, nothing here is an invariant-boolean shortcut, because
    the permutation hash is pure BIGINT arithmetic DuckDB replays
    bit-identically.

    At 100 TB: the per-type/day sketch table is |grains|·k tiny rows;
    any date-range distinct-count rollup merges those rows instead of
    rescanning facts.  Plan: one (type,user) dedup exchange → per-type
    window over ≤ type-cardinality partitions, then two window passes
    over ≤ |types|·k = 320 rows (single-partition BY CONSTRUCTION —
    sketch-sized, never data-sized).
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .filter(F.col("user_id").isNotNull())  # COUNT DISTINCT semantics;
        # a NULL hash would sort FIRST and corrupt a bottom-k slot
        .distinct()
        .withColumn("h", _kmv_hash(F.col("user_id")))
        # pin: `ev` feeds kept, exact, AND direct — unpinned, the fact
        # scan + dedup exchange would execute three times per run
        .localCheckpoint(eager=True)
    )
    w_type = Window.partitionBy("event_type").orderBy("h", "user_id")
    kept = (
        ev.withColumn("rn", F.row_number().over(w_type))
        .filter(F.col("rn") <= _KMV_K)
    )
    # Pin: `kept` feeds per_type and merged; sketch-sized (≤ |types|·k
    # rows) so the pin is free.  (`ev` carries its own pin above — the
    # scan/dedup subtree must not re-execute for exact/direct.)
    kept = kept.localCheckpoint(eager=True)
    per_type = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("sketch_rows"),
        F.max("h").cast("bigint").alias("kth_hash"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_users")
    )

    def _bottom_k_est(df: DataFrame, rows_col: str, kth_col: str) -> DataFrame:
        # Global bottom-k over a sketch-sized frame: the single-partition
        # window is bounded by the SKETCH size (≤ |types|·k), not data.
        w = Window.orderBy("h", "user_id")
        topk = (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _KMV_K)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias(rows_col),
                F.max("h").cast("bigint").alias(kth_col),
            )
        )
        return topk

    merged = _bottom_k_est(kept.select("user_id", "h").distinct(), "m_rows", "m_kth")
    direct = _bottom_k_est(ev.select("user_id", "h").distinct(), "d_rows", "d_kth")

    scale = float((_KMV_K - 1) * _KMV_P)

    def _est(rows_c: str, kth_c: str) -> F.Column:
        return F.when(
            F.col(rows_c) < _KMV_K, F.col(rows_c).cast("double")
        ).otherwise(F.lit(scale) / F.col(kth_c).cast("double"))

    return (
        per_type.join(exact, "event_type")
        .crossJoin(F.broadcast(merged))
        .crossJoin(F.broadcast(direct))
        .select(
            "event_type",
            "exact_users",
            "sketch_rows",
            "kth_hash",
            _est("sketch_rows", "kth_hash").alias("kmv_est"),
            _est("m_rows", "m_kth").alias("merged_est"),
            _est("d_rows", "d_kth").alias("direct_est"),
        )
        .orderBy("event_type")
    )


@register(
    "users_sliding_7d_kmv",
    sql=f"""
    WITH ue AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id,
             {_KMV_SQL_HASH} AS h
      FROM events
      WHERE user_id IS NOT NULL
    ),
    sk AS (
      SELECT day, user_id, h FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY day ORDER BY h, user_id) AS rn
        FROM ue
      ) WHERE rn <= {_KMV_K}
    ),
    days AS (SELECT DISTINCT day FROM ue),
    spread AS (
      SELECT DISTINCT d.day AS window_end, s.user_id, s.h
      FROM days d JOIN sk s ON s.day BETWEEN d.day - 6 AND d.day
    ),
    cut AS (
      SELECT window_end, h FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY window_end ORDER BY h, user_id) AS rn
        FROM spread
      ) WHERE rn <= {_KMV_K}
    )
    SELECT window_end,
           CAST(COUNT(*) AS BIGINT) AS sketch_rows,
           CAST(MAX(h) AS BIGINT) AS kth_hash,
           CASE WHEN COUNT(*) < {_KMV_K}
                THEN CAST(COUNT(*) AS DOUBLE)
                ELSE CAST({(_KMV_K - 1)} * CAST({_KMV_P} AS BIGINT) AS DOUBLE)
                     / CAST(MAX(h) AS DOUBLE) END AS users_7d_est
    FROM cut
    GROUP BY window_end
    ORDER BY window_end
    """,
    operators=("A15", "W3", "Q4"),
)
def users_sliding_7d_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day sliding distinct users ANSWERED FROM THE SKETCH TABLE — the
    grain-subset rollup the KMV summary exists for (SCALE.md): per-day
    bottom-64 sketch rows (≤ 64·|days| rows TOTAL) are replicated to the
    ≤ 7 windows each day serves, re-cut per window, and estimated — raw
    events are scanned exactly once, at sketch-build time.

    The exact twin is distinct_users_sliding_7d (bitmap rollup — exact
    but id-domain-sized state); this is the constant-state path: any
    window length, month-to-date, or ad-hoc grain subset re-cuts the
    SAME 64-row day sketches.  Mergeability makes the window estimate
    identical to sketching the window's raw events directly (the
    theorem in operators/sketch.py), and the modular-affine hash makes
    the whole thing — kth hash values included — value-level verifiable
    in DuckDB.  Plan: one (day,user) dedup exchange, one day-grain
    window, a ≤7× replication of SKETCH rows, one window-grain re-cut.
    """
    from unicargo_medallion_data_pipeline_spark.operators.sketch import kmv_bottom_k

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    day_sk = kmv_bottom_k(ev, ["day"], "user_id", _KMV_K).localCheckpoint(eager=True)
    days = day_sk.select("day").distinct().withColumnRenamed("day", "window_end")
    spread = (
        day_sk.select(
            "day", "user_id", "h", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off")
        )
        .withColumn("window_end", F.date_add(F.col("day"), F.col("off")))
        .join(days, "window_end", "left_semi")
        .select("window_end", "user_id", "h")
        .distinct()
    )
    w = Window.partitionBy("window_end").orderBy("h", "user_id")
    cut = spread.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KMV_K
    )
    est = F.when(
        F.col("sketch_rows") < _KMV_K, F.col("sketch_rows").cast("double")
    ).otherwise(
        F.lit(float((_KMV_K - 1) * _KMV_P)) / F.col("kth_hash").cast("double")
    )
    return (
        cut.groupBy("window_end")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("sketch_rows"),
            F.max("h").cast("bigint").alias("kth_hash"),
        )
        .select("window_end", "sketch_rows", "kth_hash", est.alias("users_7d_est"))
        .orderBy("window_end")
    )
