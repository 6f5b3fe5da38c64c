"""Document-corpus queries: text analysis over the `documents` table.

Library logic lives in textops/analysis.py; each query here pairs it with
a literal DuckDB mirror (same stopword/marker sets, same normalization, so
values hash-match exactly).  SURVEY north-star operators: language-ID,
quality scoring, token counting, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.plans.catalog import register
from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
from unicargo_medallion_data_pipeline_spark.textops import analysis as ta

# DuckDB fragments mirroring textops/analysis.py
_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"
_NTOK = f"len({_TOKS})"


def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_SW = _sql_list(ta.STOPWORDS_EN)
_NSW = f"len(list_filter({_TOKS}, x -> list_contains({_SW}, x)))"
_NPUNCT = "(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))"
_CJK = "(length(text) - length(regexp_replace(text, '[^一-鿿]', '', 'g')))"


def _marker_sql(lang: str) -> str:
    return f"len(list_filter({_TOKS}, x -> list_contains({_sql_list(ta.MARKERS[lang])}, x)))"


@register(
    "doc_token_stats",
    sql=f"""
    WITH stats AS (
      SELECT
        doc_id, lang, source,
        CAST({_NTOK} AS INTEGER) AS n_tokens,
        CAST(len(list_distinct({_TOKS})) AS INTEGER) AS n_distinct_tokens,
        CAST(length({_NORM}) AS INTEGER) AS n_chars_norm
      FROM documents
    )
    SELECT
      doc_id, lang, source, n_tokens, n_distinct_tokens, n_chars_norm,
      CAST(n_chars_norm - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len,
      CAST(n_distinct_tokens AS DOUBLE) / n_tokens AS lexical_diversity
    FROM stats
    """,
    operators=("P4", "P5"),
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics (north-star text analysis).  Pure
    narrow projection — no shuffle, fully codegen'd at any scale."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.select(
        "doc_id",
        "lang",
        "source",
        ta.token_count("text").alias("n_tokens"),
        ta.distinct_token_count("text").alias("n_distinct_tokens"),
        F.length(ta.norm_text("text")).alias("n_chars_norm"),
    )
    return stats.select(
        "*",
        (
            (F.col("n_chars_norm") - (F.col("n_tokens") - 1)).cast("double") / F.col("n_tokens")
        ).alias("avg_token_len"),
        (F.col("n_distinct_tokens").cast("double") / F.col("n_tokens")).alias(
            "lexical_diversity"
        ),
    )


@register(
    "doc_quality_scores",
    sql=f"""
    WITH raw AS (
      SELECT
        doc_id,
        CAST({_NTOK} AS INTEGER) AS n_tokens,
        CAST({_NSW} AS INTEGER) AS n_stopwords,
        CAST({_NPUNCT} AS INTEGER) AS n_punct,
        CAST(length(text) AS INTEGER) AS n_chars
      FROM documents
    )
    SELECT
      doc_id, n_tokens, n_stopwords, n_punct,
      CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
      CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio,
      0.4 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
        + 0.3 * (1.0 - CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE))
        + 0.3 * (CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS quality_score
    FROM raw
    """,
    operators=("P4",),
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training quality heuristics: length / punctuation / stopword
    ratios + composite score (north-star text analysis)."""
    d = load_table(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id",
        ta.token_count("text").alias("n_tokens"),
        ta.stopword_count("text").alias("n_stopwords"),
        ta.punct_count("text").alias("n_punct"),
        F.length("text").alias("n_chars"),
    )
    n_tok = F.col("n_tokens").cast("double")
    n_chars = F.col("n_chars").cast("double")
    sw_ratio = F.col("n_stopwords").cast("double") / n_tok
    punct_ratio = F.col("n_punct").cast("double") / n_chars
    return raw.select(
        "doc_id",
        "n_tokens",
        "n_stopwords",
        "n_punct",
        sw_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        (
            F.lit(0.4) * F.least(F.lit(1.0), n_tok / F.lit(100.0))
            + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
            + F.lit(0.3) * sw_ratio
        ).alias("quality_score"),
    )


@register(
    "doc_language_id",
    sql=f"""
    WITH scored AS (
      SELECT
        doc_id, lang,
        CAST({_marker_sql('en')} AS INTEGER) AS en_markers,
        CAST({_marker_sql('de')} AS INTEGER) AS de_markers,
        CAST({_marker_sql('fr')} AS INTEGER) AS fr_markers,
        CAST({_marker_sql('es')} AS INTEGER) AS es_markers,
        CAST({_CJK} AS INTEGER) AS cjk_chars
      FROM documents
    )
    SELECT *,
      CASE
        WHEN cjk_chars > 0 THEN 'zh'
        WHEN en_markers >= de_markers AND en_markers >= fr_markers
             AND en_markers >= es_markers THEN 'en'
        WHEN de_markers >= fr_markers AND de_markers >= es_markers THEN 'de'
        WHEN fr_markers >= es_markers THEN 'fr'
        ELSE 'es'
      END AS predicted_lang,
      (CASE
        WHEN cjk_chars > 0 THEN 'zh'
        WHEN en_markers >= de_markers AND en_markers >= fr_markers
             AND en_markers >= es_markers THEN 'en'
        WHEN de_markers >= fr_markers AND de_markers >= es_markers THEN 'de'
        WHEN fr_markers >= es_markers THEN 'fr'
        ELSE 'es'
      END) = lang AS lang_match
    FROM scored
    """,
    operators=("P4", "P8"),
)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/marker language-ID heuristic with deterministic argmax
    (north-star language identification)."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        ta.marker_count("en", "text").alias("en_markers"),
        ta.marker_count("de", "text").alias("de_markers"),
        ta.marker_count("fr", "text").alias("fr_markers"),
        ta.marker_count("es", "text").alias("es_markers"),
        ta.cjk_char_count("text").alias("cjk_chars"),
    )
    pred = (
        F.when(F.col("cjk_chars") > 0, "zh")
        .when(
            (F.col("en_markers") >= F.col("de_markers"))
            & (F.col("en_markers") >= F.col("fr_markers"))
            & (F.col("en_markers") >= F.col("es_markers")),
            "en",
        )
        .when(
            (F.col("de_markers") >= F.col("fr_markers"))
            & (F.col("de_markers") >= F.col("es_markers")),
            "de",
        )
        .when(F.col("fr_markers") >= F.col("es_markers"), "fr")
        .otherwise("es")
    )
    return scored.select(
        "*", pred.alias("predicted_lang"), (pred == F.col("lang")).alias("lang_match")
    )


@register(
    "doc_fingerprint_dedup",
    sql=f"""
    WITH fp AS (
      SELECT doc_id, md5({_NORM}) AS fingerprint
      FROM documents
    )
    SELECT
      doc_id,
      fingerprint,
      CAST(COUNT(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS dup_group_size,
      MIN(doc_id) OVER (PARTITION BY fingerprint) AS canonical_doc_id,
      doc_id = MIN(doc_id) OVER (PARTITION BY fingerprint) AS keep
    FROM fp
    """,
    operators=("P10", "W5"),
)
def doc_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via md5-of-normalized-text fingerprints: every doc gets
    its dup-group size, canonical id, and a keep/drop flag (north-star
    exact dedup; scalable hash-groupBy — one shuffle on the fingerprint)."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select("doc_id", ta.fingerprint("text").alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return fp.select(
        "doc_id",
        "fingerprint",
        F.count(F.lit(1)).over(w).alias("dup_group_size"),
        F.min("doc_id").over(w).alias("canonical_doc_id"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
    )


@register(
    "doc_corpus_rollup",
    sql=f"""
    WITH stats AS (
      SELECT source, lang,
             CAST({_NTOK} AS INTEGER) AS n_tokens,
             n_chars
      FROM documents
    )
    SELECT
      source, lang,
      COUNT(*) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens_per_doc,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM stats
    GROUP BY source, lang
    """,
    operators=("A4", "A13"),
)
def doc_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup by (source, lang) — the dataset-card
    aggregation every training corpus needs."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.select("source", "lang", ta.token_count("text").alias("n_tokens"), "n_chars")
    return stats.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens_per_doc"),
        F.sum("n_chars").alias("total_chars"),
    )
