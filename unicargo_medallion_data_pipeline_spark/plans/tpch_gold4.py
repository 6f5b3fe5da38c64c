"""Gold queries, batch 4: embedding near-dup pairs, rank-family windows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.functions.exact import DEC
from unicargo_medallion_data_pipeline_spark.operators.guards import guard_all_pairs
from unicargo_medallion_data_pipeline_spark.plans.catalog import register
from unicargo_medallion_data_pipeline_spark.plans.similarity_gold import _SQL_EMB1
from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
from unicargo_medallion_data_pipeline_spark.textops import similarity as sim

_QI = "CAST(floor(CAST({v} AS DOUBLE) * 100000000) AS BIGINT)"


@register(
    "embedding_near_dup_pairs",
    sql=f"""
    WITH pair AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        SUM({_QI.format(v='a.embedding[i.i]')} * {_QI.format(v='b.embedding[i.i]')}) AS dot_q,
        SUM({_QI.format(v='a.embedding[i.i]')} * {_QI.format(v='a.embedding[i.i]')}) AS aa,
        SUM({_QI.format(v='b.embedding[i.i]')} * {_QI.format(v='b.embedding[i.i]')}) AS bb
      FROM ({_SQL_EMB1}) a, ({_SQL_EMB1}) b, generate_series(1, 64) i(i)
      WHERE a.vec_id < b.vec_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id,
      CAST(dot_q AS DOUBLE) / (sqrt(CAST(aa AS DOUBLE)) * sqrt(CAST(bb AS DOUBLE)))
        AS cosine_sim
    FROM pair
    WHERE CAST(dot_q AS DOUBLE) / (sqrt(CAST(aa AS DOUBLE)) * sqrt(CAST(bb AS DOUBLE))) >= 0.35
    """,
    operators=("P10", "J7"),
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.35) — the exact
    full-pairwise baseline (north-star embedding dedup).  At lake scale
    the same rescoring runs on LSH-bucketed candidates instead of the
    cross join (see cosine_topk_lsh); this entry is the correctness
    anchor for that path.  Size-guarded beyond ALL_PAIRS_GUARD_ROWS."""
    from unicargo_medallion_data_pipeline_spark.plans.similarity_gold import _embeddings_valid

    # canonical similarity universe (present / dim-64 / nonzero-norm /
    # one row per vec_id) — same contract as the whole embedding family
    # (r11 sweep)
    e = guard_all_pairs(
        _embeddings_valid(spark, sf_dir),
        "embedding_near_dup_pairs", "cosine_topk_lsh (embedding_knn_lsh)",
    )
    a = e.select(F.col("vec_id").alias("a_id"), sim.quantized(F.col("embedding")).alias("a_q"))
    b = e.select(F.col("vec_id").alias("b_id"), sim.quantized(F.col("embedding")).alias("b_q"))
    pairs = a.crossJoin(b).filter(F.col("a_id") < F.col("b_id"))
    cos = F.try_divide(  # NULL on a zero-norm vector (= DuckDB x/0.0)
        sim.dot_q(F.col("a_q"), F.col("b_q")).cast("double"),
        F.sqrt(sim.dot_q(F.col("a_q"), F.col("a_q")).cast("double"))
        * F.sqrt(sim.dot_q(F.col("b_q"), F.col("b_q")).cast("double")),
    )
    return (
        pairs.select("a_id", "b_id", cos.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= 0.35)
    )


@register(
    "customer_value_tiers",
    sql=f"""
    WITH revenue AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS customer_revenue,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT
      o_custkey, customer_revenue, n_orders,
      CAST(DENSE_RANK() OVER (ORDER BY n_orders DESC) AS INTEGER) AS order_count_rank,
      CAST(NTILE(4) OVER (ORDER BY customer_revenue DESC, o_custkey) AS INTEGER)
        AS revenue_quartile
    FROM revenue
    """,
    operators=("W5",),
)
def customer_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank + ntile customer tiering — completes the §2.5 W5 family
    (row_number/lag covered elsewhere).  ntile carries a full tiebreak so
    tile boundaries are deterministic.

    Scale hazard (SURVEY §4 hazard 1): the unpartitioned windows move
    all customers to ONE partition — acceptable for an aggregated
    per-customer frame, not for fact-sized inputs.  The engine's scale
    twin is operators/ranks.py (range-partition + offset composition,
    no Window node, differential-tested against these exact
    semantics)."""
    o = load_table(spark, sf_dir, "orders")
    revenue = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("customer_revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return revenue.select(
        "o_custkey",
        "customer_revenue",
        "n_orders",
        F.dense_rank().over(Window.orderBy(F.col("n_orders").desc())).alias("order_count_rank"),
        F.ntile(4)
        .over(Window.orderBy(F.col("customer_revenue").desc(), F.col("o_custkey")))
        .alias("revenue_quartile"),
    )
