"""Tests for plans/tpch_gold9.py: triangle motif, calendar gap-fill,
SQL front door, sigma-gate outliers — DuckDB differential at smoke SF
plus structural invariants."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

QUERIES = [
    "nation_trade_triangles",
    "daily_order_spine_filled",
    "sql_frontdoor_revenue",
    "events_value_outliers",
]


@pytest.mark.parametrize("name", QUERIES)
def test_matches_duckdb_oracle_at_smoke_sf(spark, name):
    from unicargo_medallion_data_pipeline_spark import oracle
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    con = oracle.duckdb_connection(SF_SMOKE)
    q = CATALOG[name]
    res = oracle.compare_query(spark, con, name, q.fn, q.sql, SF_SMOKE)
    assert res.ok, res.detail


def test_triangles_are_oriented_and_graph_is_partial(spark):
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

    rows = CATALOG["nation_trade_triangles"].fn(spark, SF_SMOKE).collect()
    assert rows, "smoke graph must contain at least one triangle"
    n_nations = load_table(spark, SF_SMOKE, "nation").count()
    max_triangles = n_nations * (n_nations - 1) * (n_nations - 2) // 6
    # the edge predicate must keep the graph partial, else the oracle
    # is undiscriminating (every triple would be a triangle)
    assert len(rows) < max_triangles
    # oriented output: each triangle appears exactly once as a < b < c
    names = {(r["nation_a"], r["nation_b"], r["nation_c"]) for r in rows}
    assert len(names) == len(rows)


def test_spine_is_dense_and_zero_filled(spark):
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    rows = CATALOG["daily_order_spine_filled"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 365  # 1997 is not a leap year
    days = sorted(r["order_day"] for r in rows)
    assert (days[-1] - days[0]).days == 364  # contiguous spine
    assert all(r["n_orders"] >= 0 for r in rows)
    # at smoke SF some days MUST be empty — proves the zero-fill ran
    assert any(r["n_orders"] == 0 for r in rows)


def test_outlier_gate_broadcasts_stats_not_facts(spark):
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    df = CATALOG["events_value_outliers"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the fact side must never sort-merge against the 5-row stats table
    assert "SortMergeJoin" not in plan


def test_sql_frontdoor_matches_dataframe_equivalent(spark):
    """The SQL text and a hand-built DataFrame plan must agree row-for-row
    — same Catalyst pipeline, same results."""
    from pyspark.sql import functions as F

    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

    via_sql = CATALOG["sql_frontdoor_revenue"].fn(spark, SF_SMOKE)
    o = load_table(spark, SF_SMOKE, "orders")
    via_df = o.groupBy(
        "o_orderpriority", F.year("o_orderdate").cast("int").alias("order_year")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_revenue"),
    )
    a = {tuple(r) for r in via_sql.collect()}
    b = {tuple(r) for r in via_df.collect()}
    assert a == b
