"""Tests for the dataset-health analytics batch: the snapshot-diff
operator's classification semantics and the plan shapes of the drift /
trend / corr / winsorize / gini queries."""

from __future__ import annotations

import contextlib
import io

import pytest

from unicargo_medallion_data_pipeline_spark.operators.diff import (
    ADDED,
    CHANGED,
    REMOVED,
    UNCHANGED,
    diff_summary,
    snapshot_diff,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def catalog():
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    return CATALOG


# ---------------------------------------------------------------- diff op


def _frames(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", None), (5, "e", 50.0)],
        "k int, s string, v double",
    )
    return old, new


def test_snapshot_diff_classifies_all_four_statuses(spark):
    old, new = _frames(spark)
    rows = {r["k"]: r["change_status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert rows == {1: UNCHANGED, 2: CHANGED, 3: UNCHANGED, 4: REMOVED, 5: ADDED}


def test_snapshot_diff_null_vs_value_is_changed(spark):
    old = spark.createDataFrame([(1, None)], "k int, v string")
    new = spark.createDataFrame([(1, "x")], "k int, v string")
    assert snapshot_diff(old, new, ["k"]).collect()[0]["change_status"] == CHANGED


def test_snapshot_diff_restricts_to_compare_cols(spark):
    old, new = _frames(spark)
    # Only compare v: key 2's s-change must NOT count as changed.
    rows = {
        r["k"]: r["change_status"]
        for r in snapshot_diff(old, new, ["k"], compare_cols=["v"]).collect()
    }
    assert rows[2] == UNCHANGED


def test_snapshot_diff_carries_old_and_new_values(spark):
    old, new = _frames(spark)
    row = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}[2]
    assert row["s_old"] == "b" and row["s_new"] == "B"


def test_snapshot_diff_rejects_bad_columns(spark):
    old, new = _frames(spark)
    with pytest.raises(ValueError, match="at least one key"):
        snapshot_diff(old, new, [])
    with pytest.raises(ValueError, match="missing"):
        snapshot_diff(old, new, ["k"], compare_cols=["nope"])


def test_diff_summary_counts(spark):
    old, new = _frames(spark)
    counts = {r["change_status"]: r["n_keys"] for r in diff_summary(old, new, ["k"]).collect()}
    assert counts == {UNCHANGED: 2, CHANGED: 1, REMOVED: 1, ADDED: 1}


# ------------------------------------------------------------ plan shapes


def test_snapshot_diff_query_is_single_equi_join(spark, catalog):
    plan = plan_of(catalog["orders_snapshot_diff"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_gini_has_no_single_partition_window(spark, catalog):
    """The Gini rank comes from operators/ranks.py, not an unpartitioned
    WindowExec — the plan must contain no Window operator at all."""
    plan = plan_of(catalog["user_activity_gini"].fn(spark, SF))
    assert "Window" not in plan, "gini acquired a window — single-partition hazard"


def test_winsorize_broadcasts_the_cuts(spark, catalog):
    plan = plan_of(catalog["events_winsorized_stats"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_corr_is_single_shuffle_aggregate(spark, catalog):
    """One keyed exchange (the partial→final agg); the only other
    exchange is the 3-row orderBy range partitioning."""
    plan = plan_of(catalog["lineitem_price_qty_corr"].fn(spark, SF))
    assert plan.count("hashpartitioning") == 1
    assert "partial_sum" in plan  # map-side combine of the exact sums


def test_drift_aggregates_before_single_partition_window(spark, catalog):
    """The only SinglePartition exchange operates on the 10-row bin
    aggregate, never the raw events: exactly one keyed (hash) exchange
    for the bin groupBy, then the bounded window."""
    plan = plan_of(catalog["events_value_drift"].fn(spark, SF))
    assert plan.count("hashpartitioning") >= 1
    keyed = plan.count("Exchange (") - plan.count("BroadcastExchange (")
    assert keyed <= 2  # bin agg + SinglePartition over 10 rows


def test_trend_joins_without_cartesian(spark, catalog):
    plan = plan_of(catalog["segment_revenue_trend"].fn(spark, SF))
    assert "CartesianProduct" not in plan


def test_snapshot_diff_self_is_all_unchanged(spark):
    old, _ = _frames(spark)
    statuses = {r["change_status"] for r in snapshot_diff(old, old, ["k"]).collect()}
    assert statuses == {UNCHANGED}


def test_content_fingerprint_detects_single_row_change(spark, catalog):
    """Same data → same hash; any one-row perturbation → different hash
    (row order and partitioning never matter: the sum is commutative)."""
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    base = catalog["orders_content_fingerprint"].fn(spark, SF).collect()[0]
    again = catalog["orders_content_fingerprint"].fn(spark, SF).collect()[0]
    assert (base["n_rows"], base["content_hash"]) == (again["n_rows"], again["content_hash"])

    o = load_table(spark, SF, "orders").withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == 1, F.col("o_totalprice") + 1).otherwise(
            F.col("o_totalprice")
        ),
    )
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        F.col("o_orderdate").cast("date").cast("string"),
        F.col("o_orderpriority"),
    )
    h15 = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("decimal(19,0)")
    perturbed = o.select(h15.alias("h")).agg(
        F.sum("h").cast("decimal(38,0)").cast("string").alias("content_hash")
    ).collect()[0]["content_hash"]
    assert perturbed != base["content_hash"]


LATE_ROUND_QUERIES = [
    "events_user_quota_batch",
    "events_ab_value_ttest",
    "priority_price_extremes",
    "events_value_mad",
    "latest_orders_with_ties",
    "nation_revenue_share_of_region",
    "monthly_revenue_mom",
    "daily_revenue_zscore_28d",
    "corpus_type_token_ratio",
    "customer_rfm_scores",
    "revenue_dow_seasonality",
    "funnel_time_to_convert",
    "dedup_savings_by_source",
    "revenue_top_decile_share",
    "hourly_error_rate_24h",
    "daily_new_vs_returning",
    "user_longest_streak",
    "nation_supplier_hhi",
    "part_also_bought_top3",
]


def test_late_round_queries_have_no_cartesian_products(spark, catalog):
    """Every late-round analytics query must candidate-generate through
    equi-joins/broadcasts — the 1-row scalar broadcasts (BNLJ) are the
    only permitted non-equi joins."""
    for name in LATE_ROUND_QUERIES:
        plan = plan_of(catalog[name].fn(spark, SF))
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_late_round_results_nonempty_and_scalar(spark, catalog):
    """Each produces rows at the smallest SF and only scalar columns
    (driver-hashability contract)."""
    for name in LATE_ROUND_QUERIES:
        df = catalog[name].fn(spark, SF)
        assert not any(
            t.startswith(("array", "map", "struct")) for _, t in df.dtypes
        ), f"{name} emits non-scalar columns"
        assert len(df.take(1)) == 1, f"{name} returned no rows at sf0.001"


def test_schema_diff_reports_column_level_drift(spark):
    from pyspark.sql import functions as F

    from unicargo_medallion_data_pipeline_spark.operators.diff import schema_diff

    old = spark.createDataFrame([(1, "a", 1.0)], "k int, s string, v double")
    new = spark.createDataFrame([(1, "a", 1)], "k int, s string, v int").withColumn(
        "w", F.lit("x")
    )
    new = new.drop("s").select("k", "v", "w")
    d = {r["column"]: r for r in schema_diff(old, new)}
    assert d["k"]["status"] == "unchanged"
    assert d["s"]["status"] == "removed"
    assert d["v"]["status"] == "retyped" and d["v"]["new_type"] == "int"
    assert d["w"]["status"] == "added"


def test_snapshot_diff_direction_symmetry(spark):
    """diff(A→B) and diff(B→A) must mirror: added↔removed swap, changed
    and unchanged counts equal — the involution property a CDC report
    consumer relies on."""
    old, new = _frames(spark)
    fwd = {r["change_status"]: r["n_keys"] for r in diff_summary(old, new, ["k"]).collect()}
    rev = {r["change_status"]: r["n_keys"] for r in diff_summary(new, old, ["k"]).collect()}
    assert fwd.get(ADDED, 0) == rev.get(REMOVED, 0)
    assert fwd.get(REMOVED, 0) == rev.get(ADDED, 0)
    assert fwd.get(CHANGED, 0) == rev.get(CHANGED, 0)
    assert fwd.get(UNCHANGED, 0) == rev.get(UNCHANGED, 0)
