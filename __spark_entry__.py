"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``unicargo_medallion_data_pipeline_spark`` package; this file
only adapts the catalog to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable regardless of the driver's cwd.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG  # noqa: E402

# The driver's correctness harness samples the FIRST 50 entries of queries()
# in iteration order.  To maximize provable coverage across rounds we order
# the catalog explicitly: queries that still need a green driver row (or
# whose plans changed this round) go first; queries freshly verified in the
# last round rotate to the tail.  Anything newly registered and not named
# below lands in the middle — inside the sampled window.

# r7 window (50), per the r6 verdict's rotation plan (task 1):
#   slots 1-33  — the full never-driver-verified backlog: every round-6
#                 addition registered after the r6 window rotation
#                 (KMV family, prefix-filter pair, Pareto frontier, PMI,
#                 IVM, bucketed join, moments, attribution, churn, RRF,
#                 trend slope, TWAP/OHLC, LTV/CUSUM/datasheet,
#                 mutual-NN/1-NN accuracy, reconciliation/Benford, CDC
#                 state, Z-order scan, CSV quarantine, column profile,
#                 weighted median, sampling allocation, manifest
#                 history, neardup representatives, hard negatives,
#                 peak concurrency).  Catalog growth is FROZEN this
#                 round (r6 verdict task 3) so this backlog goes to
#                 zero: after r7 every catalog query has ≥1 driver row.
#   slots 34-50 — the 17 stalest single-green tail entries (r2-only and
#                 r3-only) for re-confirmation.
# Every windowed query was locally oracle-verified at sf0.01 this round
# under the type-sensitive replica (oracle.py type lattice), and the
# full 50-slot window re-ran green under a vanilla driver-style session.
# doc_prefix_filter_neardups' sf0.1 oracle run (the r6 verdict's open
# debt) was completed this round — see docs/COVERAGE.md.
_PRIORITY = [
    # --- never-driver-verified backlog (33, round-6 additions)
    "doc_neardup_representatives",
    "orders_reconciliation_audit",
    "orders_benford_digits",
    "priority_rollup_cdf_maintained",
    "embedding_hard_negatives",
    "orders_manifest_history",
    "orders_cdc_apply_state",
    "events_zorder_pruned_scan",
    "orders_csv_quarantine_roundtrip",
    "user_value_twap",
    "events_hourly_ohlc",
    "cohort_ltv_matrix",
    "daily_revenue_cusum",
    "corpus_datasheet",
    "embedding_mutual_nn_pairs",
    "embedding_knn_label_accuracy",
    "peak_concurrent_sessions",
    "events_kmv_distinct_rollup",
    "doc_prefix_filter_jaccard",
    "part_pareto_frontier",
    "corpus_bigram_pmi",
    "orders_customer_join_ivm",
    "orders_lineitem_bucketed_join",
    "events_value_moments",
    "purchase_click_attribution",
    "user_churn_labels",
    "embedding_rrf_fusion",
    "segment_revenue_trend_slope",
    "orders_column_profile",
    "order_value_weighted_median",
    "doc_prefix_filter_neardups",
    "doc_sampling_allocation",
    "users_sliding_7d_kmv",
    # --- stalest single-green tail entries (re-confirmation fills)
    # r2-only
    "doc_curation_pipeline",
    "lang_id_confusion",
    "corpus_token_df",
    # r3-only
    "events_sketch_profile",
    "customer_revenue_rank",
    "customer_revenue_decile",
    "order_value_percentiles",
    "errors_in_session",
    "events_hourly_rollup",
    "clicks_asof_purchase",
    "urgent_order_customers",
    "order_grouping_sets",
    "customer_revenue_percentiles",
    "nation_shipments_salted_join",
    "doc_tfidf_top_terms",
    "doc_editdist_near_dups",
    "doc_decontaminated_sample",
]

# Tail: every query with at least one green driver row, ordered
# least-/stalest-verified first so those sit nearest the window boundary
# if space ever opens.  (The 17 stalest moved into the r7 window above;
# _ordered_names dedups, front wins.  The 50 r6-window queries — all
# driver-green in CORRECTNESS_r06.json — are appended at the very end
# as the freshest-verified.)
_TAIL = [
    # single green row ever (r3 only)
    "cheapest_shipment_supplier",
    "customer_order_dates",
    "order_measures_unpivot",
    "events_trailing_10min",
    "events_props_variant",
    "distinct_users_bitmap",
    "embedding_knn_ivf",
    # single green row ever (r5 only) — the 45 hash-green rows of
    # CORRECTNESS_r05.json, rotated out of the window this round
    "flight_airline_scorecard",
    "flight_busiest_routes",
    "flight_rolling_otp",
    "flight_delay_distribution",
    "flight_airline_dow",
    "flight_airport_traffic",
    "flight_weekly_summary",
    "flight_distance_buckets",
    "flight_monthly_trends",
    "flight_efficiency",
    "flight_aircraft_utilization",
    "flight_number_performance",
    "flight_weekend_split",
    "flight_quarterly_summary",
    "scd2_as_of_snapshot",
    "rollup_incremental_equals_full",
    "doc_chunking",
    "doc_neardup_components",
    "doc_inverted_index",
    "doc_incremental_dedup",
    "doc_train_val_test_split",
    "doc_weighted_sample",
    "doc_negative_pairs",
    "corpus_heavy_hitters",
    "corpus_type_token_ratio",
    "nation_trade_pagerank",
    "nation_trade_triangles",
    "airport_neighbor_pairs",
    "embedding_dim_covariance",
    "embedding_label_lang_alignment",
    "embedding_dim_profile",
    "part_pair_cooccurrence",
    "part_also_bought_top3",
    "events_funnel_conversion",
    "user_weekly_retention",
    "event_transition_matrix",
    "events_value_forward_fill",
    "events_mergeable_hll_rollup",
    "distinct_users_sliding_7d",
    "daily_order_spine_filled",
    "sql_frontdoor_revenue",
    "orders_snapshot_diff",
    "customer_rfm_scores",
    "customer_running_balance",
    "event_halves_nullsafe_join",
    # green in r1+r2
    "pricing_summary",
    "daily_order_summary",
    "weekly_order_stats",
    "monthly_order_trends",
    "nation_dim",
    "rolling_7day_revenue",
    "seasonal_order_agg",
    "weekend_vs_weekday_orders",
    "quarterly_order_trends",
    "customer_intensity_by_segment",
    "customer_order_gaps",
    "top_customers_per_segment",
    "customer_cohort_set_ops",
    "first_lineitem_per_order",
    "distinct_order_profiles",
    "order_id_formatting",
    "doc_token_stats",
    "doc_quality_scores",
    "generated_dim_date",
    "fillna_cleaned_events",
    "metadata_enriched_orders",
    "order_priority_rollup",
    # green in r1+r3 (embedding_near_dup_pairs: r4 guard verified locally)
    "events_props_json",
    "doc_bpe_token_stats",
    "embedding_near_dup_pairs",
    "customer_value_tiers",
    "cleaned_events_pipeline",
    "nation_trade_degree",
    "order_priority_pivot",
    "order_status_priority_cube",
    # green in r2+r3
    "doc_deterministic_sample",
    "doc_stratified_cap",
    "doc_contamination_overlap",
    "doc_minhash_near_dups",
    "doc_simhash_clusters",
    "embedding_knn_lsh",
    "embedding_label_centroids",
    # green in all three rounds (jaccard/knn_exact: r4 guards verified locally)
    "segment_scorecard",
    "top_trade_routes",
    "order_value_buckets",
    "orphan_fk_audit",
    "global_order_stats",
    "events_null_profile",
    "events_tumbling_5min",
    "events_sessionization",
    "doc_language_id",
    "doc_fingerprint_dedup",
    "doc_corpus_rollup",
    "doc_token_jaccard_pairs",
    "embedding_norms",
    "embedding_knn_exact",
    # --- the r6 window (50/50 green in CORRECTNESS_r06.json), rotated
    #     out as the freshest-verified
    "flight_seasonal_summary",
    "flight_daily_summary",
    "flight_operational_summary",
    "top_event_paths",
    "events_user_quota_batch",
    "events_value_outliers",
    "events_value_drift",
    "segment_revenue_trend",
    "lineitem_price_qty_corr",
    "events_winsorized_stats",
    "user_activity_gini",
    "events_reaggregation_chain",
    "orders_content_fingerprint",
    "events_ab_value_ttest",
    "priority_price_extremes",
    "events_value_mad",
    "latest_orders_with_ties",
    "nation_revenue_share_of_region",
    "monthly_revenue_mom",
    "daily_revenue_zscore_28d",
    "revenue_dow_seasonality",
    "funnel_time_to_convert",
    "dedup_savings_by_source",
    "revenue_top_decile_share",
    "hourly_error_rate_24h",
    "daily_new_vs_returning",
    "user_longest_streak",
    "nation_supplier_hhi",
    "daily_reactivations",
    "record_revenue_days",
    "daily_revenue_autocorr",
    "events_hourly_burstiness",
    "events_value_binned_quantiles",
    "events_window_top_types",
    "doc_duplicate_ngram_rate",
    "events_user_erasure_audit",
    "orders_expectation_report",
    "nation_reach_recursive",
    "nation_top_customers_lateral",
    "customer_order_window_corners",
    "orders_acid_timetravel",
    "events_manifest_pruned_scan",
    "events_sliding_10min_counts",
    "events_bloom_pruned_lookup",
    "orders_manifest_cdf",
    "source_mixture_weights",
    "doc_binary_asset_features",
    "doc_repetition_signals",
    "doc_pii_redaction",
    "doc_shard_packing",
]


#: First _BACKLOG_N entries of _PRIORITY are the never-driver-verified
#: backlog; the rest are stale re-confirmations.  Unlisted (newly
#: registered) queries slot BETWEEN them so they stay inside the
#: driver's 50-entry sample window by displacing re-confirmations —
#: _PRIORITY alone fills all 50 slots, so appending the middle after it
#: would silently push every new query out of the window.
_BACKLOG_N = 33


def _ordered_names() -> list[str]:
    front = [n for n in _PRIORITY if n in CATALOG]
    tail = [n for n in _TAIL if n in CATALOG and n not in front]
    placed = set(front) | set(tail)
    middle = [n for n in CATALOG if n not in placed]
    return front[:_BACKLOG_N] + middle + front[_BACKLOG_N:] + tail


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CATALOG["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return {name: CATALOG[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {
        name: CATALOG[name].sql
        for name in _ordered_names()
        if CATALOG[name].sql is not None
    }
