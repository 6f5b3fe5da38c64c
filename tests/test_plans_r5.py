"""Physical-plan pins for the round-5 queries (measured shapes from
docs/PLANS.md's round-5 census — regressions here mean a scale
property silently changed)."""

from __future__ import annotations

import pytest

from unicargo_medallion_data_pipeline_spark.plans.inspect import plan_census, plan_text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def catalog():
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    return CATALOG


def test_binned_quantiles_shuffles_summaries_not_rows(spark, catalog):
    c = plan_census(catalog["events_value_binned_quantiles"].fn(spark, SF))
    # (type,bin) agg → bin-spine windows → final agg + output sort; the
    # event-grain scan feeds ONE partial aggregate, everything after
    # moves ≤400-row summaries.
    assert c["scans"] == 1 and c["cartesian_products"] == 0
    assert c["keyed_exchanges"] <= 3


def test_window_topk_uses_group_limit(spark, catalog):
    p = plan_text(catalog["events_window_top_types"].fn(spark, SF))
    assert "WindowGroupLimit" in p, "rk=1 filter must push into the window"


def test_ngram_join_carries_hashed_keys(spark, catalog):
    c = plan_census(catalog["doc_duplicate_ngram_rate"].fn(spark, SF))
    assert c["cartesian_products"] == 0
    assert c["broadcast_nested_loop_joins"] == 0
    assert c["keyed_exchanges"] <= 4


def test_lateral_decorrelation_census(spark, catalog):
    c = plan_census(catalog["nation_top_customers_lateral"].fn(spark, SF))
    assert c["cartesian_products"] == 0 and c["window_execs"] >= 1


def test_window_corners_single_customer_exchange(spark, catalog):
    c = plan_census(catalog["customer_order_window_corners"].fn(spark, SF))
    # both window specs share one customer-key exchange
    assert c["keyed_exchanges"] == 1 and c["scans"] == 1
