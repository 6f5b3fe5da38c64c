"""Tests for plans/events_gold.py: funnel, retention, transition matrix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

QUERIES = [
    "events_funnel_conversion",
    "user_weekly_retention",
    "event_transition_matrix",
]


@pytest.mark.parametrize("name", QUERIES)
def test_matches_duckdb_oracle_at_smoke_sf(spark, name):
    from unicargo_medallion_data_pipeline_spark import oracle
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    con = oracle.duckdb_connection(SF_SMOKE)
    q = CATALOG[name]
    res = oracle.compare_query(spark, con, name, q.fn, q.sql, SF_SMOKE)
    assert res.ok, res.detail


def test_funnel_is_monotone_and_strictly_ordered(spark):
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

    row = CATALOG["events_funnel_conversion"].fn(spark, SF_SMOKE).collect()[0]
    assert row["n_viewed"] >= row["n_clicked_after_view"] >= row["n_purchased_after_click"]
    # the ordered funnel must be at most the unordered "has both types"
    ev = load_table(spark, SF_SMOKE, "events")
    unordered = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
        )
        .filter("v = 1 AND c = 1")
        .count()
    )
    assert row["n_clicked_after_view"] <= unordered


def test_retention_has_multiple_cohorts_and_offset_zero_rows(spark):
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    rows = CATALOG["user_weekly_retention"].fn(spark, SF_SMOKE).collect()
    cohorts = {r["cohort_week"] for r in rows}
    assert len(cohorts) >= 2, "thinning must spread users over multiple cohorts"
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["n_users"]
    for cohort, offs in by_cohort.items():
        # every user is active in their own first week by construction
        assert 0 in offs, f"cohort {cohort} missing offset-0 row"
        assert all(off >= 0 for off in offs)
        # retention can never exceed the cohort's own size
        assert all(n <= offs[0] for n in offs.values())


def test_transition_matrix_conserves_events(spark):
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

    rows = CATALOG["event_transition_matrix"].fn(spark, SF_SMOKE).collect()
    total_transitions = sum(r["n_transitions"] for r in rows)
    ev = load_table(spark, SF_SMOKE, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # per user: transitions = events - 1
    assert total_transitions == n_events - n_users


def test_forward_fill_matches_oracle_and_semantics(spark):
    from unicargo_medallion_data_pipeline_spark import oracle
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    con = oracle.duckdb_connection(SF_SMOKE)
    q = CATALOG["events_value_forward_fill"]
    res = oracle.compare_query(spark, con, "events_value_forward_fill", q.fn, q.sql, SF_SMOKE)
    assert res.ok, res.detail
    # semantics on a hand-built sequence: leading nulls stay null,
    # interior nulls take the latest prior value
    from unicargo_medallion_data_pipeline_spark.plans.events_gold import (  # noqa: F401
        events_value_forward_fill,
    )
    import datetime as dt

    rows = [
        (1, 9, dt.datetime(2024, 1, 1, 0, 0, 0), "error", 99.0),
        (2, 9, dt.datetime(2024, 1, 1, 0, 0, 1), "view", 1.0),
        (3, 9, dt.datetime(2024, 1, 1, 0, 0, 2), "error", 99.0),
        (4, 9, dt.datetime(2024, 1, 1, 0, 0, 2), "view", 2.0),  # ts tie: id order
    ]
    import tempfile

    d = tempfile.mkdtemp(prefix="locf_")
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    ).withColumn("props", F.lit("{}")).write.mode("overwrite").parquet(d + "/events.parquet")
    got = {
        r["event_id"]: r["filled_value"]
        for r in CATALOG["events_value_forward_fill"].fn(spark, d).collect()
    }
    assert got == {1: None, 2: 1.0, 3: 1.0, 4: 2.0}


def test_nullsafe_join_keeps_the_null_bucket(spark):
    from unicargo_medallion_data_pipeline_spark import oracle
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    con = oracle.duckdb_connection(SF_SMOKE)
    q = CATALOG["event_halves_nullsafe_join"]
    res = oracle.compare_query(
        spark, con, "event_halves_nullsafe_join", q.fn, q.sql, SF_SMOKE
    )
    assert res.ok, res.detail
    rows = q.fn(spark, SF_SMOKE).collect()
    keys = {r["event_key"] for r in rows}
    assert None in keys, "the NULL bucket must survive the join"
    # a plain equi-join would drop exactly the NULL row
    assert len(keys) == 5


def test_top_event_paths_shape_and_sessions(spark):
    """Paths are >-joined event types, counts are positive and sorted,
    and multi-event paths exist (the sessionizer actually groups)."""
    import contextlib
    import io

    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    df = CATALOG["top_event_paths"].fn(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert 0 < len(rows) <= 15
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["total_events"] >= r["n_sessions"] for r in rows)
    assert any(">" in r["path"] for r in rows), "no multi-event sessions found"
