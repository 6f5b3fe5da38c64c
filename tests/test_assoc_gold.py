"""Tests for the association/sampling batch: basket co-occurrence,
negative-pair sampling, mergeable HLL rollup."""

from __future__ import annotations

import contextlib
import io

import pytest

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


def test_cooccurrence_is_equi_self_join_topk(spark, catalog):
    df = catalog["part_pair_cooccurrence"].fn(spark, SF)
    plan = plan_of(df)
    # Pairs come map-side from the pinned basket arrays: the final plan
    # reads the checkpoint, never re-scans the fact, and has no join-
    # based pair enumeration.
    assert "CartesianProduct" not in plan
    assert "Scan parquet" not in plan, "fact re-scanned past the checkpoint"
    assert "Generate" in plan  # the array pair explode
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert 0 < len(rows) <= 20
    assert all(r["p1"] < r["p2"] for r in rows)
    assert all(r["lift"] > 0 for r in rows)
    # Sorted by support descending.
    supports = [r["n_together"] for r in rows]
    assert supports == sorted(supports, reverse=True)


def test_negative_pairs_never_self_and_deterministic(spark, catalog):
    df = catalog["doc_negative_pairs"].fn(spark, SF)
    plan = plan_of(df)
    assert "Window" not in plan, "dense index must come from the rank operator"
    rows = df.collect()
    n_docs = len({r["doc_id"] for r in rows})
    assert len(rows) == 3 * n_docs  # k=3 per document
    assert all(r["neg_doc_id"] != r["doc_id"] for r in rows)
    # Deterministic across reruns (pure integer arithmetic, no rand()).
    again = {(r["doc_id"], r["neg_rank"]): r["neg_doc_id"] for r in df.collect()}
    first = {(r["doc_id"], r["neg_rank"]): r["neg_doc_id"] for r in rows}
    assert first == again


def test_hll_rollup_invariants_hold(spark, catalog):
    row = catalog["events_mergeable_hll_rollup"].fn(spark, SF).collect()[0]
    assert row["merge_matches_direct"] is True
    assert row["estimate_within_5pct"] is True
    assert row["exact_users"] > 0 and row["n_days"] > 0


def test_covariance_pairs_bounded_by_dims_not_rows(spark, catalog):
    """The pair aggregate's group count is d²/2 regardless of row count,
    pairs are upper-triangle only, and the final plan reads the
    checkpoint (single embedding scan)."""
    df = catalog["embedding_dim_covariance"].fn(spark, SF)
    plan = plan_of(df)
    assert "Scan parquet" not in plan, "embeddings re-scanned past the checkpoint"
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert len(rows) == 20
    assert all(1 <= r["dim_i"] < r["dim_j"] <= 64 for r in rows)
    covs = [abs(r["cov"]) for r in rows]
    assert covs == sorted(covs, reverse=True)


def test_spatial_join_is_equi_not_cross(spark, catalog):
    """Candidate generation must be the grid equi-join (9× replication),
    never a cross product; pairs are unique and within the radius."""
    df = catalog["airport_neighbor_pairs"].fn(spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["a_code"] < r["b_code"] for r in rows)
    assert all(0 <= r["dist_sq"] <= 4.0 for r in rows)
    assert len({(r["a_code"], r["b_code"]) for r in rows}) == len(rows)
