"""Size guards on the exact all-pairs anchors: small inputs pass
through byte-identically, oversized inputs raise naming the scalable
twin instead of planning a quadratic cross join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_guard_passthrough_is_identity(spark):
    from unicargo_medallion_data_pipeline_spark.operators.guards import guard_all_pairs

    df = spark.range(100)
    out = guard_all_pairs(df, "op", "twin", max_rows=100)
    assert out is df  # same plan object — zero behavior change


def test_guard_raises_with_twin_pointer(spark):
    from unicargo_medallion_data_pipeline_spark.operators.guards import guard_all_pairs

    with pytest.raises(ValueError, match=r"O\(n\^2\).*use its\s+scalable twin.*the_twin"):
        guard_all_pairs(spark.range(101), "op", "the_twin", max_rows=100)


def test_knn_exact_query_side_guarded(spark):
    from unicargo_medallion_data_pipeline_spark.operators import guards
    from unicargo_medallion_data_pipeline_spark.textops.similarity import (
        cosine_topk_exact,
    )

    big = spark.range(guards.ALL_PAIRS_GUARD_ROWS + 1).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="cosine_topk_exact"):
        cosine_topk_exact(big, big, k=2)


def test_all_pairs_catalog_queries_still_green_at_oracle_scale(spark):
    """The guards must not change results at driver-oracle scale."""
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    sf = "/root/testdata/sf0.001"
    for name in ("doc_token_jaccard_pairs", "embedding_near_dup_pairs"):
        assert CATALOG[name].fn(spark, sf).count() >= 0
