"""Tests for plans/docs_gold4.py: inverted index, incremental dedup,
train/val/test split, weighted sampling — DuckDB differential at smoke
scale plus the semantic invariants the oracle can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

QUERIES = [
    "doc_inverted_index",
    "doc_incremental_dedup",
    "doc_train_val_test_split",
    "doc_weighted_sample",
]


@pytest.mark.parametrize("name", QUERIES)
def test_matches_duckdb_oracle_at_smoke_sf(spark, name):
    from unicargo_medallion_data_pipeline_spark import oracle
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    con = oracle.duckdb_connection(SF_SMOKE)
    q = CATALOG[name]
    res = oracle.compare_query(spark, con, name, q.fn, q.sql, SF_SMOKE)
    assert res.ok, res.detail


def test_inverted_index_postings_sorted_capped_and_floored(spark):
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    rows = CATALOG["doc_inverted_index"].fn(spark, SF_SMOKE).collect()
    assert rows, "corpus has common terms, index must be non-empty"
    for r in rows:
        assert r["doc_freq"] >= 10
        postings = [int(x) for x in r["postings"].split(",")]
        assert 1 <= len(postings) <= 10
        assert postings == sorted(postings)
        # the cap keeps the head of the FULL sorted posting set
        assert len(postings) == min(r["doc_freq"], 10)


def test_incremental_dedup_survivors_are_novel_and_unique(spark):
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
    from unicargo_medallion_data_pipeline_spark.textops import analysis as ta

    out = CATALOG["doc_incremental_dedup"].fn(spark, SF_SMOKE)
    rows = out.collect()
    assert rows
    # unique per fingerprint, and every survivor is from the new batch
    fps = [r["fp"] for r in rows]
    assert len(fps) == len(set(fps))
    assert all(r["doc_id"] % 5 == 4 for r in rows)
    # no survivor fingerprint exists in the historical slice
    hist = {
        r["fp"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("doc_id") % 5 != 4)
        .select(ta.fingerprint("text").alias("fp"))
        .distinct()
        .collect()
    }
    assert not (set(fps) & hist)


def test_split_assignment_covers_corpus_and_is_mostly_train(spark):
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

    out = CATALOG["doc_train_val_test_split"].fn(spark, SF_SMOKE).collect()
    total = sum(r["n_docs"] for r in out)
    corpus = load_table(spark, SF_SMOKE, "documents").count()
    assert total == corpus  # partition of the corpus, nothing dropped
    by_split = {}
    for r in out:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    # 90/5/5 in expectation; generous band for a small corpus
    assert by_split.get("train", 0) / total > 0.75


def test_weighted_sample_is_length_biased(spark):
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

    sample = CATALOG["doc_weighted_sample"].fn(spark, SF_SMOKE).collect()
    assert len(sample) == 50
    sample_avg = sum(r["n_chars"] for r in sample) / len(sample)
    corpus_avg = (
        load_table(spark, SF_SMOKE, "documents")
        .agg(F.avg("n_chars").alias("a"))
        .collect()[0]["a"]
    )
    # probability ∝ n_chars ⇒ the sample must skew long
    assert sample_avg > corpus_avg
