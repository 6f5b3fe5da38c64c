"""Python UDTF surface: the LATERAL sentence splitter must agree with
its pure-expression twin row-for-row."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _expression_twin(spark):
    """posexplode of the same normalized ". "-split, empties dropped."""
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
    from unicargo_medallion_data_pipeline_spark.textops.analysis import norm_text

    d = load_table(spark, SF_SMOKE, "documents").limit(100)
    frags = F.filter(F.split(norm_text("text"), r"\. "), lambda x: x != "")
    return d.select(
        "doc_id", F.posexplode(frags).alias("sentence_idx", "sentence")
    )


def test_udtf_matches_expression_twin(spark):
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
    from unicargo_medallion_data_pipeline_spark.textops.udtf import register_sentence_splitter

    register_sentence_splitter(spark)
    load_table(spark, SF_SMOKE, "documents").limit(100).createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence
        FROM udtf_docs d, LATERAL split_sentences(d.text) s
        """
    )
    a = {tuple(r) for r in via_udtf.collect()}
    b = {tuple(r) for r in _expression_twin(spark).collect()}
    assert a and a == b


def test_udtf_null_text_yields_no_rows(spark):
    from unicargo_medallion_data_pipeline_spark.textops.udtf import register_sentence_splitter

    register_sentence_splitter(spark)
    spark.createDataFrame(
        [(1, None), (2, "one. two. ")], "doc_id int, text string"
    ).createOrReplaceTempView("udtf_null_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence
        FROM udtf_null_docs d, LATERAL split_sentences(d.text) s
        """
    ).collect()
    assert {(r["doc_id"], r["sentence_idx"], r["sentence"]) for r in rows} == {
        (2, 0, "one"),
        (2, 1, "two."),
    }
