"""Round-5 analytics batch: edge semantics the SF corpora don't pin —
binned-quantile accuracy/mergeability, top-k tie handling, cross-doc
n-gram sharing on planted duplicates."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def catalog():
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

    return CATALOG


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------- binned quantiles


def test_binned_quantiles_within_bin_of_exact(spark, catalog):
    """The histogram estimate is never more than one bin width (0.25)
    below the exact percentile_disc value."""
    est = {
        r["event_type"]: r
        for r in catalog["events_value_binned_quantiles"].fn(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").alias("p90"),
        )
        .collect()
    }
    for et, e in est.items():
        for q in ("p50", "p90"):
            lo = e[f"{q}_est"]
            hi = exact[et][q]
            assert lo <= hi <= lo + 0.25, (et, q, lo, hi)


def test_binned_quantiles_summary_is_mergeable(spark):
    """Bin histograms merge associatively: aggregating two disjoint
    halves' bin counts gives the same quantile as one pass — the
    property that lets the summary tree-reduce at 100 TB."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_type", "value")
    half1 = ev.filter(F.col("value") < 50)
    half2 = ev.filter(F.col("value") >= 50)

    def bins(df):
        return (
            df.select(
                "event_type",
                F.expr("CAST(round(value*100) AS BIGINT) DIV 25").alias("bin"),
            )
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    merged = (
        bins(half1)
        .unionByName(bins(half2))
        .groupBy("event_type", "bin")
        .agg(F.sum("c").alias("c"))
    )
    whole = bins(ev)
    assert (
        merged.exceptAll(whole).count() == 0
        and whole.exceptAll(merged).count() == 0
    )


# ------------------------------------------------- windowed top-k ties


def test_window_top_types_keeps_ties(spark, catalog):
    fn = catalog["events_window_top_types"].fn
    out = fn(spark, SF)
    # Within each window every returned count equals the window max.
    ev = spark.read.parquet(f"{SF}/events.parquet")
    bucket = (F.floor(F.unix_timestamp("ts") / 300) * 300).cast("timestamp")
    counts = ev.groupBy(bucket.alias("window_start"), "event_type").count()
    mx = counts.groupBy("window_start").agg(F.max("count").alias("mx"))
    joined = out.join(mx, "window_start")
    assert joined.filter(F.col("n_events") != F.col("mx")).count() == 0
    # And every window with a tie returns ALL tied types.
    tied = (
        counts.join(mx, "window_start")
        .filter(F.col("count") == F.col("mx"))
        .groupBy("window_start")
        .count()
        .withColumnRenamed("count", "n_tied")
    )
    got = out.groupBy("window_start").count().withColumnRenamed("count", "n_got")
    assert tied.join(got, "window_start").filter(
        F.col("n_tied") != F.col("n_got")
    ).count() == 0


# ------------------------------------------------- cross-doc dup n-grams


def test_duplicate_ngram_rate_on_planted_dups(spark):
    from unicargo_medallion_data_pipeline_spark.plans.analytics_gold3 import (
        doc_duplicate_ngram_rate,
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="ngram_t_")
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "en", "s", 10),
            (2, "alpha beta gamma delta epsilon eta", "en", "s", 10),  # shares one 5-gram
            (3, "one two three four five six seven", "en", "s", 10),  # unique
            (4, "tiny doc", "en", "s", 8),  # < 5 tokens → absent
        ],
        "doc_id bigint, text string, lang string, source string, n_chars int",
    )
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in doc_duplicate_ngram_rate(spark, d).collect()}
    assert set(out) == {1, 2, 3}
    # docs 1,2: 2 five-grams each, exactly one shared ("alpha..epsilon")
    assert out[1]["n_ngrams"] == 2 and out[1]["n_shared_instances"] == 1
    assert out[2]["n_ngrams"] == 2 and out[2]["n_shared_instances"] == 1
    assert out[1]["shared_ngram_rate"] == 0.5
    # doc 3: nothing shared
    assert out[3]["n_shared_instances"] == 0 and out[3]["shared_ngram_rate"] == 0.0


def test_duplicate_ngram_plan_has_no_cartesian(spark, catalog):
    plan = plan_of(catalog["doc_duplicate_ngram_rate"].fn(spark, SF))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# ------------------------------------------------- sliding-window mirror


def test_sliding_mirror_equals_builtin_window(spark, catalog):
    """The explicit two-bucket explode must produce exactly the
    multiplicity and counts of F.window(width=10min, slide=5min)."""
    mirror = catalog["events_sliding_10min_counts"].fn(spark, SF).select(
        "window_start", "event_type", "n_events"
    )
    ev = spark.read.parquet(f"{SF}/events.parquet")
    builtin = (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("win"), "event_type"
        )
        .count()
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            F.col("count").alias("n_events"),
        )
    )
    assert mirror.exceptAll(builtin).count() == 0
    assert builtin.exceptAll(mirror).count() == 0
