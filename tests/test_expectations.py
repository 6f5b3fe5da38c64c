"""Expectation suites (quality/expectations.py): rule semantics on
seeded violations, job budget, and the fail-fast gate."""

from __future__ import annotations

import pytest

from unicargo_medallion_data_pipeline_spark.quality.expectations import (
    accepted_values,
    foreign_key,
    in_range,
    not_null,
    run_suite,
    unique,
)
from unicargo_medallion_data_pipeline_spark.quality.validation import DataQualityError


@pytest.fixture(scope="module")
def dirty(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "O", 100),
            (1, 20.0, "F", 200),      # duplicate key 1
            (2, -5.0, "P", 100),      # below range
            (3, 9999.0, "X", None),   # bad status, null fk (not an FK violation)
            (None, 50.0, None, 999),  # null key group; fk 999 is orphan
            (None, 60.0, "O", 100),   # second null key → duplicate NULL group
        ],
        "k int, v double, status string, fk int",
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([(100,), (200,)], "id int")


def test_rule_semantics(spark, dirty, dim):
    suite = [
        not_null("k"),
        unique("k"),
        in_range("v", 0, 1000),
        accepted_values("status", "O", "F", "P"),
        foreign_key("fk", dim, "id"),
    ]
    rep = {r["rule"]: r for r in run_suite(dirty, suite).collect()}
    assert rep["not_null"]["violations"] == 2
    # duplicates beyond first per key: key 1 has 2 rows (+1), NULL group
    # has 2 rows (+1)
    assert rep["unique"]["violations"] == 2
    # -5 and 9999 out of [0, 1000]
    assert rep["in_range"]["violations"] == 2
    # 'X' bad; NULL status does not violate accepted_values
    assert rep["accepted_values"]["violations"] == 1
    # fk 999 orphan; NULL fk does not violate
    assert rep["foreign_key"]["violations"] == 1
    assert not any(r["passed"] for r in rep.values())


def test_clean_table_passes(spark, dim):
    clean = spark.createDataFrame(
        [(1, 5.0, "O", 100), (2, 7.0, "F", 200)],
        "k int, v double, status string, fk int",
    )
    suite = [
        not_null("k"),
        unique("k"),
        in_range("v", 0, 10),
        accepted_values("status", "O", "F"),
        foreign_key("fk", dim, "id"),
    ]
    rep = run_suite(clean, suite, fail_fast=True)  # must not raise
    assert all(r["passed"] for r in rep.collect())


def test_fail_fast_names_every_failure(spark, dirty, dim):
    suite = [not_null("k"), in_range("v", 0, 1000)]
    with pytest.raises(DataQualityError) as ei:
        run_suite(dirty, suite, fail_fast=True)
    msg = str(ei.value)
    assert "not_null(k)=2" in msg and "in_range(v)=2" in msg


def test_scalar_rules_share_one_job(spark, dirty):
    """All scalar rules compile into a single aggregate — verified by
    plan: one Aggregate over one scan, no unions."""
    import contextlib
    import io

    df = dirty.agg(
        *[
            __import__(
                "unicargo_medallion_data_pipeline_spark.quality.expectations",
                fromlist=["_scalar_expr"],
            )._scalar_expr(e).alias(f"r{i}")
            for i, e in enumerate(
                [not_null("k"), in_range("v", 0, 1000), accepted_values("status", "O")]
            )
        ]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    import re

    nodes = re.findall(r"^\(\d+\) (\w+)", plan, flags=re.M)
    assert sum(1 for n in nodes if "Scan" in n) == 1, nodes
    assert not any("Union" in n for n in nodes), nodes


def test_duplicate_and_equal_comparing_rules_each_get_a_slot(spark, dirty, dim):
    """r5 ADVICE regression: Expect is frozen/eq with dim excluded from
    comparison, so a duplicated rule — or two foreign_key rules on the
    same column against DIFFERENT dims — compare equal.  Positional
    keying must still evaluate and report both."""
    other_dim = spark.createDataFrame([(999,), (100,)], "id int")
    suite = [
        not_null("k"),
        not_null("k"),                    # literal duplicate
        foreign_key("fk", dim, "id"),     # 999 is an orphan here
        foreign_key("fk", other_dim, "id"),  # 200 is an orphan here
    ]
    rep = run_suite(dirty, suite).collect()
    assert len(rep) == 4
    assert [r["violations"] for r in rep[:2]] == [2, 2]
    # the two FK rules must be evaluated against their OWN dims
    assert rep[2]["violations"] == 1   # fk=999 missing from dim
    assert rep[3]["violations"] == 1   # fk=200 missing from other_dim


def test_null_profile_survives_reserved_alias_collision(spark):
    """Round-10 quality hunt: a user column literally named '__rows'
    used to shadow the internal count alias in the by-name row lookup,
    reading back the table's ROW COUNT as its null count.  Positional
    access is exact for any column names."""
    from unicargo_medallion_data_pipeline_spark.quality.validation import null_profile

    df = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "k int, __rows string"
    )
    p = null_profile(df)
    assert p["row_count"] == 3
    assert p["null_counts"] == {"k": 0, "__rows": 2}
