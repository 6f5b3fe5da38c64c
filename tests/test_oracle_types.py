"""Catalog-wide oracle type hygiene (round-5 post-mortem, VERDICT task 2).

The driver's value-hash is representation-sensitive: a DuckDB HUGEINT
(int128) column hash-mismatches a Spark bigint even when every value is
equal — exactly what turned 5 locally-green queries red in
CORRECTNESS_r05.json.  This test binds every oracle's SQL in DuckDB
(plan-only, no data execution) and fails if any output column lands in a
type class no Spark result can match (HUGEINT/UHUGEINT/UBIGINT, DECIMAL).

Had it existed in round 5 it would have flagged all 5 failures — and the
6 latent siblings — before the driver did.
"""

from __future__ import annotations

import pytest

from unicargo_medallion_data_pipeline_spark.oracle import (
    duck_type_class,
    duckdb_connection,
    oracle_type_defects,
)
from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG

SF = "/root/testdata/sf0.001"

_SQL_QUERIES = sorted(n for n, q in CATALOG.items() if q.sql is not None)


@pytest.fixture(scope="module")
def con():
    return duckdb_connection(SF)


def test_every_sql_oracle_binds_and_is_hash_safe(con):
    """One con.sql() per oracle: must bind, and must not emit an
    int128/decimal output column."""
    defects: dict[str, list] = {}
    errors: dict[str, str] = {}
    for name in _SQL_QUERIES:
        try:
            bad = oracle_type_defects(con, CATALOG[name].sql)
        except Exception as e:  # noqa: BLE001
            errors[name] = str(e)[:200]
            continue
        if bad:
            defects[name] = bad
    assert not errors, f"oracles failed to bind: {errors}"
    assert not defects, (
        "oracles emit driver-unhashable type classes (wrap the aggregate in "
        f"CAST(... AS BIGINT) / CAST(... AS DOUBLE)): {defects}"
    )


def test_lattice_classifies_the_round5_failure_mode():
    """Regression pin: uncast SUM over integers is HUGEINT in DuckDB and
    must classify as unsafe; the BIGINT-cast form must classify safe."""
    assert duck_type_class("HUGEINT") == "int128"
    assert duck_type_class("UBIGINT") == "int128"
    assert duck_type_class("DECIMAL(38,2)") == "decimal"
    assert duck_type_class("BIGINT") == "int"
    assert duck_type_class("INTEGER") == "int"
    assert duck_type_class("DOUBLE") == "float"


def test_lattice_duckdb_agrees_with_live_types(con):
    """duck_type_class must key off real DuckDB type spellings."""
    rel = con.sql("SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x)")
    assert duck_type_class(rel.types[0]) == "int128"
    rel = con.sql("SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)")
    assert duck_type_class(rel.types[0]) == "int"
    rel = con.sql("SELECT COUNT(*) AS c FROM (VALUES (1)) t(x)")
    assert duck_type_class(rel.types[0]) == "int"
    rel = con.sql("SELECT AVG(x) AS a FROM (VALUES (1)) t(x)")
    assert duck_type_class(rel.types[0]) == "float"


def test_compare_query_catches_each_failure_class(spark, con):
    """The local replica must fail on value drift, row-count drift,
    column drift, AND type-class drift (the r5 blind spot) — a harness
    that can't fail is not a gate."""
    from pyspark.sql import functions as F

    from unicargo_medallion_data_pipeline_spark.oracle import compare_query

    base_sql = "SELECT 1 AS a, CAST(2 AS BIGINT) AS b"

    def fn_ok(spark, sf):
        return spark.range(1).select(
            F.lit(1).alias("a"), F.lit(2).cast("bigint").alias("b")
        )

    assert compare_query(spark, con, "ok", fn_ok, base_sql, "x").ok

    def fn_wrong_value(spark, sf):
        return spark.range(1).select(
            F.lit(1).alias("a"), F.lit(3).cast("bigint").alias("b")
        )

    r = compare_query(spark, con, "wv", fn_wrong_value, base_sql, "x")
    assert not r.ok and "mismatch" in r.detail

    def fn_extra_row(spark, sf):
        return spark.range(2).select(
            F.lit(1).alias("a"), F.lit(2).cast("bigint").alias("b")
        )

    r = compare_query(spark, con, "er", fn_extra_row, base_sql, "x")
    assert not r.ok and "row counts differ" in r.detail

    def fn_wrong_col(spark, sf):
        return spark.range(1).select(
            F.lit(1).alias("a"), F.lit(2).cast("bigint").alias("c")
        )

    r = compare_query(spark, con, "wc", fn_wrong_col, base_sql, "x")
    assert not r.ok and "columns differ" in r.detail

    # the r5 blind spot: equal VALUES, unhashable representation
    hugeint_sql = "SELECT 1 AS a, SUM(x) AS b FROM (VALUES (2)) t(x)"
    r = compare_query(spark, con, "tc", fn_ok, hugeint_sql, "x")
    assert not r.ok and "type class mismatch" in r.detail
    assert "int128" in r.detail
