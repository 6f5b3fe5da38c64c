"""SQL front-door API coverage beyond plain text: parameterized
spark.sql (named + positional) and the IDENTIFIER clause.

Parameterized SQL is the injection-safe way to template the catalog's
SQL entry points (sql_frontdoor_revenue shows plain text; production
callers should bind values, not f-string them)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _orders_view(spark, name="sqlapi_orders"):
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table

    load_table(spark, SF_SMOKE, "orders").createOrReplaceTempView(name)
    return name


def test_named_parameter_binding(spark):
    view = _orders_view(spark)
    got = spark.sql(
        f"SELECT COUNT(*) AS n FROM {view} WHERE o_orderpriority = :prio",
        args={"prio": "1-URGENT"},
    ).collect()[0]["n"]
    want = spark.sql(
        f"SELECT COUNT(*) AS n FROM {view} WHERE o_orderpriority = '1-URGENT'"
    ).collect()[0]["n"]
    assert got == want > 0


def test_positional_parameter_binding(spark):
    view = _orders_view(spark)
    got = spark.sql(
        f"SELECT COUNT(*) AS n FROM {view} WHERE o_totalprice BETWEEN ? AND ?",
        args=[1000.0, 50000.0],
    ).collect()[0]["n"]
    want = spark.sql(
        f"SELECT COUNT(*) AS n FROM {view} "
        "WHERE o_totalprice BETWEEN 1000.0 AND 50000.0"
    ).collect()[0]["n"]
    assert got == want > 0


def test_identifier_clause_binds_table_names_safely(spark):
    """IDENTIFIER(:tbl) templates the RELATION, not just values — the
    safe form of the reference's f-string table interpolation."""
    view = _orders_view(spark)
    got = spark.sql(
        "SELECT COUNT(*) AS n FROM IDENTIFIER(:tbl)", args={"tbl": view}
    ).collect()[0]["n"]
    assert got == spark.table(view).count()
