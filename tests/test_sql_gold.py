"""SQL-surface depth (plans/sql_gold.py): recursive-CTE traversal
semantics and LATERAL decorrelation — plan shapes and multi-hop
correctness on a hand-built graph."""

from __future__ import annotations

import contextlib
import io

import pytest

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


def test_recursive_cte_min_hops_on_chain(spark):
    """A 4-node chain with a shortcut: min-hops must prefer the direct
    edge, and the cycle back to the start must not loop forever."""
    spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (4, 1)], "src int, dst int"
    ).createOrReplaceTempView("chain_edges")
    out = spark.sql(
        """
        WITH RECURSIVE reach AS (
          SELECT src, dst, 1 AS hops FROM chain_edges
          UNION ALL
          SELECT r.src, e.dst, r.hops + 1
          FROM reach r JOIN chain_edges e ON r.dst = e.src
          WHERE r.hops < 6
        )
        SELECT src, dst, MIN(hops) AS min_hops
        FROM reach WHERE src <> dst GROUP BY src, dst
        """
    )
    hops = {(r["src"], r["dst"]): r["min_hops"] for r in out.collect()}
    assert hops[(1, 4)] == 1  # shortcut wins over the 3-hop chain
    assert hops[(1, 3)] == 2
    assert hops[(2, 1)] == 3  # 2→3→4→1 through the cycle edge
    assert hops[(4, 2)] == 2  # 4→1→2


def test_reach_query_is_multi_hop(spark, catalog):
    """The sparsified trade graph must actually require >1 hop for some
    pairs — otherwise the recursion degenerates to the edge list."""
    out = catalog["nation_reach_recursive"].fn(spark, SF)
    rows = out.collect()
    assert any(r["min_hops"] >= 2 for r in rows)
    # out-degree cap: every source has ≤ 2 one-hop destinations
    from collections import Counter

    one_hop = Counter(r["src_nation"] for r in rows if r["min_hops"] == 1)
    assert max(one_hop.values()) <= 2


def test_lateral_decorrelates_to_window(spark, catalog):
    """Spark must rewrite the correlated LATERAL LIMIT into a ranked
    window join — no nested-loop execution per outer row."""
    plan = plan_of(catalog["nation_top_customers_lateral"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "Window" in plan or "WindowGroupLimit" in plan


def test_lateral_matches_window_spelling(spark, catalog):
    """The LATERAL result equals the explicit row_number formulation."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    lat = catalog["nation_top_customers_lateral"].fn(spark, SF)
    n = spark.read.parquet(f"{SF}/nation.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    ref = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), "c_name", "c_acctbal")
    )
    assert lat.exceptAll(ref).count() == 0 and ref.exceptAll(lat).count() == 0
