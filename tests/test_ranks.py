"""Differential tests for the scalable global ranking operators vs the
single-partition window reference (which they exist to replace)."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_global_row_number_matches_window(spark):
    from unicargo_medallion_data_pipeline_spark.operators.ranks import global_row_number

    rng = random.Random(5)
    rows = [(i, rng.randrange(10**6)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id int, v long").repartition(13)
    got = {r["id"]: r["row_num"] for r in global_row_number(df, ["v", "id"]).collect()}
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["rn"] for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_ntile_matches_window(spark):
    from unicargo_medallion_data_pipeline_spark.operators.ranks import global_ntile

    rng = random.Random(6)
    # total NOT divisible by n: exercises the ceil/floor tile boundary
    rows = [(i, rng.randrange(10**6)) for i in range(4999)]
    df = spark.createDataFrame(rows, "id int, v long").repartition(7)
    w = Window.orderBy("v", "id")
    for n in (3, 4, 10):
        got = {r["id"]: r["tile"] for r in global_ntile(df, n, ["v", "id"]).collect()}
        want = {
            r["id"]: r["t"] for r in df.withColumn("t", F.ntile(n).over(w)).collect()
        }
        assert got == want, f"ntile({n})"


def test_global_row_number_plans_no_window(spark):
    """The whole point: no Window node (hence no single-partition
    WindowExec) anywhere in the plan — ranks come from the range
    exchange + narrow arithmetic.  The range exchange itself runs inside
    the eager localCheckpoint (which pins the partitioning and truncates
    lineage), so the returned frame's plan shows the checkpointed scan,
    not the exchange; the exchange is asserted on the pre-checkpoint
    stage."""
    import contextlib
    import io

    from unicargo_medallion_data_pipeline_spark.operators.ranks import global_row_number

    df = spark.range(1000).withColumn("v", F.col("id") * 7 % 997)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        global_row_number(df, ["v", "id"]).explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan
    assert "ExistingRDD" in plan or "Scan" in plan  # the checkpointed stage

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.repartitionByRange(8, "v", "id").sortWithinPartitions("v", "id").explain(
            "formatted"
        )
    pre = buf.getvalue()
    assert "rangepartitioning" in pre.lower()
    assert "Window" not in pre
