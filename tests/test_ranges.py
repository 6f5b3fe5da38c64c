"""Binned interval join: containment, exclusion, exactly-once matching
across bin boundaries, collision guard."""

from __future__ import annotations

import pytest


def test_interval_join_semantics(spark):
    from unicargo_medallion_data_pipeline_spark.operators.ranges import interval_join_binned

    points = spark.createDataFrame(
        [(1, 5, "p1"), (1, 10, "p2"), (1, 99, "p3"), (2, 5, "p4")],
        "k int, t long, pid string",
    )
    # Interval spans many bins (0..95 with bin_width=10) to prove a point
    # inside still matches exactly once.
    intervals = spark.createDataFrame(
        [(1, 0, 95, "iv1"), (1, 200, 210, "iv2"), (3, 0, 100, "iv3")],
        "k int, s long, e long, ivid string",
    )
    got = interval_join_binned(
        points, intervals, on=["k"], ts_col="t", start_col="s", end_col="e", bin_width=10
    ).collect()
    matches = sorted((r["pid"], r["ivid"]) for r in got)
    # p1, p2 inside iv1 exactly once each; p3=99 outside (end=95); p4's key
    # has no interval; iv3's key has no points.
    assert matches == [("p1", "iv1"), ("p2", "iv1")]


def test_interval_join_boundary_inclusive(spark):
    from unicargo_medallion_data_pipeline_spark.operators.ranges import interval_join_binned

    points = spark.createDataFrame([(1, 10, "lo"), (1, 20, "hi")], "k int, t long, pid string")
    intervals = spark.createDataFrame([(1, 10, 20, "iv")], "k int, s long, e long, ivid string")
    got = interval_join_binned(points, intervals, ["k"], "t", "s", "e", bin_width=7).collect()
    assert sorted(r["pid"] for r in got) == ["hi", "lo"]


def test_interval_join_rejects_collisions(spark):
    from unicargo_medallion_data_pipeline_spark.operators.ranges import interval_join_binned

    points = spark.createDataFrame([(1, 5, "x")], "k int, t long, name string")
    intervals = spark.createDataFrame([(1, 0, 9, "y")], "k int, s long, e long, name string")
    with pytest.raises(ValueError, match="collision"):
        interval_join_binned(points, intervals, ["k"], "t", "s", "e", bin_width=10)


def test_interval_join_randomized_against_reference(spark):
    """Differential test: random points/intervals vs a brute-force
    reference; every containment must surface exactly once."""
    import random

    from unicargo_medallion_data_pipeline_spark.operators.ranges import interval_join_binned

    rng = random.Random(7)
    points = [(rng.randrange(5), rng.randrange(200), i) for i in range(250)]
    intervals = []
    for j in range(60):
        k, s = rng.randrange(5), rng.randrange(190)
        intervals.append((k, s, s + rng.randrange(1, 40), j))

    p = spark.createDataFrame(points, "k int, ts long, pid int")
    iv = spark.createDataFrame(intervals, "k int, s long, e long, iid int")
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join_binned(
            p, iv, on=["k"], ts_col="ts", start_col="s", end_col="e", bin_width=16
        ).collect()
    )
    want = sorted(
        (pid, iid)
        for k, ts, pid in points
        for k2, s, e, iid in intervals
        if k == k2 and s <= ts <= e
    )
    assert got == want


def test_inverted_interval_is_dropped_not_exploded(spark):
    """A corrupt interval with swapped bounds matches nothing — and must
    be dropped BEFORE the bin explode: sequence(a, b) auto-steps
    descending for a > b, so a large inverted interval would otherwise
    fan out to millions of bins."""
    from unicargo_medallion_data_pipeline_spark.operators.ranges import interval_join_binned

    points = spark.createDataFrame([(1, 500)], "k int, ts long")
    intervals = spark.createDataFrame(
        [(1, 400, 600, "good"), (1, 1_000_000_000, 0, "corrupt")],
        "k int, lo long, hi long, tag string",
    )
    out = interval_join_binned(
        points, intervals, on=["k"], ts_col="ts",
        start_col="lo", end_col="hi", bin_width=100,
    ).collect()
    assert [r["tag"] for r in out] == ["good"]


def test_reserved_bin_column_rejected(spark):
    import pytest as _pytest

    from unicargo_medallion_data_pipeline_spark.operators.ranges import interval_join_binned

    points = spark.createDataFrame([(1, 500, 1)], "k int, ts long, _bin int")
    intervals = spark.createDataFrame([(1, 400, 600)], "k int, lo long, hi long")
    with _pytest.raises(ValueError, match="_bin"):
        interval_join_binned(
            points, intervals, on=["k"], ts_col="ts",
            start_col="lo", end_col="hi", bin_width=100,
        )
