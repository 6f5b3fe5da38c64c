"""As-of join edge semantics: boundary equality, no-match nulls,
in-between picks, payload collision guard."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 20, "c"), (2, 7, "d"), (3, 1, "e")],
        "k int, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100), (1, 15, 101), (2, 9, 102)], "k int, t long, ref int"
    )
    return left, right


def test_asof_backward_semantics(spark, frames):
    from unicargo_medallion_data_pipeline_spark.operators.asof import asof_join_backward

    left, right = frames
    got = {
        (r["k"], r["t"]): r["ref"]
        for r in asof_join_backward(left, right, on=["k"], ts_col="t").collect()
    }
    assert got[(1, 5)] == 100  # boundary equality matches (<=)
    assert got[(1, 10)] == 100  # in-between picks the earlier row
    assert got[(1, 20)] == 101  # advances past newer right row
    assert got[(2, 7)] is None  # right row is in the future -> no match
    assert got[(3, 1)] is None  # key absent from right -> left-join null


def test_asof_rejects_payload_collision(spark, frames):
    from unicargo_medallion_data_pipeline_spark.operators.asof import asof_join_backward

    left, right = frames
    with pytest.raises(ValueError, match="collides"):
        asof_join_backward(left, right.withColumnRenamed("ref", "tag"), ["k"], "t")


def test_asof_single_shuffle_plan(spark, frames):
    """The composition must plan ONE exchange (the key shuffle for the
    window) — no join node, no cross product."""
    import contextlib
    import io

    from unicargo_medallion_data_pipeline_spark.operators.asof import asof_join_backward

    left, right = frames
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join_backward(left, right, ["k"], "t").explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan and "Join" not in plan
    assert plan.count("Exchange (") == 1

def test_asof_null_payload_cells_are_not_backfilled(spark):
    """A matched right row whose payload cell is NULL must surface that
    NULL — not a value scavenged from an older right row (rows are carried
    atomically as one struct).  Mirrors DuckDB ASOF JOIN, which joins whole
    rows."""
    from unicargo_medallion_data_pipeline_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([(1, 10), (1, 25)], "k int, t long")
    right = spark.createDataFrame(
        [(1, 5, 100, "x"), (1, 20, None, "y")], "k int, t long, ref int, note string"
    )
    got = {
        r["t"]: (r["ref"], r["note"])
        for r in asof_join_backward(left, right, on=["k"], ts_col="t").collect()
    }
    assert got[10] == (100, "x")
    # t=25 matches the t=20 right row: ref is genuinely NULL there and must
    # NOT be backfilled with 100 from the t=5 row.
    assert got[25] == (None, "y")


def test_asof_all_null_payload_row_still_counts_as_match(spark):
    from unicargo_medallion_data_pipeline_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([(1, 30)], "k int, t long")
    right = spark.createDataFrame(
        [(1, 5, 7), (1, 20, None)], "k int, t long, ref int"
    )
    [row] = asof_join_backward(left, right, on=["k"], ts_col="t").collect()
    assert row["ref"] is None  # matched the t=20 row (null ref), not t=5


def test_asof_randomized_against_reference(spark):
    """Differential test: 300 random rows vs a brute-force driver-side
    reference (latest right row with ts <= left ts per key, whole-row)."""
    import random

    from unicargo_medallion_data_pipeline_spark.operators.asof import asof_join_backward

    rng = random.Random(2024)
    left_rows = [
        (rng.randrange(8), rng.randrange(100), i) for i in range(300)
    ]
    right_rows = []
    used = set()
    for j in range(120):
        k, t = rng.randrange(8), rng.randrange(100)
        if (k, t) in used:  # contract: right unique per (key, ts)
            continue
        used.add((k, t))
        right_rows.append((k, t, j if j % 5 else None))  # some null payloads

    left = spark.createDataFrame(left_rows, "k int, t long, lid int")
    right = spark.createDataFrame(right_rows, "k int, t long, ref int")
    got = {
        r["lid"]: r["ref"]
        for r in asof_join_backward(left, right, on=["k"], ts_col="t").collect()
    }

    by_key = {}
    for k, t, ref in right_rows:
        by_key.setdefault(k, []).append((t, ref))
    for rows in by_key.values():
        rows.sort()
    for k, t, lid in left_rows:
        best = None
        for rt, ref in by_key.get(k, []):
            if rt <= t:
                best = ref
            else:
                break
        assert got[lid] == best, (k, t, lid)


def test_null_right_timestamp_never_matches(spark):
    """A right row with NULL ts can never satisfy right.ts <= left.ts:
    unfiltered it sorts FIRST under the window order and its payload
    would be carried into every left row before the first real right."""
    from unicargo_medallion_data_pipeline_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([(1, 5, "L")], "k int, ts int, lv string")
    right = spark.createDataFrame(
        [(1, None, "ghost"), (1, 9, "late")], "k int, ts int, rv string"
    )
    (row,) = asof_join_backward(left, right, on=["k"], ts_col="ts").collect()
    assert row["rv"] is None, "NULL-ts right row fabricated a match"


def test_reserved_bookkeeping_columns_rejected(spark):
    import pytest as _pytest

    from unicargo_medallion_data_pipeline_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([(1, 10, "x")], "k int, ts long, _side string")
    right = spark.createDataFrame([(1, 5, 9.9)], "k int, ts long, quote double")
    with _pytest.raises(ValueError, match="_side"):
        asof_join_backward(left, right, on=["k"], ts_col="ts")
