"""Property tests for the round-6 continuation operators: prefix-filter
set-similarity join (losslessness vs brute force), KMV bottom-k sketch
(merge == direct on adversarial keysets), Pareto skyline (window plan ==
quadratic dominance definition).

Each test materializes a small synthetic table in the driver-testdata
parquet layout and runs the CATALOG entry end-to-end, so the property
holds for the exact code path the driver samples.
"""

from __future__ import annotations

import os
import random
import tempfile

import pytest
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG


def _write(spark, rows, schema, table):
    d = tempfile.mkdtemp(prefix=f"r6_{table}_")
    spark.createDataFrame(rows, schema).coalesce(2).write.mode("overwrite").parquet(
        os.path.join(d, f"{table}.parquet")
    )
    return d


# ---------------------------------------------------------------------------
# prefix-filter similarity join: LOSSLESS vs brute force
# ---------------------------------------------------------------------------


def _brute_jaccard_pairs(docs, t=0.8):
    out = []
    toksets = {i: set(txt.lower().split()) for i, txt in docs}
    ids = sorted(toksets)
    for i_pos, a in enumerate(ids):
        for b in ids[i_pos + 1 :]:
            inter = len(toksets[a] & toksets[b])
            union = len(toksets[a]) + len(toksets[b]) - inter
            if union and inter / union >= t:
                out.append((a, b, inter / union))
    return sorted(out)


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_prefix_filter_join_is_lossless(spark, seed):
    """Random corpora with planted near-dups: the prefix-filtered join
    must emit EXACTLY the brute-force pair set (recall 1 by theorem, not
    probability) — including sets whose size is ≡ 0 (mod 5), the case a
    float ceil(0.8·s) would get wrong."""
    rng = random.Random(seed)
    vocab = [f"w{i:03d}" for i in range(60)]
    docs = []
    for i in range(40):
        n = rng.randint(5, 20)  # sizes cross the s % 5 == 0 boundary
        docs.append((i, " ".join(rng.sample(vocab, n))))
    # planted near-dups: copy with one token changed (j >= 0.8 for n >= 9)
    for j in range(8):
        base_id, base_txt = docs[rng.randrange(len(docs))]
        toks = base_txt.split()
        if len(toks) >= 10:
            toks[rng.randrange(len(toks))] = f"x{j:02d}"
        docs.append((100 + j, " ".join(toks)))
    rows = [(i, txt, "en", "synthetic", len(txt)) for i, txt in docs]
    d = _write(
        spark,
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
        "documents",
    )
    got = sorted(
        (r.a_id, r.b_id, r.jaccard)
        for r in CATALOG["doc_prefix_filter_jaccard"].fn(spark, d).collect()
    )
    want = _brute_jaccard_pairs(docs)
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, gj), (_, _, wj) in zip(got, want):
        assert abs(gj - wj) < 1e-12


# ---------------------------------------------------------------------------
# KMV sketch: merged == direct even on adversarial keysets
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_users,seed", [(30, 3), (500, 9), (5000, 17)])
def test_kmv_merge_equals_direct(spark, n_users, seed):
    """Below, at, and far above the k=64 sketch capacity — including
    duplicate users across types — rolling up per-type sketches must
    reach the identical bottom-k (hence identical estimate) as one
    global pass, and the estimate must be within the ~13% rsd envelope
    (4 sigma) of truth when the sketch saturates."""
    rng = random.Random(seed)
    types = ["a", "b", "c", "d"]
    rows = []
    eid = 0
    for u in range(n_users):
        uid = rng.randrange(1, 10_000_000)
        for t in rng.sample(types, rng.randint(1, 4)):
            rows.append((eid, "2024-01-01 00:00:00", uid, t, 1.0, "{}"))
            eid += 1
    d = _write(
        spark,
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
        "events",
    )
    # the catalog fn casts ts itself only for real testdata; KMV only
    # touches (event_type, user_id), so the string ts is irrelevant.
    out = CATALOG["events_kmv_distinct_rollup"].fn(spark, d).collect()
    assert out, "no sketch rows"
    merged = {r.merged_est for r in out}
    direct = {r.direct_est for r in out}
    assert len(merged) == 1 and merged == direct
    exact_total = len({(r2[2]) for r2 in rows})
    est = merged.pop()
    if exact_total > 64:
        assert abs(est - exact_total) / exact_total < 0.52  # 4σ of 1/√63
    else:
        assert est == exact_total


def test_kmv_hash_negative_ids_stay_in_range(spark):
    """pmod (not %) keeps the documented [0, P) range for NEGATIVE ids:
    with plain % (sign-preserving in Spark AND DuckDB) negative ids
    hash into (−P, 0) and the saturated estimator goes negative."""
    from unicargo_medallion_data_pipeline_spark.operators.sketch import (
        KMV_P,
        kmv_bottom_k,
        kmv_estimate,
        kmv_hash,
    )
    from pyspark.sql import functions as F

    ids = spark.range(-5000, 5000).select(F.col("id").alias("user_id"))
    bounds = ids.select(
        F.min(kmv_hash(F.col("user_id"))).alias("lo"),
        F.max(kmv_hash(F.col("user_id"))).alias("hi"),
    ).first()
    assert 0 <= bounds["lo"] <= bounds["hi"] < KMV_P
    # saturated estimator stays positive and sane on an all-negative set
    neg = spark.range(1, 2001).select((-F.col("id")).alias("user_id")).withColumn(
        "g", F.lit("x")
    )
    sk = kmv_bottom_k(neg, ["g"], "user_id", k=64)
    est = kmv_estimate(sk, ["g"], k=64).first()["distinct_est"]
    assert est > 0
    assert abs(est - 2000) / 2000 < 0.52


# ---------------------------------------------------------------------------
# Pareto skyline: window plan == quadratic dominance definition
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [2, 5, 31])
def test_skyline_matches_dominance_definition(spark, seed):
    rng = random.Random(seed)
    pts = [
        (i, round(rng.uniform(1.0, 50.0), 2), rng.randint(1, 30))
        for i in range(300)
    ]
    # inject exact duplicates and equal-price ties
    pts += [(1000 + i, pts[i][1], pts[i][2]) for i in range(5)]
    pts += [(2000 + i, pts[i][1], max(1, pts[i][2] - 1)) for i in range(5)]
    d = _write(
        spark,
        [(i, f"p{i}", "B", "T", s, p) for i, p, s in pts],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
        "part",
    )
    got = sorted(
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in CATALOG["part_pareto_frontier"].fn(spark, d).collect()
    )
    want = sorted(
        (i, p, s)
        for i, p, s in pts
        if not any(
            (q[1] <= p and q[2] <= s and (q[1] < p or q[2] < s)) for q in pts
        )
    )
    assert got == want


# ---------------------------------------------------------------------------
# global prefix sum: two-phase == single-window definition
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n,parts,seed", [(100, 3, 4), (2000, 16, 8), (37, 64, 12)])
def test_global_prefix_sum_matches_serial(spark, n, parts, seed):
    """Random values and orders — including more partitions than rows —
    the distributed prefix sum must equal the serial cumulative sum."""
    from unicargo_medallion_data_pipeline_spark.operators.ranks import (
        global_prefix_sum,
    )

    rng = random.Random(seed)
    rows = [(i, rng.randint(-50, 1000)) for i in range(n)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, v long").repartition(5)
    got = {
        r.k: r.prefix_sum
        for r in global_prefix_sum(df, ["k"], "v", num_partitions=parts).collect()
    }
    acc, want = 0, {}
    for k, v in sorted(rows):
        acc += v
        want[k] = acc
    assert got == want


def test_global_prefix_sum_exact_for_decimals(spark):
    """Decimal inputs must accumulate EXACTLY across partition offsets:
    int() truncation of a Decimal offset would silently shave the
    fractional part off every later partition's prefix sums."""
    from decimal import Decimal

    from unicargo_medallion_data_pipeline_spark.operators.ranks import (
        global_prefix_sum,
    )

    rows = [(i, Decimal(f"{i % 7}.{i % 100:02d}")) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, v decimal(10,2)").repartition(5)
    got = {
        r.k: r.prefix_sum
        for r in global_prefix_sum(df, ["k"], "v", num_partitions=8).collect()
    }
    acc = Decimal(0)
    for k, v in sorted(rows):
        acc += v
        assert got[k] == acc, f"prefix sum diverged at k={k}: {got[k]} != {acc}"


def test_kmv_bottom_k_guards(spark):
    import pytest as _pytest

    from unicargo_medallion_data_pipeline_spark.operators.sketch import kmv_bottom_k

    df = spark.createDataFrame([("a", 1)], "g string, user_id int")
    with _pytest.raises(ValueError, match="k >= 2"):
        kmv_bottom_k(df, ["g"], "user_id", k=1)
    with _pytest.raises(ValueError, match="collides"):
        kmv_bottom_k(df, ["g"], "user_id", hash_col="g")
