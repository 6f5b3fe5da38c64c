#!/usr/bin/env python
"""Skew stress anchor (r8 verdict task 4): measured evidence for the
"Hot keys" strategy in docs/SCALE.md, which until now was argued, not
timed.

Builds a deliberately skewed join input from the sf0.1 lineitem (30% of
rows remapped onto ONE hot l_suppkey) and times three executions of the
same supplier join:

  plain   — sort-merge join, AQE skew splitting OFF (what a naive plan
            does when the build side cannot broadcast)
  aqe     — sort-merge join, AQE skew splitting ON (Spark's runtime fix)
  salted  — operators/skew.salted_join (explicit salt, the engine's
            pre-planned fix for when AQE cannot see the skew, e.g.
            non-SMJ shapes or pre-4.x clusters)

Broadcast is disabled for all three variants: at bench scale the
1000-row supplier would broadcast and no skew path would execute at
all — the whole point is to model the 100 TB case where the build side
exceeds the broadcast threshold.  Result equality across the three
variants is asserted on every run (count + order-insensitive hash), so
the timing table can never silently compare different answers.

Prints ONE JSON line:
  {"metric": "skew_join_wall", "unit": "sec",
   "variants": {"plain": s, "aqe": s, "salted": s},
   "rows": N, "hot_fraction": f, "equal": true,
   "calibration": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

HOT_FRACTION = 0.30
HOT_KEY = 1
N_ROUNDS = 3
#: Deterministic row replication: sf0.1's 600k rows put only ~180k on
#: the hot key — one local task clears that in well under a second, so
#: the skew penalty the anchor exists to show barely registers.  8×
#: (4.8M rows, ~1.44M hot) makes the straggler task long enough to
#: dominate the unsplit plan, the regime the 100 TB argument is about.
MULTIPLIER = int(os.environ.get("SKEW_BENCH_MULTIPLIER", "8"))


def skewed_lineitem(spark, sf_dir: str, multiplier: int = 1):
    """lineitem replicated ``multiplier``× with ~30% of rows remapped to
    one hot suppkey — deterministic (hash-based row selection, no RNG).
    The replica id stays a column so full-row hashes (the salt) still
    distinguish replicas."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    if multiplier > 1:
        li = li.withColumn(
            "_rep", F.explode(F.array(*[F.lit(i) for i in range(multiplier)]))
        )
    pick = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(100)) < int(
        HOT_FRACTION * 100
    )
    return li.withColumn(
        "l_suppkey", F.when(pick, F.lit(HOT_KEY)).otherwise(F.col("l_suppkey"))
    )


def _join_plain(skewed, supp):
    return skewed.join(supp, skewed.l_suppkey == supp.s_suppkey, "inner")


def _join_salted(skewed, supp):
    from unicargo_medallion_data_pipeline_spark.operators.skew import salted_join

    sk = skewed.withColumnRenamed("l_suppkey", "s_suppkey")
    return salted_join(sk, supp, on=["s_suppkey"], buckets=16)


def _digest(df) -> tuple:
    """Order-insensitive content digest: count + sum of row hashes over a
    stable column subset (revenue-ish measure + keys + supplier name)."""
    row_h = F.xxhash64(
        "l_orderkey", "l_linenumber", "s_suppkey", "s_name", "l_extendedprice"
    )
    r = df.select(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: a bigint sum of 600k full-range hashes can
        # overflow, which ANSI mode turns into a runtime error
        F.sum(row_h.cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return int(r["n"]), int(r["h"])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import steady_time_queries
    from unicargo_medallion_data_pipeline_spark.session import get_spark

    spark = get_spark("bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    # model the non-broadcastable build side (see module docstring)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # make local partitions big enough that ONE holds the whole hot key
    # unless AQE splits it (mirrors a cluster's per-task skew)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    # let AQE call the hot partition skewed at local data sizes (the
    # default threshold is 256 MB — cluster-sized)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")

    supp = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet"))
    # 24 upstream partitions before the checkpoint: AQE splits a skewed
    # reduce partition along MAP-task chunk boundaries, so a shuffle fed
    # by very few mappers (the raw 3-split scan) is UNSPLITTABLE however
    # skewed it is — verified against Spark 4.1 (0 skewed partitions at
    # 3 mappers, split fires at 24).  A real cluster has hundreds of map
    # tasks; 24 models that.  This granularity rule is itself a scale
    # finding: docs/SCALE.md "Hot keys".
    skewed = (
        skewed_lineitem(spark, sf_dir, MULTIPLIER)
        .repartition(24)
        .localCheckpoint(eager=True)
    )
    supp.count()  # warm footers

    def run_plain():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        try:
            return _digest(_join_plain(skewed, supp))
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    def run_aqe():
        return _digest(_join_plain(skewed, supp))

    def run_salted():
        # salted output lacks the duplicated join column; digest columns
        # all survive, so the digest is comparable
        return _digest(_join_salted(skewed, supp))

    variants = {"plain": run_plain, "aqe": run_aqe, "salted": run_salted}
    digests: dict[str, tuple] = {}

    def _attempt(name: str) -> float:
        t0 = time.perf_counter()
        d = variants[name]()
        dt = time.perf_counter() - t0
        if name in digests and digests[name] != d:
            raise AssertionError(f"{name}: digest unstable across rounds")
        digests[name] = d
        return dt

    # shared steady-by-construction policy (r11 verdict item 6)
    times, calibration = steady_time_queries(
        list(variants), _attempt, n_rounds=N_ROUNDS
    )

    equal = len(set(digests.values())) == 1
    if not equal:
        raise AssertionError(f"variant results differ: {digests}")
    print(
        json.dumps(
            {
                "metric": "skew_join_wall",
                "unit": "sec",
                "variants": times,
                "rows": skewed.count(),
                "hot_fraction": HOT_FRACTION,
                "multiplier": MULTIPLIER,
                "equal": equal,
                "calibration": calibration,
            }
        )
    )


if __name__ == "__main__":
    main()
