"""Scalable global ranking (100 TB design surface).

``Window.orderBy(...)`` with no partition key moves EVERY row to one
partition (Spark warns ``WindowExec: No Partition Defined``) — fine for
dim-sized inputs (see plans/tpch_gold.py::nation_dim, documented), fatal
for fact-sized ones.  This module implements the classic distributed
alternative:

  1. ``repartitionByRange`` on the order keys — each partition holds a
     contiguous key range, partitions ordered by range;
  2. ``sortWithinPartitions`` — rows ordered inside each partition, so
     the global order is (partition order, intra-partition order);
  3. per-partition row counts — one tiny aggregation whose result is
     bounded by the partition COUNT, not the row count — turned into
     cumulative offsets and joined back via a broadcast;
  4. intra-partition positions from ``monotonically_increasing_id``
     (pid << 33 | local index, local index dense from 0 in task row
     order, which step 2 made the sorted order).

Global rank = offset[pid] + local index + 1.  No single-partition
stage anywhere; the only full shuffle is the range exchange.  The
ranked frame is pinned internally via an eager localCheckpoint —
range sampling is per-job, so the counts pass and the final pass MUST
observe the same boundaries; checkpoint blocks are freed by the
ContextCleaner when the result frame is released, unlike a persist()
this function could never safely unpersist (at lake scale,
materialize to a table instead).

Ranks are total and deterministic ONLY if the order keys are a total
tiebreak (unique): same contract as every top-k in this engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: monotonically_increasing_id packs the partition id above bit 33.
_MID_LOCAL_MASK = (1 << 33) - 1


def global_row_number(
    df: DataFrame,
    order_by: list[str],
    rank_col: str = "row_num",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 1-based global row numbers over ``order_by`` without a
    single-partition window.  ``order_by`` must be a unique key set."""
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranked = df.repartitionByRange(n_parts, *order_by).sortWithinPartitions(*order_by)

    with_mid = ranked.withColumn("_mid", F.monotonically_increasing_id()).withColumn(
        "_pid", F.shiftrightunsigned(F.col("_mid"), 33)
    )
    # PIN before the two passes: repartitionByRange SAMPLES the input to
    # pick range boundaries per job, so without pinning, the counts job
    # and the final job can see different partitionings (observed: AQE
    # shifts the boundaries) and the offsets would be applied to the
    # wrong partitions.  localCheckpoint rather than persist(): both pin
    # the partitioning (the checkpoint truncates lineage, so nothing can
    # resample), but a persist here would sit in the CacheManager for the
    # session lifetime — this function cannot unpersist before the
    # caller's action consumes the result — whereas checkpoint blocks are
    # released by the ContextCleaner once the returned frame is dropped.
    # At lake scale, materialize the ranked frame to a table instead.
    with_mid = with_mid.localCheckpoint(eager=True)
    # One tiny job: rows per partition -> cumulative offset per partition.
    counts = (
        with_mid.groupBy("_pid").count().orderBy("_pid").collect()
    )  # bounded by n_parts, never by |df|
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["count"]
    offset_df = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid bigint, _offset bigint"
    )
    return (
        with_mid.join(F.broadcast(offset_df), "_pid")
        .withColumn(
            rank_col,
            (F.col("_offset") + F.col("_mid").bitwiseAND(F.lit(_MID_LOCAL_MASK)) + 1),
        )
        .drop("_mid", "_pid", "_offset")
    )


def global_ntile(
    df: DataFrame,
    n: int,
    order_by: list[str],
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """NTILE(n) over a global order without a single-partition window.

    Matches SQL NTILE exactly: the first ``total % n`` tiles get
    ``ceil(total / n)`` rows, the rest ``floor(total / n)``.
    """
    ranked = global_row_number(df, order_by, "_rn", num_partitions)
    # The row total is a scalar the driver already knows from the offset
    # pass conceptually; a count() keeps the API self-contained (a global
    # max-window would reintroduce the single partition this exists to
    # avoid).
    n_total = ranked.count()
    base, rem = divmod(n_total, n)
    boundary = rem * (base + 1)
    tile = F.when(
        F.col("_rn") <= F.lit(boundary),
        (F.col("_rn") - 1) / F.lit(base + 1),
    ).otherwise(F.lit(rem) + (F.col("_rn") - 1 - F.lit(boundary)) / F.lit(max(base, 1)))
    return ranked.withColumn(tile_col, F.floor(tile).cast("int") + 1).drop("_rn")


def global_prefix_sum(
    df: DataFrame,
    order_by: list[str],
    val_col: str,
    sum_col: str = "prefix_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Running (inclusive) sum of ``val_col`` over a global order,
    without a single-partition window — the prefix-sum twin of
    :func:`global_row_number`, same two-phase construction:

      1. range-partition + sort on the order keys (pinned, see
         global_row_number's sampling note);
      2. one tiny per-partition SUM pass → cumulative offsets,
         broadcast back;
      3. intra-partition running sum via a window PARTITIONED by the
         range-partition id (partition-local state, never a global
         sort).

    Global prefix = offset[pid] + intra-partition running sum.  The
    order keys must be a unique total order for a deterministic result;
    ``val_col`` must be integral/decimal for an exact one (float prefix
    sums are order-dependent by nature).  This is the scale substrate
    for weighted percentiles / weighted medians / Lorenz curves — every
    "cumulative share" computation that would otherwise
    ``Window.orderBy(...)`` the whole fact onto one partition.
    """
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged = ranged.localCheckpoint(eager=True)  # pin sampled boundaries
    per_pid = (
        ranged.groupBy("_pid").agg(F.sum(val_col).alias("_psum")).orderBy("_pid").collect()
    )  # bounded by n_parts
    offsets, acc = {}, 0
    for r in per_pid:
        offsets[r["_pid"]] = acc
        acc += r["_psum"] or 0
    # Offsets ride as STRINGS and are cast to the exact Spark sum type
    # of val_col: int(...) here would silently truncate the Decimal
    # offsets the docstring promises exactness for (Python Decimal
    # accumulation above is itself exact).
    sum_type = ranged.select(F.sum(val_col).alias("_s")).schema["_s"].dataType
    offset_df = df.sparkSession.createDataFrame(
        [(int(p), str(o)) for p, o in offsets.items()], "_pid int, _offset string"
    ).withColumn("_offset", F.col("_offset").cast(sum_type))
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(F.broadcast(offset_df), "_pid")
        .withColumn(sum_col, F.col("_offset") + F.sum(val_col).over(w))
        .drop("_pid", "_offset")
    )
