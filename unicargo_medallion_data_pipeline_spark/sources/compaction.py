"""Small-file compaction for partitioned parquet tables (lake-ops
surface; no reference counterpart — the reference never partitions, but
any append-heavy S7-style sink accumulates small files, and at 100 TB the
file-count problem IS the performance problem: scan task count, driver
listing time and shuffle fan-in all degrade with millions of tiny files).

Shape: ONE job for all targeted partitions.

  1. Size census from the filesystem listing (Hadoop FileSystem API —
     works on local/HDFS/S3A alike), no Spark job.
  2. Pick partitions where ``n_files > ceil(bytes / target_file_bytes)``.
  3. Read ONLY those partitions, tag each row with a bucket id in
     ``[0, n_target)`` for its partition (tiny broadcast-joined plan map),
     and repartition by (partition cols..., bucket): every (partition,
     bucket) tuple lands in exactly one task, so each rewritten partition
     produces at most ``n_target`` files — per-partition file-count
     control in a single shuffle.
  4. Stage + dynamic partition overwrite (same hygiene as
     ``sources/merge.py``: staging dir removed and prior
     ``partitionOverwriteMode`` restored in a ``finally``).

Untouched partitions are never read or rewritten.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_file_census(
    spark: SparkSession, path: str
) -> dict[str, tuple[int, int]]:
    """{relative partition dir: (total_bytes, n_files)} from one FS listing."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    root = fs.getFileStatus(hpath).getPath().toString().rstrip("/")
    out: dict[str, tuple[int, int]] = {}
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        full = st.getPath().toString()
        rel = full[len(root) :].lstrip("/")
        base = posixpath.basename(rel)
        if base.startswith("_") or base.startswith("."):
            continue  # _SUCCESS, hidden/staging files
        part_dir = posixpath.dirname(rel)
        b, n = out.get(part_dir, (0, 0))
        out[part_dir] = (b + st.getLen(), n + 1)
    return out


def _partition_filter(part_dir: str):
    """'day=d1/country=US' → equality filter Column (hive-style dirs)."""
    cond = F.lit(True)
    for piece in part_dir.split("/"):
        col, _, val = piece.partition("=")
        cond = cond & (F.col(col).cast("string") == F.lit(val))
    return cond


def compact_partitioned_path(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 << 20,
    max_partitions_per_run: int = 512,
) -> dict[str, int]:
    """Rewrite over-fragmented partitions to ≤ ceil(bytes/target) files.

    Returns {partition_dir: files_before} for the partitions compacted.
    Bounded: at most ``max_partitions_per_run`` partitions per invocation
    (run repeatedly for a massive backlog — each run is one job, and the
    bound keeps the driver-side plan map and staging volume predictable).
    """
    census = partition_file_census(spark, path)
    todo: dict[str, tuple[int, int]] = {}
    for part_dir, (nbytes, nfiles) in census.items():
        if not part_dir:
            continue  # unpartitioned files at root are not ours to touch
        n_target = max(1, -(-nbytes // target_file_bytes))
        if nfiles > n_target:
            todo[part_dir] = (n_target, nfiles)
        if len(todo) >= max_partitions_per_run:
            break
    if not todo:
        return {}

    df = spark.read.parquet(path)
    keep = None
    for part_dir in todo:
        cond = _partition_filter(part_dir)
        keep = cond if keep is None else (keep | cond)
    targeted = df.filter(keep)

    # Tiny (partition values -> n_target) map, broadcast-joined so each
    # row learns its partition's target file count.
    map_rows = []
    for part_dir, (n_target, _) in todo.items():
        vals = tuple(p.partition("=")[2] for p in part_dir.split("/"))
        map_rows.append((*vals, n_target))
    plan_map = spark.createDataFrame(
        map_rows, [*(f"_pv_{c}" for c in partition_cols), "_n_target"]
    )
    join_cond = None
    for c in partition_cols:
        eq = F.col(c).cast("string") == F.col(f"_pv_{c}")
        join_cond = eq if join_cond is None else (join_cond & eq)
    tagged = targeted.join(F.broadcast(plan_map), join_cond).withColumn(
        "_bucket",
        F.pmod(F.xxhash64(*[F.col(c) for c in targeted.columns]), F.col("_n_target")),
    )
    # (partition cols, bucket) hash-repartition: each tuple lives in one
    # task => at most n_target files per partition after the write.
    compacted = tagged.repartition(*partition_cols, "_bucket").drop(
        "_bucket", "_n_target", *[f"_pv_{c}" for c in partition_cols]
    )

    import shutil
    import tempfile

    staging = tempfile.mkdtemp(prefix="compact_staging_")
    prior = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    try:
        # Staging is written ALREADY partitioned and bucketed-by-task, so
        # every staged file holds one (partition, bucket) tuple; the final
        # pass maps staged files onto tasks (possibly merging, never
        # splitting a tuple), keeping the ≤ n_target bound per partition.
        (
            compacted.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(staging)
        )
        staged = spark.read.parquet(staging)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            staged.write.mode("overwrite")
            .format("parquet")
            .partitionBy(*partition_cols)
            .save(path)
        )
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prior)
        shutil.rmtree(staging, ignore_errors=True)
    return {part_dir: nfiles for part_dir, (_, nfiles) in todo.items()}
