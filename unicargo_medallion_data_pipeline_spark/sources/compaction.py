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
     ``sources/merge.py``: staging dir removed in a ``finally``;
     dynamic mode and string partition typing are both per-read/
     per-write scoped — no session conf is ever mutated).

Untouched partitions are never read or rewritten.
"""

from __future__ import annotations

import posixpath
import re

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
        # Skip hidden/staging names at ANY depth, not just the basename:
        # a concurrent writer's task files live under non-hidden
        # basenames inside `_temporary/...`, and counting them would
        # fabricate a bogus `_temporary` "partition" whose column filter
        # then aborts the whole compaction run.
        if any(seg.startswith(("_", ".")) for seg in rel.split("/")):
            continue  # _SUCCESS, _temporary/*, hidden/staging files
        part_dir = posixpath.dirname(rel)
        b, n = out.get(part_dir, (0, 0))
        out[part_dir] = (b + st.getLen(), n + 1)
    return out


def refuse_bucketed_layout(spark: SparkSession, path: str) -> None:
    """Raise if ``path`` holds BUCKETED data files (r15 task 6: the
    compaction × layout interaction guard).

    A bucketed table's layout contract lives in its FILE NAMES (the
    ``_NNNNN`` bucket-id suffix Spark's scan planner reads back) and in
    the one-file-per-bucket sort contract ``save_bucketed_table``
    stamps; folding those files with a generic repartition-and-rewrite
    would silently strip both — downstream joins would either lose
    their exchange-free plan or (on engines that trust stale metadata)
    read wrong bucket assignments.  Bucketed tables are compact BY
    CONSTRUCTION (one file per bucket at write); there is never a
    reason to point this maintenance pass at one, so any bucket-named
    data file is refused loudly."""
    from unicargo_medallion_data_pipeline_spark.sources.writers import _bucket_id_of

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if name.startswith(("_", ".")):
            continue
        if _bucket_id_of(name) is not None:
            raise ValueError(
                f"refusing to compact {path}: {name} is a bucketed data "
                "file — rewriting would break the one-file-per-bucket "
                "sort contract (rewrite via save_bucketed_table instead)"
            )


#: Hive's directory name for a NULL partition value.
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

_ESC = re.compile("%([0-9A-Fa-f]{2})")


def _unescape_hive(name: str) -> str:
    """Decode Hive/Spark partition-dir escaping (special chars → %XX)."""
    return _ESC.sub(lambda m: chr(int(m.group(1), 16)), name)


def _parse_partition_dir(part_dir: str) -> list[tuple[str, str | None]]:
    """'day=d1/country=US%3AWA' → [(col, value-or-None)] with dir-name
    escaping decoded and the Hive null sentinel mapped to None."""
    out: list[tuple[str, str | None]] = []
    for piece in part_dir.split("/"):
        col, _, raw = piece.partition("=")
        out.append((_unescape_hive(col), None if raw == _HIVE_NULL else _unescape_hive(raw)))
    return out


def _partition_filter(part_dir: str):
    """Equality filter Column for one hive-style partition dir.

    Values are unescaped before comparing (a dir 'c=a%3Ab' stores value
    'a:b'), and the Hive null sentinel compares with eqNullSafe so null
    partitions match instead of silently dropping out."""
    cond = F.lit(True)
    for col, val in _parse_partition_dir(part_dir):
        cond = cond & F.col(col).cast("string").eqNullSafe(F.lit(val))
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

    CONCURRENCY (round-10 sources hunt, stated rather than hidden):
    plain parquet has no commit protocol, so this rewrite is
    read-then-dynamic-overwrite with NO base pin — rows appended to a
    targeted partition between the census read and the final overwrite
    are REPLACED by the staged (pre-append) copy and lost.  Only run it
    when no concurrent writer touches the targeted partitions (the
    usual maintenance-window rule for raw-parquet lakes); for tables
    with concurrent writers use ``ManifestTable.compact``, whose
    base-pinned commit turns the same race into a
    ``ConcurrentCommitError`` retry instead of silent loss.
    """
    refuse_bucketed_layout(spark, path)
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

    from unicargo_medallion_data_pipeline_spark.sources.staging import (
        write_dynamic_overwrite,
        remove_path,
        staging_path,
    )

    # Partition columns must round-trip as RAW STRINGS through the
    # rewrite: type inference would read a dir like day=00 back as int 0
    # and rewrite it under a RENAMED dir (day=0), leaving the original
    # files behind as duplicates.  An explicit read schema with the
    # partition columns forced to string achieves that with per-READ
    # scope — unlike the session-wide partitionColumnTypeInference
    # toggle it replaces, which made every CONCURRENT read in the same
    # session see string partition columns for the duration of the
    # rewrite (the same hazard class as the retired session-wide
    # partitionOverwriteMode toggle).
    from pyspark.sql import types as _T

    inferred = spark.read.parquet(path).schema
    pset = set(partition_cols)
    read_schema = _T.StructType(
        [
            _T.StructField(f.name, _T.StringType(), True)
            if f.name in pset
            else f
            for f in inferred.fields
        ]
    )
    staging = staging_path(path, "compact")
    try:
        df = spark.read.schema(read_schema).parquet(path)
        keep = None
        for part_dir in todo:
            cond = _partition_filter(part_dir)
            keep = cond if keep is None else (keep | cond)
        targeted = df.filter(keep)

        # Tiny (partition values -> n_target) map, broadcast-joined so
        # each row learns its partition's target file count.  Values are
        # the UNESCAPED forms (None for the Hive null sentinel), joined
        # null-safely to match the scan's view of the data.
        map_rows = []
        for part_dir, (n_target, _) in todo.items():
            vals = tuple(v for _, v in _parse_partition_dir(part_dir))
            map_rows.append((*vals, n_target))
        plan_map = spark.createDataFrame(
            map_rows, [*(f"_pv_{c}" for c in partition_cols), "_n_target"]
        )
        join_cond = None
        for c in partition_cols:
            eq = F.col(c).cast("string").eqNullSafe(F.col(f"_pv_{c}"))
            join_cond = eq if join_cond is None else (join_cond & eq)
        # row_hash, not xxhash64(*all columns): the hash family rejects
        # map/variant columns at analysis time, so a table carrying one
        # (e.g. a bronze metadata map) was un-compactable (r9 hunt).
        from unicargo_medallion_data_pipeline_spark.functions.hashing import row_hash

        tagged = targeted.join(F.broadcast(plan_map), join_cond).withColumn(
            "_bucket",
            F.pmod(row_hash(targeted), F.col("_n_target")),
        )
        # (partition cols, bucket) hash-repartition: each tuple lives in
        # one task => at most n_target files per partition after the write.
        compacted = tagged.repartition(*partition_cols, "_bucket").drop(
            "_bucket", "_n_target", *[f"_pv_{c}" for c in partition_cols]
        )

        # Staging is written ALREADY partitioned and bucketed-by-task, so
        # every staged file holds one (partition, bucket) tuple; the final
        # pass maps staged files onto tasks (possibly merging, never
        # splitting a tuple), keeping the ≤ n_target bound per partition.
        (
            compacted.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(staging)
        )
        # Report HONESTLY: only partitions whose rewrite actually staged
        # rows count as compacted (a filter that matched nothing — e.g. a
        # dir name this code failed to decode — must not be reported).
        staged_dirs = set(partition_file_census(spark, staging))
        done = {d: nf for d, (_, nf) in todo.items() if d in staged_dirs}
        # The staging read needs the SAME explicit schema: its partition
        # dirs carry our string values, and re-inference here would
        # retype day=00 → 0 right before the final overwrite.
        staged = spark.read.schema(read_schema).parquet(staging)
        write_dynamic_overwrite(staged, path, *partition_cols)
    finally:
        remove_path(spark, staging)
    return done


def compact_unpartitioned_path(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
) -> int | None:
    """Compact an UNPARTITIONED parquet directory to
    ``ceil(bytes / target_file_bytes)`` files; returns the file count
    before compaction, or ``None`` when the layout is already compact.

    The maintained corpus silver tables (``pipelines/corpus.py``) are
    append-per-ingest-batch unpartitioned parquet — every batch leaves
    its own files, and after thousands of batches the anti-join
    admission scan pays listing + tiny-file open costs on each ingest.
    This is the maintenance pass that folds them back: one read of the
    fragmented table, pinned via ``pin_for_self_overwrite`` (Spark
    cannot overwrite a path mid-read), one hash repartition to the
    target count, one overwrite.

    Same concurrency contract as :func:`compact_partitioned_path`:
    plain parquet has no commit protocol, so run only when no
    concurrent writer touches the table (the ingest scheduler's
    maintenance window); manifest-ACID tables use
    ``ManifestTable.compact`` instead."""
    refuse_bucketed_layout(spark, path)
    census = partition_file_census(spark, path)
    if set(census) - {""}:
        raise ValueError(
            f"{path} is hive-partitioned; use compact_partitioned_path"
        )
    nbytes, nfiles = census.get("", (0, 0))
    n_target = max(1, -(-nbytes // target_file_bytes))
    if nfiles <= n_target:
        return None

    from unicargo_medallion_data_pipeline_spark.sources.staging import (
        pin_for_self_overwrite,
    )

    pinned, cleanup = pin_for_self_overwrite(
        spark.read.parquet(path), path, "compact_flat"
    )
    try:
        pinned.repartition(n_target).write.mode("overwrite").parquet(path)
    finally:
        cleanup()
    return nfiles
