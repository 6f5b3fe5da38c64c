"""Manifest-committed tables (sources/acid.py): atomic visibility, time
travel, copy-on-write merge/delete, optimistic concurrency, crash
safety, vacuum."""

from __future__ import annotations

import os

import pytest

from unicargo_medallion_data_pipeline_spark.sources.acid import (
    ConcurrentCommitError,
    ManifestTable,
)


@pytest.fixture()
def table(spark, tmp_path):
    return ManifestTable(spark, os.path.join(tmp_path, "t"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_commit_read_append_timetravel(spark, table):
    v0 = table.commit(_df(spark, [(1, "a"), (2, "b")]))
    assert v0 == 0
    v1 = table.commit(_df(spark, [(3, "c")]), mode="append")
    assert v1 == 1
    v2 = table.commit(_df(spark, [(9, "z")]), mode="overwrite")
    assert v2 == 2

    assert sorted(r["k"] for r in table.read().collect()) == [9]
    assert sorted(r["k"] for r in table.read(version=1).collect()) == [1, 2, 3]
    assert sorted(r["k"] for r in table.read(version=0).collect()) == [1, 2]
    assert table.versions() == [0, 1, 2]


def test_merge_upsert_is_one_atomic_version(spark, table):
    table.commit(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    v = table.merge_upsert(_df(spark, [(2, "B"), (4, "d")]), keys=["k"])
    assert v == 1
    got = {r["k"]: r["v"] for r in table.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # pre-merge state intact under time travel
    old = {r["k"]: r["v"] for r in table.read(version=0).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}


def test_delete_keys_version(spark, table):
    table.commit(_df(spark, [(1, "a"), (2, "b")]))
    table.delete_keys(_df(spark, [(1, "x")]), keys=["k"])
    assert [r["k"] for r in table.read().collect()] == [2]


def test_concurrent_commit_one_winner(spark, table):
    table.commit(_df(spark, [(1, "a")]))
    files, _stats, _bloom, _fm = table._write_data_files(_df(spark, [(2, "b")]))
    schema = _df(spark, [(2, "b")]).schema.jsonValue()
    table._commit(1, files, schema)
    with pytest.raises(ConcurrentCommitError):
        table._commit(1, files, schema)
    # the loser's failure did not disturb the winner
    assert table.versions() == [0, 1]
    assert sorted(r["k"] for r in table.read().collect()) == [2]


def test_uncommitted_files_are_invisible(spark, table):
    table.commit(_df(spark, [(1, "a")]))
    # a writer crashes after staging data but before the manifest rename
    table._write_data_files(_df(spark, [(99, "ghost")]))
    assert [r["k"] for r in table.read().collect()] == [1]
    # vacuum removes the orphans; the committed file survives
    removed = table.vacuum(keep_last=1, min_age_seconds=0)
    assert removed, "orphaned data files must be collected"
    assert [r["k"] for r in table.read().collect()] == [1]


def test_vacuum_expires_time_travel(spark, table):
    table.commit(_df(spark, [(1, "a")]))
    table.commit(_df(spark, [(2, "b")]), mode="overwrite")
    removed = table.vacuum(keep_last=1, min_age_seconds=0)
    assert removed  # v0's file is unreferenced by v1
    assert table.versions() == [1]
    with pytest.raises(FileNotFoundError):
        table.read(version=0)
    assert [r["k"] for r in table.read().collect()] == [2]


def test_empty_overwrite_keeps_schema(spark, table):
    table.commit(_df(spark, [(1, "a")]))
    table.commit(_df(spark, []).filter("k > 100"), mode="overwrite")
    out = table.read()
    assert out.count() == 0
    assert out.columns == ["k", "v"]


def test_read_pruned_skips_files(spark, table):
    """Files whose recorded [min,max] excludes the range are not in the
    pruned plan's file list; the result is still exact."""
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(100)], "k int, v string"
    ).repartitionByRange(4, "k")
    table.commit(df, stats_cols=["k"])
    pruned = table.read_pruned("k", 10, 15)
    got = sorted(r["k"] for r in pruned.collect())
    assert got == list(range(10, 16))
    # fewer input files than the full read
    n_pruned = len(pruned.inputFiles())
    n_full = len(table.read().inputFiles())
    assert n_full == 4 and n_pruned < n_full
    # range outside all stats → zero files, empty exact result
    assert table.read_pruned("k", 1000, 2000).count() == 0


def test_pruning_never_drops_statless_files(spark, table):
    """A version mixing stats-bearing and stats-less files must read
    the stats-less ones regardless of range."""
    table.commit(_df(spark, [(1, "a")]), stats_cols=["k"])
    table.commit(_df(spark, [(500, "far")]), mode="append")  # no stats
    got = sorted(r["k"] for r in table.read_pruned("k", 400, 600).collect())
    assert got == [500]


def test_compact_tightens_stats_and_files(spark, table):
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(50)], "k int, v string"
    ).repartition(8)
    table.commit(df, stats_cols=["k"])
    assert len(table.read().inputFiles()) == 8
    table.compact(target_files=2, stats_cols=["k"], sort_by=["k"])
    assert len(table.read().inputFiles()) == 2
    assert table.read().count() == 50
    # clustered stats make a narrow range touch one file
    assert len(table.read_pruned("k", 0, 5).inputFiles()) == 1


def test_append_schema_evolution_add_column(spark, table):
    """An append that adds a column reads older files with NULLs for it
    (the manifest's schema governs the read)."""
    table.commit(_df(spark, [(1, "a")]))
    wider = spark.createDataFrame([(2, "b", 9.5)], "k int, v string, score double")
    table.commit(wider, mode="append")
    out = {r["k"]: r["score"] for r in table.read().collect()}
    assert out == {1: None, 2: 9.5}
    assert table.read().columns == ["k", "v", "score"]
    # time travel to v0 still shows the original two-column shape
    assert table.read(version=0).columns == ["k", "v"]


def test_mutate_with_retry_serializes_against_interleaved_writer(spark, table):
    """A competing commit landing between read and commit forces a
    retry; the transform re-applies over the winner's state, so both
    writers' effects serialize."""
    from pyspark.sql import functions as F

    table.commit(_df(spark, [(1, "a")]))
    interleaved = {"done": False}
    real_commit = table.commit

    def racing_commit(
        df, mode="overwrite", meta=None, stats_cols=None, base_version=None
    ):
        # simulate a concurrent writer winning the version race exactly
        # once, after our read but before our commit
        if not interleaved["done"]:
            interleaved["done"] = True
            real_commit(_df(spark, [(99, "other")]), mode="append")
        return real_commit(
            df,
            mode=mode,
            meta=meta,
            stats_cols=stats_cols,
            base_version=base_version,
        )

    table.commit = racing_commit  # type: ignore[method-assign]
    try:
        v = table.mutate_with_retry(
            lambda cur: cur.unionByName(_df(spark, [(2, "mine")]))
        )
    finally:
        table.commit = real_commit  # type: ignore[method-assign]
    assert v == table.versions()[-1]
    got = sorted((r["k"], r["v"]) for r in table.read().collect())
    assert got == [(1, "a"), (2, "mine"), (99, "other")]
    _ = F


def test_multi_column_pruning_intersects(spark, table):
    """Conjunctive predicates prune on every column's stats: a file must
    overlap ALL ranges to be read."""
    df = spark.createDataFrame(
        [(i, i % 10, f"r{i}") for i in range(100)], "k int, m int, v string"
    ).repartitionByRange(4, "k")
    table.commit(df, stats_cols=["k", "m"])
    out = table.read_pruned("k", 10, 15, more=[("m", 3, 4)])
    got = sorted(r["k"] for r in out.collect())
    assert got == [13, 14]  # k in 10..15 AND k%10 in {3,4}
    assert len(out.inputFiles()) < 4
    # an impossible conjunction touches nothing
    assert table.read_pruned("k", 10, 15, more=[("k", 90, 95)]).count() == 0


def test_vacuum_retention_protects_young_files_and_cleans_stage_dirs(spark, table):
    """r5 ADVICE regression: a young unreferenced file (possibly an
    in-flight writer's staged data) must survive a default-retention
    vacuum; crashed writers' _stage_* directories must be collected once
    older than the threshold."""
    table.commit(_df(spark, [(1, "a")]))
    # crash-simulate: staged dir left behind (no manifest rename)
    import posixpath

    fs, jvm = __import__(
        "unicargo_medallion_data_pipeline_spark.sources.acid", fromlist=["_fs"]
    )._fs(spark, table.path)
    stage = posixpath.join(table.path, "data", "_stage_deadbeef")
    _df(spark, [(99, "ghost")]).write.mode("overwrite").parquet(stage)
    # also a loose orphan data file
    table._write_data_files(_df(spark, [(98, "orphan")]))

    # default retention (7 days): nothing young is deleted
    assert table.vacuum(keep_last=1) == []
    assert fs.exists(jvm.org.apache.hadoop.fs.Path(stage))

    # zero retention: orphan files AND the stage dir are collected
    removed = table.vacuum(keep_last=1, min_age_seconds=0)
    assert "_stage_deadbeef" in removed
    assert any(r.endswith(".parquet") for r in removed)
    assert not fs.exists(jvm.org.apache.hadoop.fs.Path(stage))
    assert [r["k"] for r in table.read().collect()] == [1]


def test_read_pruned_applies_manifest_schema_after_evolution(spark, table):
    """r5 ADVICE regression: a pruned read after a column-adding append
    must project the manifest schema (old files → NULL new column), not
    whichever file wins inference."""
    table.commit(_df(spark, [(1, "a"), (2, "b")]), stats_cols=["k"])
    widened = spark.createDataFrame([(10, "x", 5.0)], "k int, v string, w double")
    table.commit(widened, mode="append", stats_cols=["k"])
    out = table.read_pruned("k", 0, 100)
    assert out.columns == ["k", "v", "w"]
    rows = {r["k"]: r["w"] for r in out.collect()}
    assert rows == {1: None, 2: None, 10: 5.0}
    # pruning away the old files must still resolve the residual filter
    only_new = table.read_pruned("k", 9, 100)
    assert [r["k"] for r in only_new.collect()] == [10]


def test_bloom_pruning_skips_files_and_stays_exact(spark, table):
    """Per-file Bloom skipping: a point lookup on a high-cardinality key
    must open fewer files than the table holds while returning exactly
    the full-scan-filter rows; files without blooms must always
    survive."""
    df = spark.range(0, 4000).selectExpr("id AS k", "CAST(id % 7 AS STRING) AS v")
    # range-cluster on k so each file holds a distinct key slice
    table.commit(df.repartitionByRange(8, "k"), bloom_cols=["k"])
    probe = [17, 3999]
    out = table.read_bloom_pruned("k", probe)
    n_all, n_read = len(table.read().inputFiles()), len(out.inputFiles())
    assert n_read < n_all, f"bloom skipping regressed: {n_read}/{n_all}"
    assert sorted(r["k"] for r in out.collect()) == sorted(probe)

    # absent key: with clustered files the bloom usually excludes all of
    # them, but false positives are allowed — exactness comes from the
    # residual filter, which must always yield zero rows here
    assert table.read_bloom_pruned("k", [999999]).count() == 0

    # a bloom-less append must always survive pruning (never-drop)
    extra = spark.createDataFrame([(100000, "x")], "k long, v string")
    table.commit(extra, mode="append")  # no bloom_cols
    got = table.read_bloom_pruned("k", [100000]).collect()
    assert [(r["k"], r["v"]) for r in got] == [(100000, "x")]


def test_bloom_probe_type_parity(spark, table):
    """Probe literals are CAST to the column's manifest type before
    hashing — an int probe against a string key column must still
    prune correctly (hash the STRING form, as the commit side did)."""
    df = spark.createDataFrame(
        [(str(i), i) for i in range(200)], "k string, n int"
    )
    table.commit(df.repartitionByRange(4, "k"), bloom_cols=["k"])
    out = table.read_bloom_pruned("k", ["42"])
    assert [r["n"] for r in out.collect()] == [42]
    assert len(out.inputFiles()) < len(table.read().inputFiles())


def test_history_describes_each_version(spark, table):
    table.commit(_df(spark, [(1, "a"), (2, "b")]))
    table.commit(_df(spark, [(3, "c")]), mode="append", meta={"note": "x"})
    table.merge_upsert(_df(spark, [(2, "B")]), keys=["k"])
    h = {r["version"]: r for r in table.history().collect()}
    assert sorted(h) == [0, 1, 2]
    assert h[1]["files_removed"] == 0  # append never rewrites
    assert h[1]["files_added"] >= 1
    assert '"note": "x"' in h[1]["meta_json"]
    assert h[2]["files_removed"] == h[0]["n_files"] + h[1]["files_added"]


def test_table_changes_cdf(spark, table):
    """CDF between versions: appends diff as pure inserts reading ONLY
    the appended files; a merge shows delete+insert for the updated
    key; duplicate rows diff by multiset count."""
    table.commit(_df(spark, [(1, "a"), (2, "b"), (2, "b")]))
    table.commit(_df(spark, [(3, "c")]), mode="append")
    cdf01 = table.table_changes(0, 1)
    rows = sorted((r["k"], r["v"], r["_change_type"]) for r in cdf01.collect())
    assert rows == [(3, "c", "insert")]
    # append-only diff must not open version-0's files
    assert all("data" in f for f in cdf01.inputFiles())
    v0_files = set(table.read(version=0).inputFiles())
    assert not (set(cdf01.inputFiles()) & v0_files)

    table.merge_upsert(_df(spark, [(2, "B")]), keys=["k"])
    cdf12 = sorted(
        (r["k"], r["v"], r["_change_type"])
        for r in table.table_changes(1, 2).collect()
    )
    # both duplicate (2, b) rows leave; one (2, B) arrives
    assert cdf12 == [(2, "B", "insert"), (2, "b", "delete"), (2, "b", "delete")]

    # reverse direction flips the tags
    rev = sorted(
        (r["k"], r["v"], r["_change_type"])
        for r in table.table_changes(2, 1).collect()
    )
    assert rev == [(2, "B", "delete"), (2, "b", "insert"), (2, "b", "insert")]


def test_read_as_of_timestamp(spark, table):
    """TIMESTAMP AS OF: resolves to the newest version committed at or
    before the given time; earlier-than-first raises."""
    import time

    table.commit(_df(spark, [(1, "a")]))
    t_between = time.time()
    time.sleep(0.05)
    table.commit(_df(spark, [(2, "b")]), mode="overwrite")

    assert table.version_as_of(t_between) == 0
    assert [r["k"] for r in table.read_as_of(t_between).collect()] == [1]
    assert table.version_as_of(time.time()) == 1
    with pytest.raises(FileNotFoundError):
        table.version_as_of(t_between - 3600)


def test_commit_expectations_are_a_write_contract(spark, table):
    """A commit carrying expectations must reject a violating frame
    BEFORE any state change — the table never holds a bad version."""
    from unicargo_medallion_data_pipeline_spark.quality.expectations import (
        not_null,
        unique,
    )
    from unicargo_medallion_data_pipeline_spark.quality.validation import (
        DataQualityError,
    )

    suite = [not_null("k"), unique("k")]
    table.commit(_df(spark, [(1, "a"), (2, "b")]), expectations=suite)
    with pytest.raises(DataQualityError):
        table.commit(
            _df(spark, [(3, "c"), (3, "dup")]), mode="append", expectations=suite
        )
    # no partial state: still exactly version 0 with the clean rows
    assert table.versions() == [0]
    assert sorted(r["k"] for r in table.read().collect()) == [1, 2]


def test_metadata_only_count_and_file_report(spark, table):
    """count() resolves from manifest per-file row counts without
    opening data; file_report exposes rows/bytes per file; history
    carries the per-version row totals."""
    table.commit(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    table.commit(_df(spark, [(4, "d")]), mode="append")
    assert table.count() == 4
    assert table.count(version=0) == 3
    rep = table.file_report().collect()
    assert sum(r["n_rows"] for r in rep) == 4
    assert all(r["n_bytes"] > 0 for r in rep)
    h = {r["version"]: r["n_rows"] for r in table.history().collect()}
    assert h == {0: 3, 1: 4}


def test_restore_is_metadata_only_and_undoable(spark, table):
    table.commit(_df(spark, [(1, "a"), (2, "b")]))
    v0_files = set(table.read(version=0).inputFiles())
    table.commit(_df(spark, [(9, "z")]), mode="overwrite")
    v2 = table.restore(0)
    assert v2 == 2
    # zero copy: the restored version reads version-0's exact files
    assert set(table.read().inputFiles()) == v0_files
    assert sorted(r["k"] for r in table.read().collect()) == [1, 2]
    # history preserved: the overwritten state is still reachable...
    assert [r["k"] for r in table.read(version=1).collect()] == [9]
    # ...and the restore itself is undoable by restoring version 1
    table.restore(1)
    assert [r["k"] for r in table.read().collect()] == [9]
    # metadata-only count still works on the restored lineage
    assert table.count(version=2) == 2


def test_maybe_compact_policy(spark, table):
    # 12 tiny files → policy triggers; big target → single output file
    df = spark.range(0, 1200).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    table.commit(df.repartition(12))
    assert len(table.read().inputFiles()) == 12
    v = table.maybe_compact(target_file_bytes=1 << 20, min_files=8)
    assert v is not None
    assert len(table.read().inputFiles()) < 12
    assert table.count() == 1200
    # healthy table: second call is a no-op
    assert table.maybe_compact(target_file_bytes=1 << 20, min_files=8) is None


def test_compact_is_base_pinned_against_interleaved_commit(spark, table):
    """A commit landing between compact's read and its commit must raise
    ConcurrentCommitError (lost update), not silently drop the
    interleaved writer's rows."""
    table.commit(_df(spark, [(1, "a"), (2, "b")]).repartition(4))
    # simulate the race: pin compact to version 0, then land a commit
    table.commit(_df(spark, [(3, "c")]), mode="append")
    with pytest.raises(ConcurrentCommitError):
        table.compact(target_files=1, base_version=0)
    # the interleaved append survived
    assert sorted(r["k"] for r in table.read().collect()) == [1, 2, 3]


def test_compact_carries_stats_and_bloom_forward(spark, table):
    """Compaction defaults stats/bloom columns to what the compacted
    version already carried, recomputed over the rewritten files — so
    read_pruned/read_bloom_pruned keep skipping after compaction."""
    df = spark.createDataFrame(
        [(i, f"u{i:04d}") for i in range(400)], "k int, uid string"
    ).repartition(8)
    table.commit(df, stats_cols=["k"], bloom_cols=["uid"])
    table.compact(target_files=4, sort_by=["k"])  # no cols passed
    m = table._read_manifest(table.versions()[-1])
    files = m["files"]
    assert all("k" in m["stats"].get(f, {}) for f in files)
    assert all("uid" in m["bloom"].get(f, {}) for f in files)
    # bloom pruning still skips files and stays exact
    got = table.read_bloom_pruned("uid", ["u0007"]).collect()
    assert [r["k"] for r in got] == [7]


def test_rename_error_discrimination():
    """_is_dest_exists_error: only dest-exists failures are commit
    races; transient IO / permission / missing-parent errors are not."""
    from unicargo_medallion_data_pipeline_spark.sources.acid import _is_dest_exists_error

    class _JClass:
        def __init__(self, name):
            self._n = name

        def getName(self):
            return self._n

    class _JExc:
        def __init__(self, name, cause=None):
            self._c = _JClass(name)
            self._cause = cause

        def getClass(self):
            return self._c

        def getCause(self):
            return self._cause

    class _Py4JErr(Exception):
        def __init__(self, msg, java_exception):
            super().__init__(msg)
            self.java_exception = java_exception

    assert _is_dest_exists_error(
        _Py4JErr("x", _JExc("org.apache.hadoop.fs.FileAlreadyExistsException"))
    )
    # nested cause
    assert _is_dest_exists_error(
        _Py4JErr(
            "x",
            _JExc(
                "java.io.IOException",
                cause=_JExc("java.nio.file.FileAlreadyExistsException"),
            ),
        )
    )
    # message fallback (raw local FS): only when the message names the
    # DEST manifest being published
    assert _is_dest_exists_error(
        Exception("rename destination /t/_manifests/v1.json already exists"),
        "/t/_manifests/v1.json",
    )
    # "already exists" about some OTHER path (sidecar .crc from a
    # crashed attempt, staging dir) is NOT a race
    assert not _is_dest_exists_error(
        Exception("/t/_manifests/.v1.json.crc already exists"),
        "/t/_manifests/v1.json",
    )
    # an FS that names only the destination FILE, not the full path, is
    # still a race — requiring the full path would reclassify a genuine
    # lost race as OSError and hard-fail instead of retrying
    assert _is_dest_exists_error(
        Exception("rename failed: v1.json already exists"),
        "/t/_manifests/v1.json",
    )
    assert _is_dest_exists_error(
        Exception("file 'v1.json' already exists"),
        "/t/_manifests/v1.json",
    )
    # basename inside a DIFFERENT filename is still not a race
    assert not _is_dest_exists_error(
        Exception("old-v1.json already exists"), "/t/_manifests/v1.json"
    )
    # dest=None (no path to corroborate) stays permissive by design —
    # pin it so a future caller without a dest keeps that behavior
    # visibly rather than silently
    assert _is_dest_exists_error(Exception("whatever already exists"))
    # real IO failures are NOT races
    assert not _is_dest_exists_error(
        _Py4JErr("x", _JExc("java.io.FileNotFoundException")),
        "/t/_manifests/v1.json",
    )
    assert not _is_dest_exists_error(
        Exception("Permission denied: /t/_manifests"), "/t/_manifests/v1.json"
    )
    assert not _is_dest_exists_error(
        Exception("Mkdirs failed to create /t"), "/t/_manifests/v1.json"
    )


def test_meta_max_fence_is_single_manifest_read(spark, table):
    """The replay fence is carried forward manifest-to-manifest: after
    any interleaving (append, compact, restore, other metadata), the
    LATEST manifest alone holds the running max — max_meta_int needs no
    history scan and agrees with one."""
    table.commit(_df(spark, [(1, "a")]), meta={"cdc_batch_id": 3})
    table.commit(_df(spark, [(2, "b")]), mode="append")  # meta-less
    table.commit(_df(spark, [(3, "c")]), mode="append", meta={"other": 9})
    table.compact()
    table.commit(_df(spark, [(4, "d")]), mode="append", meta={"cdc_batch_id": 7})
    table.restore(0)  # restore must NOT reset fences

    latest = table._read_manifest(table.versions()[-1])
    # restore() records its own integer meta (restored_from), which the
    # monotone merge folds in too — assert on the fenced keys.
    assert latest["meta_max"]["cdc_batch_id"] == 7
    assert latest["meta_max"]["other"] == 9
    assert table.max_meta_int("cdc_batch_id") == 7
    assert table.max_meta_int("other") == 9
    assert table.max_meta_int("absent") == -1
    # agrees with a full history scan
    scan = -1
    for v in table.versions():
        b = table._read_manifest(v).get("meta", {}).get("cdc_batch_id")
        if b is not None and b > scan:
            scan = b
    assert scan == 7


def test_meta_max_fence_survives_vacuum(spark, table):
    """Expiring every manifest that RECORDED the fence must not lose
    it: the running max lives in the latest manifest."""
    table.commit(_df(spark, [(1, "a")]), meta={"erasure_batch_id": 5})
    table.commit(_df(spark, [(2, "b")]), mode="append")
    table.commit(_df(spark, [(3, "c")]), mode="append")
    removed = table.vacuum(keep_last=1, min_age_seconds=0)
    assert table.versions() == [2]
    assert table.max_meta_int("erasure_batch_id") == 5
    assert removed is not None


def _strip_meta_max(table):
    """Simulate the legacy on-disk format: remove meta_max from every
    committed manifest (and the LocalFS checksum sidecars the rewrite
    invalidates) — shared by the legacy-upgrade and legacy-vacuum
    tests so the simulation cannot drift between them."""
    import json as _json

    mdir = os.path.join(table.path, "_manifests")
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            p = os.path.join(mdir, name)
            with open(p) as f:
                m = _json.load(f)
            m.pop("meta_max", None)
            with open(p, "w") as f:
                _json.dump(m, f)
            crc = os.path.join(mdir, f".{name}.crc")
            if os.path.exists(crc):
                os.remove(crc)


def test_meta_max_legacy_table_self_upgrades(spark, table):
    """A table written before meta_max existed: the fence falls back to
    scanning surviving manifests, and the first new commit rebuilds the
    running max in place."""
    table.commit(_df(spark, [(1, "a")]), meta={"batch_id": 4})
    table.commit(_df(spark, [(2, "b")]), mode="append", meta={"batch_id": 6})
    table.commit(_df(spark, [(3, "c")]), mode="append")
    _strip_meta_max(table)
    assert "meta_max" not in table._read_manifest(table.versions()[-1])
    assert table.max_meta_int("batch_id") == 6  # fallback scan
    table.commit(_df(spark, [(9, "z")]), mode="append")  # upgrade
    latest = table._read_manifest(table.versions()[-1])
    assert latest["meta_max"]["batch_id"] == 6
    assert table.max_meta_int("batch_id") == 6


def test_legacy_vacuum_preserves_fence(spark, table):
    """Vacuuming a PRE-meta_max table before any new-code commit must
    not destroy the fence: the fences live only in per-version meta of
    manifests vacuum would expire, so vacuum self-upgrades first with a
    metadata-only commit reconstructing the running max."""
    table.commit(_df(spark, [(1, "a")]), meta={"cdc_batch_id": 7})
    table.commit(_df(spark, [(2, "b")]), mode="append")
    _strip_meta_max(table)
    # vacuum straight away — no new-code commit in between
    table.vacuum(keep_last=1, min_age_seconds=0)
    assert table.max_meta_int("cdc_batch_id") == 7, (
        "vacuum on a legacy table destroyed the replay fence"
    )
    latest = table._read_manifest(table.versions()[-1])
    assert latest["meta_max"]["cdc_batch_id"] == 7
    assert [r["k"] for r in table.read().orderBy("k").collect()] == [1, 2]


def test_reset_fence_enables_intentional_replay(spark, table):
    """reset_fence: the sanctioned escape hatch for intentional
    reprocessing — clears ONE key (others survive), rewrites no data,
    is recorded in history, and lower batch ids apply again after."""
    table.commit(_df(spark, [(1, "a")]), meta={"cdc_batch_id": 7})
    table.commit(
        _df(spark, [(2, "b")]), mode="append", meta={"erasure_batch_id": 3}
    )
    assert table.max_meta_int("cdc_batch_id") == 7
    v = table.reset_fence("cdc_batch_id")
    assert v == table.versions()[-1]
    # the reset key is cleared; the OTHER fence is untouched
    assert table.max_meta_int("cdc_batch_id") == -1
    assert table.max_meta_int("erasure_batch_id") == 3
    # metadata-only: table contents identical, recorded in history
    assert [r["k"] for r in table.read().orderBy("k").collect()] == [1, 2]
    assert table.latest_meta() == {"fence_reset": "cdc_batch_id"}
    # a rebuild whose batch ids restart at 0 now applies again
    table.commit(
        _df(spark, [(3, "c")]), mode="append", meta={"cdc_batch_id": 0}
    )
    assert table.max_meta_int("cdc_batch_id") == 0
    # and the reset survives further unrelated commits + vacuum
    table.compact()
    table.vacuum(keep_last=1, min_age_seconds=0)
    assert table.max_meta_int("cdc_batch_id") == 0
    assert table.max_meta_int("erasure_batch_id") == 3


def test_meta_max_random_interleaving_matches_model(spark, table):
    """State-machine differential test: a seeded random walk over every
    commit kind (overwrite/append with and without metadata, compact,
    restore, vacuum) must keep max_meta_int(k) equal to a pure-Python
    running-max model for every key, after every step."""
    import random

    rng = random.Random(7)
    model: dict[str, int] = {}
    table.commit(_df(spark, [(0, "seed")]))
    keys = ["batch_id", "cdc_batch_id", "erasure_batch_id"]

    def check():
        for k in keys:
            assert table.max_meta_int(k) == model.get(k, -1), (
                f"fence diverged for {k}"
            )

    for step in range(14):
        op = rng.choice(["meta", "plain", "append", "compact", "restore", "vacuum"])
        if op == "meta":
            k = rng.choice(keys)
            v = rng.randint(0, 50)
            table.commit(
                _df(spark, [(step, "m")]), mode="append", meta={k: v}
            )
            model[k] = max(model.get(k, -1), v)
        elif op == "plain":
            table.commit(_df(spark, [(step, "p")]))
        elif op == "append":
            table.commit(_df(spark, [(step, "a")]), mode="append")
        elif op == "compact":
            table.compact()
        elif op == "restore":
            vs = table.versions()
            table.restore(rng.choice(vs))
        elif op == "vacuum":
            table.vacuum(keep_last=1, min_age_seconds=0)
        check()


def test_multi_bloom_columns_one_commit(spark, table):
    """Two bloom columns + stats in ONE commit (single fused metadata
    scan): each column's bitmap prunes independently, row counts stay
    exact despite the explode fan-out, and pruned reads stay exact."""
    df = spark.createDataFrame(
        [(i, i * 7, 1000 - i, f"r{i}") for i in range(120)],
        "k int, uid int, other int, v string",
    ).repartitionByRange(6, "k")
    table.commit(df, stats_cols=["k"], bloom_cols=["uid", "other"])
    # exact metadata-only row counts survived the fan-out division
    assert table.count() == 120
    rep = {r["file"]: r["n_rows"] for r in table.file_report().collect()}
    assert sum(rep.values()) == 120 and all(v > 0 for v in rep.values())
    # both columns prune independently and exactly
    got_uid = sorted(r["k"] for r in table.read_bloom_pruned("uid", [7, 77 * 7]).collect())
    assert got_uid == [1, 77]
    got_other = sorted(r["k"] for r in table.read_bloom_pruned("other", [1000]).collect())
    assert got_other == [0]
    assert len(table.read_bloom_pruned("uid", [7]).inputFiles()) < 6
    # min/max stats recorded in the same scan still prune
    assert len(table.read_pruned("k", 0, 10).inputFiles()) < 6


def test_decimal_stats_commit_and_pruning(spark, table):
    """stats_cols on a DECIMAL column: the commit must serialize the
    Decimal min/max (not crash json.dumps), and read_pruned must compare
    the stored text NUMERICALLY — lexicographic '9.50' vs '10.20' would
    mis-prune."""
    from decimal import Decimal

    rows = [(i, Decimal(s)) for i, s in enumerate(["9.50", "10.20", "100.75"])]
    df = spark.createDataFrame(
        rows, "k int, amount decimal(10,2)"
    ).repartitionByRange(3, "amount")
    table.commit(df, stats_cols=["amount"])
    got = table.read_pruned("amount", Decimal("10.00"), Decimal("50.00"))
    assert [str(r["amount"]) for r in got.collect()] == ["10.20"]
    # numeric compare across the string boundary: the [9.50] file is
    # below the range ('9.50' > '10.00' LEXICOGRAPHICALLY, which would
    # keep it) and the [100.75] file is above it ('100.75' < '50.00'
    # lexicographically) — both must be pruned
    assert len(got.inputFiles()) == 1
    assert len(table.read().inputFiles()) == 3


def test_rename_error_foreign_path_same_basename_not_a_race():
    """r8 ADVICE item 4: an 'already exists' message about a SAME-NAMED
    manifest under a DIFFERENT table's path is not a race on ours."""
    from unicargo_medallion_data_pipeline_spark.sources.acid import _is_dest_exists_error

    dest = "/tables/orders/_manifests/v3.json"
    # fully-qualified foreign path → rejected
    assert not _is_dest_exists_error(
        Exception("destination /tables/customers/_manifests/v3.json already exists"),
        dest,
    )
    # our own path, scheme-qualified → accepted (suffix match)
    assert _is_dest_exists_error(
        Exception("s3://bucket/tables/orders/_manifests/v3.json already exists"),
        dest,
    )
    # bare-basename (FS names only the file) → still accepted
    assert _is_dest_exists_error(
        Exception("rename failed: v3.json already exists"), dest
    )
    # message naming BOTH a foreign path and our bare basename elsewhere
    # stays accepted (any corroborating occurrence wins)
    assert _is_dest_exists_error(
        Exception("v3.json already exists (conflicts with /other/_manifests/v3.json)"),
        dest,
    )


def test_rename_error_path_component_boundary():
    """Round-10 ADVICE 3: qualified-path corroboration must match at a
    PATH-COMPONENT boundary — a foreign table whose name merely ends
    with ours ('xorders' vs relative dest parent 'orders') is not a race
    on our manifest."""
    from unicargo_medallion_data_pipeline_spark.sources.acid import _is_dest_exists_error

    rel_dest = "orders/_manifests/v3.json"
    # foreign path whose tail CONTAINS our relative parent without a
    # component boundary → rejected
    assert not _is_dest_exists_error(
        Exception("s3://b/tables/xorders/_manifests/v3.json already exists"),
        rel_dest,
    )
    # our own relative dest, scheme/host-qualified in the message → race
    assert _is_dest_exists_error(
        Exception("s3://b/tables/orders/_manifests/v3.json already exists"),
        rel_dest,
    )
    # exact match of the qualified path → race
    assert _is_dest_exists_error(
        Exception("orders/_manifests/v3.json already exists"), rel_dest
    )
    # absolute dest, message names a longer foreign absolute path with
    # no boundary → rejected
    assert not _is_dest_exists_error(
        Exception("/tables/xorders/_manifests/v3.json already exists"),
        "/tables/orders/_manifests/v3.json",
    )


def test_append_rejects_retyped_column(spark, tmp_path):
    """Round-10 sources hunt: an append whose batch RETYPES an existing
    column must fail at COMMIT time — the old behavior committed fine
    and poisoned every subsequent read (parquet physical-type mismatch
    against the manifest schema)."""
    import pytest as _pytest

    from unicargo_medallion_data_pipeline_spark.sources.acid import ManifestTable

    t = ManifestTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1, 10)], "k int, v int"))
    with _pytest.raises(ValueError, match="retype"):
        t.commit(
            spark.createDataFrame([(2, "x")], "k int, v string"), mode="append"
        )
    # table still readable at its original version
    assert t.read().count() == 1
    # legitimate evolution still works: ADD a column
    t.commit(
        spark.createDataFrame([(2, 20, "n")], "k int, v int, extra string"),
        mode="append",
    )
    got = {r["k"]: r["extra"] for r in t.read().collect()}
    assert got == {1: None, 2: "n"}


def test_merge_upsert_null_update_key_raises(spark, tmp_path):
    """Round-10 sources hunt: a NULL-keyed update row can never match
    under SQL/Delta MERGE equality — it used to land as a duplicate
    NEXT TO the existing NULL-keyed row.  The engine's convention
    (operators/deletes.py): NULL keys in the REQUEST raise; NULL-keyed
    TARGET rows survive untouched."""
    import pytest as _pytest

    from unicargo_medallion_data_pipeline_spark.sources.acid import ManifestTable

    t = ManifestTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(None, "old"), (1, "a")], "k int, v string"))
    with _pytest.raises(ValueError, match="NULL merge key"):
        t.merge_upsert(
            spark.createDataFrame([(None, "new")], "k int, v string"), keys=["k"]
        )
    # target untouched, including its null-keyed row
    rows = sorted([(r["k"], r["v"]) for r in t.read().collect()], key=str)
    assert rows == [(1, "a"), (None, "old")]
    # a clean batch still leaves null-keyed target rows alone
    t.merge_upsert(spark.createDataFrame([(1, "A")], "k int, v string"), keys=["k"])
    rows = sorted([(r["k"], r["v"]) for r in t.read().collect()], key=str)
    assert rows == [(1, "A"), (None, "old")]


def test_delete_keys_null_key_raises(spark, tmp_path):
    """Round-10 sources hunt: a NULL delete key used to silently no-op
    (anti-join never matches NULL); it now raises, same convention as
    operators/deletes.py."""
    import pytest as _pytest

    from unicargo_medallion_data_pipeline_spark.sources.acid import ManifestTable

    t = ManifestTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(None, "x"), (1, "a")], "k int, v string"))
    with _pytest.raises(ValueError, match="NULL merge key"):
        t.delete_keys(spark.createDataFrame([(None,)], "k int"), keys=["k"])
    assert t.read().count() == 2


def test_merge_upsert_rejects_duplicate_update_keys(spark, tmp_path):
    """Round-10 sources hunt (Delta-MERGE parity): two update rows for
    one key raise instead of silently landing as duplicate key rows."""
    import pytest as _pytest

    from unicargo_medallion_data_pipeline_spark.sources.acid import ManifestTable

    t = ManifestTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1, "a")], "k int, v string"))
    with _pytest.raises(ValueError, match="more than one row"):
        t.merge_upsert(
            spark.createDataFrame([(1, "x"), (1, "y")], "k int, v string"),
            keys=["k"],
        )
    assert [(r["k"], r["v"]) for r in t.read().collect()] == [(1, "a")]
