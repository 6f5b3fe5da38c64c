"""Manifest-committed tables: atomic overwrite/append/upsert/delete,
time travel, and optimistic concurrency over plain parquet — the
transactional semantics the engine's Delta branches promise, provable
in an environment with no Delta at all.

Design (the public Delta/Iceberg core, reduced to its essentials):

* data files are immutable, written under ``<table>/data/`` with a
  unique per-commit prefix;
* a commit is ONE filesystem rename of a staged JSON manifest to
  ``<table>/_manifests/v{N:012d}.json`` listing exactly the files that
  constitute version N.  Readers list ``_manifests/``, pick the highest
  version (or an explicit one — time travel), and read only the files
  it names;
* crash safety: data files not named by any committed manifest are
  invisible — a writer dying before the rename leaves garbage, never a
  corrupt or half-visible table.  ``vacuum`` removes unreferenced files
  once older versions are expired;
* concurrency: the manifest publish goes through Hadoop
  ``FileContext.rename(src, dst, Options.Rename.NONE)`` — the same
  primitive Delta's HDFSLogStore uses — which raises
  ``FileAlreadyExistsException`` when the destination exists, so two
  writers racing to commit version N produce one winner and one
  ``ConcurrentCommitError`` (optimistic concurrency — the loser
  re-reads and retries).  This is atomic fail-if-exists on HDFS; on a
  raw local/POSIX filesystem the exists-check inside FileContext still
  leaves a microscopic TOCTOU window (``File.renameTo`` overwrites),
  so local-FS concurrency is best-effort — the same caveat Delta
  documents for non-HDFS stores without a coordinating LogStore.
  Object stores need their usual lock-service caveat, documented, not
  hidden.

This removes the engine's two documented parquet crash windows: the
SCD2 current/history dual-write and MERGE's dynamic-overwrite swap both
become single-manifest commits when run through :class:`ManifestTable`.

Why not just install Delta: no network in this environment (see
docs/COVERAGE.md install-attempt ledger); the Delta branches stay in
place and auto-activate, while this module makes the transactional
semantics themselves testable here.
"""

from __future__ import annotations

import base64
import json
import posixpath
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"

#: Bloom defaults: 32768 bits (4 KiB) / 5 hashes per (file, column) —
#: ~1% false-positive rate at ~3400 distinct keys per file.  Scale
#: boundary (docs/SCALE.md): manifest-carried blooms fit tables up to
#: ~10k files (≤ ~40 MB per column); beyond that the same per-file
#: bloom belongs in the files themselves (Parquet column-index bloom
#: filters, which this layout mirrors) with the manifest keeping only
#: min/max stats.
_BLOOM_BITS = 32768
_BLOOM_HASHES = 5


def _bloom_positions(col_expr, m: int, k: int):
    """Array of ``k`` bit positions for one value: seeded ``xxhash64``
    mod ``m``.  Shared verbatim by the commit side (hashing the column)
    and the probe side (hashing a literal CAST to the column's manifest
    type), so both sides use Spark's own hash — no Python
    reimplementation to drift."""
    from pyspark.sql import functions as F

    return F.array(
        *[
            F.pmod(F.xxhash64(col_expr, F.lit(seed)), F.lit(m)).cast("int")
            for seed in range(k)
        ]
    )


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first; re-read and retry."""


def _json_safe(v):
    """Manifest stats values must be JSON: dates/timestamps → ISO text,
    decimals → exact decimal text (comparisons on read re-parse —
    casting a Decimal to float here could round a min UP or a max DOWN
    and wrongly exclude a file from a pruned read)."""
    import datetime as _dt
    from decimal import Decimal

    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v)
    return v


def _cmp_lt(a, b) -> bool:
    """Compare a pruning bound against a stored stat.  Dates/timestamps
    normalize to ISO text, whose lexicographic order equals temporal
    order.  A number against a string (how decimal stats come back from
    JSON) compares NUMERICALLY via exact Decimal when both sides parse —
    lexicographic '9.5' > '10.2' would mis-prune; only genuinely
    non-numeric text (ISO dates, plain strings) falls back to text
    comparison."""
    import datetime as _dt
    from decimal import Decimal, InvalidOperation

    if isinstance(a, (_dt.datetime, _dt.date)):
        a = a.isoformat()
    if isinstance(b, (_dt.datetime, _dt.date)):
        b = b.isoformat()
    if (
        isinstance(a, Decimal)
        or isinstance(b, Decimal)
        or isinstance(a, str) != isinstance(b, str)
    ):
        try:
            return Decimal(str(a)) < Decimal(str(b))
        except InvalidOperation:
            pass
    if isinstance(a, str) or isinstance(b, str):
        return str(a) < str(b)
    return a < b


def _strip_nullability(dt):
    """Recursively normalize every nullability flag in a type so that
    append compatibility compares PHYSICAL types only: top-level field
    nullability, ArrayType.containsNull, MapType.valueContainsNull and
    nested StructField.nullable are all metadata Spark reconciles at
    read time, not parquet encodings."""
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_strip_nullability(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _strip_nullability(dt.keyType), _strip_nullability(dt.valueType), True
        )
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _strip_nullability(f.dataType), True)
                for f in dt.fields
            ]
        )
    return dt


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _is_dest_exists_error(e: Exception, dest: str | None = None) -> bool:
    """True iff a ``FileContext.rename(…, Rename.NONE)`` failure means
    the DESTINATION already exists — i.e. another writer won the commit
    race.  Walks the Py4J Java cause chain for the known
    already-exists exception classes and falls back to the message text
    the raw local FS emits.  Everything else (transient IO, permissions,
    missing parent) is a real IO failure, not a race.

    The message fallback additionally requires ``dest`` (the manifest
    path being published) to appear in the text: a wrapped IO error
    whose message happens to say "already exists" about some OTHER path
    (a sidecar ``.crc`` from a crashed attempt, a staging dir) must not
    be misread as a lost race, or retry loops re-run a doomed commit.
    Some filesystems name only the file, not the full path, so the
    manifest BASENAME (``v{N}.json``) is accepted too — requiring the
    full path would reclassify a genuine lost race as OSError and make
    ``merge_upsert_with_retry`` hard-fail instead of retrying."""
    race_classes = (
        "org.apache.hadoop.fs.FileAlreadyExistsException",
        "org.apache.hadoop.fs.PathExistsException",
        "java.nio.file.FileAlreadyExistsException",
    )
    j = getattr(e, "java_exception", None)
    while j is not None:
        try:
            if j.getClass().getName() in race_classes:
                return True
            j = j.getCause()
        except Exception:  # noqa: BLE001 — defensive: dead gateway
            break
    msg = str(e).lower()
    if "already exists" not in msg and "destination exists" not in msg:
        return False
    if dest is None:
        return True
    # Full-path corroboration must start at a PATH-COMPONENT boundary:
    # a plain substring test would let a foreign table whose name merely
    # ENDS with ours ('…/xorders/_manifests/v3.json' vs relative dest
    # 'orders/_manifests/v3.json') corroborate a race that never touched
    # our manifest (round-10 ADVICE item 3 — same lookbehind/lookahead
    # class as the basename match below).  An ABSOLUTE dest carries its
    # own leading-slash boundary (scheme/host prefixes like
    # 's3://bucket/tables/…' legitimately abut it), so the lookbehind
    # applies only to relative dests.
    lead = "" if dest.startswith("/") else r"(?<![\w.\-])"
    if re.search(
        lead + re.escape(dest.lower()) + r"(?![\w\-])(?!\.\w)", msg
    ):
        return True
    # Basename match must be a standalone path component: a crashed
    # attempt's sidecar ``.v{N}.json.crc`` CONTAINS ``v{N}.json`` as a
    # substring but is a different file — the leading-dot lookbehind and
    # the trailing extension lookahead reject it.  An occurrence that IS
    # path-qualified must sit under OUR parent directory: a multi-table
    # error naming another table's same-named ``v{N}.json`` manifest must
    # not trigger retry loops against a commit that never raced (r8
    # ADVICE item 4).  Unqualified occurrences stay accepted — some
    # filesystems name only the file.
    base = posixpath.basename(dest.rstrip("/")).lower()
    if not base:
        return False
    parent = posixpath.dirname(dest.rstrip("/")).lower()
    for m in re.finditer(
        r"(?<![\w.\-])" + re.escape(base) + r"(?![\w\-])(?!\.\w)", msg
    ):
        prefix = msg[: m.start()]
        if prefix.endswith("/"):
            # qualified: require the message's path to end with ours
            # (suffix match tolerates scheme/host prefixes like s3://…)
            # — at a PATH-COMPONENT boundary.  A raw endswith would let
            # a foreign 's3://b/tables/xorders/_manifests' satisfy a
            # relative parent 'orders/_manifests' and misclassify a
            # never-raced commit as a lost race (round-10 ADVICE item 3).
            qual = re.split(r"[\s'\"`,;(\[]", prefix.rstrip("/"))[-1]
            if (
                qual == parent
                or qual.endswith("/" + parent)
                or parent.endswith("/" + qual)
            ):
                return True
        else:
            return True
    return False


class ManifestTable:
    """A parquet table whose visible state is defined by its latest
    committed manifest.  All mutations are copy-on-write + one atomic
    rename."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    # ------------------------------------------------------------ state

    def versions(self) -> list[int]:
        """Committed versions, ascending (empty for a missing table)."""
        fs, jvm = _fs(self.spark, self.path)
        mdir = jvm.org.apache.hadoop.fs.Path(
            posixpath.join(self.path, _MANIFEST_DIR)
        )
        if not fs.exists(mdir):
            return []
        out = []
        for st in fs.listStatus(mdir):
            name = st.getPath().getName()
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def _manifest_path(self, version: int) -> str:
        return posixpath.join(self.path, _MANIFEST_DIR, f"v{version:012d}.json")

    def _read_manifest(self, version: int) -> dict:
        fs, jvm = _fs(self.spark, self.path)
        p = jvm.org.apache.hadoop.fs.Path(self._manifest_path(version))
        stream = fs.open(p)
        try:
            # py4j cannot fill a Python-side buffer through
            # InputStream.read(byte[]) — route through commons-io (on
            # Spark's classpath) to materialize the bytes JVM-side.
            text = jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
        return json.loads(text)

    # ------------------------------------------------------------ read

    def read(self, version: int | None = None) -> DataFrame:
        """The table at ``version`` (default: latest) — time travel is
        just reading an older manifest's file list."""
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no committed version at {self.path}")
        v = vs[-1] if version is None else version
        if v not in vs:
            raise FileNotFoundError(f"version {v} not in {vs}")
        return self._df_from_manifest(self._read_manifest(v))

    def _df_from_manifest(self, m: dict) -> DataFrame:
        """The DataFrame a manifest describes (shared by :meth:`read`
        and callers that already hold the manifest, e.g.
        :meth:`compact` — one JSON fetch, not two)."""
        files = [posixpath.join(self.path, _DATA_DIR, f) for f in m["files"]]
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(m["schema"])
        if not files:
            # empty committed state: reconstruct schema from the manifest
            return self.spark.createDataFrame([], schema)
        # Read under the MANIFEST's schema, not an inferred one: column
        # order is stable, and schema evolution works — an appended
        # commit that added a column reads older files with NULLs for
        # it, and a column dropped by the latest writer is simply not
        # projected from older files.
        return self.spark.read.schema(schema).parquet(*files)

    def version_as_of(self, ts: float) -> int:
        """The latest version whose commit timestamp is ≤ ``ts`` (epoch
        seconds) — Delta's ``TIMESTAMP AS OF`` resolution rule.  Commit
        timestamps are recorded automatically in each manifest
        (``committed_at``); versions from before that field existed are
        treated as infinitely old (always eligible).

        Clock honesty (round-10 sources hunt): ``committed_at`` comes
        from the committing writer's clock, so with skewed writers the
        sequence need not be monotone in version order.  The rule here
        stays VERSION-primary: the newest VERSION whose own timestamp
        is ≤ ``ts`` wins, even if an older version carries a later
        (skewed) timestamp — reading a version always includes its
        predecessors' effects, which is the semantics a reader can
        reason about (Delta solves the same problem by monotonizing
        in-commit timestamps)."""
        best = None
        for v in self.versions():
            at = self._read_manifest(v).get("committed_at", float("-inf"))
            if at <= ts:
                best = v
        if best is None:
            raise FileNotFoundError(
                f"no version committed at or before {ts} at {self.path}"
            )
        return best

    def read_as_of(self, ts: float) -> DataFrame:
        """Time travel by TIMESTAMP: the table as of epoch-seconds
        ``ts`` (the newest version committed at or before it)."""
        return self.read(version=self.version_as_of(ts))

    # ------------------------------------------------------------ write

    def _write_data_files(
        self,
        df: DataFrame,
        stats_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
    ) -> tuple[list[str], dict, dict, dict]:
        """Stage ``df`` as immutable data files; return
        (names, stats, bloom, files_meta) — files_meta records per-file
        row counts and byte sizes (always).

        ``stats_cols`` requests per-FILE min/max for those columns,
        stored in the manifest for :meth:`read_pruned` data skipping —
        the Iceberg/Delta file-stats idea in its minimal form.  Row
        counts, stats, and blooms are all computed by ONE column-pruned
        scan of the staged files grouped by file name (not one job per
        metadata kind).  ``bloom_cols`` additionally records a
        per-(file, column) Bloom bitmap (``_BLOOM_BITS`` bits,
        ``_BLOOM_HASHES`` seeded xxhash64 probes) for
        :meth:`read_bloom_pruned` point-lookup skipping — min/max ranges
        cannot prune equality probes on high-cardinality keys whose
        values span every file (Parquet column-index blooms / Iceberg
        bloom stats are the public references)."""
        from pyspark.sql import functions as F

        fs, jvm = _fs(self.spark, self.path)
        commit_id = uuid.uuid4().hex
        staging = posixpath.join(self.path, _DATA_DIR, f"_stage_{commit_id}")
        df.write.mode("overwrite").parquet(staging)
        # ------------------------------------------------------------------
        # ONE metadata scan over the staged files computes everything the
        # manifest records: per-file row counts (always — Delta numRecords
        # parity, enabling metadata-only COUNT(*)), min/max stats, and
        # Bloom bitmaps.  With bloom columns the scan explodes each row
        # into exactly k probe positions per column ((column, position)
        # structs): min/max are invariant under the row multiplication,
        # and the exact row count falls out of the constant fan-out by
        # integer division.  xxhash64 is total (NULL hashes to a value),
        # so the fan-out never wavers.  Aggregation state per file is
        # bounded by the bitmap size (collect_set ≤ m bits per column),
        # not by row count.
        # ------------------------------------------------------------------
        stats_cols = list(stats_cols or [])
        bloom_cols = list(bloom_cols or [])
        staged = self.spark.read.parquet(staging).withColumn(
            "_file",
            F.element_at(F.split(F.input_file_name(), "/"), -1),
        )
        stat_aggs = []
        for c in stats_cols:
            stat_aggs += [
                F.min(c).alias(f"min_{c}"),
                F.max(c).alias(f"max_{c}"),
            ]
        if bloom_cols:
            fan = _BLOOM_HASHES * len(bloom_cols)

            # A one-parameter callable is required: F.transform inspects
            # arity, and a second (defaulted) parameter would receive
            # the ARRAY INDEX, not the default.
            def _tag(col_name: str):
                return lambda p: F.struct(
                    F.lit(col_name).alias("c"), p.alias("p")
                )

            per_col = [
                F.transform(
                    _bloom_positions(F.col(c), _BLOOM_BITS, _BLOOM_HASHES),
                    _tag(c),
                )
                for c in bloom_cols
            ]
            rows = (
                staged.select(
                    "_file",
                    *stats_cols,
                    F.explode(F.flatten(F.array(*per_col))).alias("_cp"),
                )
                .groupBy("_file")
                .agg(
                    F.expr(f"count(1) DIV {fan}").alias("_n"),
                    F.collect_set("_cp").alias("_ps"),
                    *stat_aggs,
                )
                .collect()
            )
        else:
            rows = (
                staged.groupBy("_file")
                .agg(F.count(F.lit(1)).alias("_n"), *stat_aggs)
                .collect()
            )
        stats: dict = {}
        bloom: dict = {}
        row_counts: dict = {}
        for r in rows:
            row_counts[r["_file"]] = r["_n"]
            if stats_cols:
                stats[r["_file"]] = {
                    c: [_json_safe(r[f"min_{c}"]), _json_safe(r[f"max_{c}"])]
                    for c in stats_cols
                }
            if bloom_cols:
                bitmaps = {
                    c: bytearray(_BLOOM_BITS // 8) for c in bloom_cols
                }
                for cp in r["_ps"]:
                    p = cp["p"]
                    bitmaps[cp["c"]][p >> 3] |= 1 << (p & 7)
                bloom[r["_file"]] = {
                    c: {
                        "m": _BLOOM_BITS,
                        "k": _BLOOM_HASHES,
                        "b64": base64.b64encode(bytes(bm)).decode("ascii"),
                    }
                    for c, bm in bitmaps.items()
                }
        names = []
        files_meta: dict = {}
        data_root = posixpath.join(self.path, _DATA_DIR)
        for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(staging)):
            name = st.getPath().getName()
            if not name.endswith(".parquet"):
                continue
            final = f"{commit_id}-{name}"
            files_meta[final] = {
                "rows": int(row_counts.get(name, 0)),
                "bytes": int(st.getLen()),
            }
            ok = fs.rename(
                st.getPath(),
                jvm.org.apache.hadoop.fs.Path(posixpath.join(data_root, final)),
            )
            if not ok:
                raise IOError(f"failed to place data file {final}")
            names.append(final)
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
        # re-key stats/bloom by the FINAL file names
        stats = {f"{commit_id}-{k}": v for k, v in stats.items()}
        bloom = {f"{commit_id}-{k}": v for k, v in bloom.items()}
        return names, stats, bloom, files_meta

    def _next_meta_max(
        self,
        version: int,
        meta: dict | None,
        prior_versions: list[int] | None = None,
        parent_manifest: dict | None = None,
        reset_keys: set[str] | None = None,
    ) -> dict:
        """Cumulative per-key maximum of every integer ``meta`` value
        ever committed, carried forward manifest-to-manifest so the
        replay fence (:meth:`max_meta_int`) is one manifest read instead
        of a scan of all versions.  The merge is monotone: each commit
        folds its own integer metadata into the parent's ``meta_max``,
        so interleaved commits of any kind (append, compaction, erasure,
        restore) PRESERVE fences rather than erasing them, and
        :meth:`vacuum` can expire every older manifest without losing
        the fence.  Tables written before this field existed are
        self-upgrading: the first new commit reconstructs the running
        max by scanning the surviving manifests once.

        ``reset_keys`` drops those keys from the carried-forward parent
        maximum BEFORE folding this commit's own ``meta`` — the one
        deliberate non-monotone step, used only by :meth:`reset_fence`
        for intentional reprocessing.

        ``prior_versions`` / ``parent_manifest`` let callers that
        already hold the version list or the parent's manifest (every
        append does) avoid re-fetching them."""
        mm: dict = {}
        if prior_versions is None:
            prior_versions = self.versions()
        prior = [v for v in prior_versions if v < version]
        if prior:
            parent = (
                parent_manifest
                if parent_manifest is not None
                and parent_manifest.get("version") == prior[-1]
                else self._read_manifest(prior[-1])
            )
            if "meta_max" in parent:
                mm = dict(parent["meta_max"])
            else:
                # Legacy table: rebuild the running max once from every
                # surviving manifest (meta only — none carries meta_max
                # or it would have been picked above).
                for v in prior:
                    for k, val in (
                        self._read_manifest(v).get("meta", {}).items()
                    ):
                        if isinstance(val, int) and not isinstance(val, bool):
                            if k not in mm or val > mm[k]:
                                mm[k] = val
        for k in reset_keys or ():
            mm.pop(k, None)
        for k, val in (meta or {}).items():
            if isinstance(val, int) and not isinstance(val, bool):
                if k not in mm or val > mm[k]:
                    mm[k] = val
        return mm

    def _commit(
        self,
        version: int,
        files: list[str],
        schema_json: dict,
        meta: dict | None = None,
        stats: dict | None = None,
        bloom: dict | None = None,
        files_meta: dict | None = None,
        prior_versions: list[int] | None = None,
        parent_manifest: dict | None = None,
        reset_keys: set[str] | None = None,
    ) -> int:
        """Atomically publish ``files`` as ``version``; raise
        :class:`ConcurrentCommitError` if someone else won the race.
        ``meta`` is caller metadata carried in the manifest (e.g. the
        streaming batch id used for exactly-once fencing)."""
        fs, jvm = _fs(self.spark, self.path)
        mdir = jvm.org.apache.hadoop.fs.Path(
            posixpath.join(self.path, _MANIFEST_DIR)
        )
        fs.mkdirs(mdir)
        tmp = jvm.org.apache.hadoop.fs.Path(
            posixpath.join(
                self.path, _MANIFEST_DIR, f"_tmp_{uuid.uuid4().hex}.json"
            )
        )
        import time

        payload = json.dumps(
            {
                "version": version,
                "files": sorted(files),
                "schema": schema_json,
                "meta": meta or {},
                "meta_max": self._next_meta_max(
                    version, meta, prior_versions, parent_manifest, reset_keys
                ),
                "stats": stats or {},
                "bloom": bloom or {},
                "files_meta": files_meta or {},
                "committed_at": time.time(),
            }
        ).encode("utf-8")
        out = fs.create(tmp, True)
        try:
            out.write(payload)
        finally:
            out.close()
        dest = jvm.org.apache.hadoop.fs.Path(self._manifest_path(version))
        # Publish via FileContext.rename(…, Rename.NONE): atomic
        # fail-if-exists on HDFS (Delta HDFSLogStore's primitive).  On a
        # raw local FS the exists-check is JVM-side but not atomic with
        # the rename — best-effort there, per the module docstring.  The
        # cheap fs.exists pre-check keeps the common lost-race path fast.
        if fs.exists(dest):
            fs.delete(tmp, False)
            raise ConcurrentCommitError(
                f"version {version} was committed concurrently at {self.path}"
            )
        gw = self.spark.sparkContext._gateway
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            dest.toUri(), self.spark._jsc.hadoopConfiguration()
        )
        opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
        opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.NONE
        try:
            fc.rename(tmp, dest, opts)
        except Exception as e:
            fs.delete(tmp, False)
            # Only a LOST RACE maps to ConcurrentCommitError: the dest
            # manifest already exists (FileAlreadyExistsException, or the
            # raw-FS variants that surface as "destination exists" /
            # "already exists" messages).  Anything else — transient IO,
            # permissions, missing parent — must NOT masquerade as a
            # race, or retry loops re-run a doomed commit while bumping
            # versions instead of surfacing the real failure.
            if _is_dest_exists_error(e, self._manifest_path(version)):
                raise ConcurrentCommitError(
                    f"version {version} was committed concurrently at "
                    f"{self.path}: {e}"
                ) from None
            raise OSError(
                f"manifest publish failed at {dest} (not a commit race): {e}"
            ) from e
        return version

    def commit(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        meta: dict | None = None,
        stats_cols: list[str] | None = None,
        base_version: int | None = None,
        bloom_cols: list[str] | None = None,
        expectations: list | None = None,
    ) -> int:
        """Write ``df`` and commit it as the next version.

        ``expectations`` (a list of
        :mod:`~unicargo_medallion_data_pipeline_spark.quality.expectations` rules)
        makes the commit a WRITE CONTRACT: the suite is evaluated over
        ``df`` first and a violation raises ``DataQualityError`` before
        any data is staged — the table can never transition into a
        contract-violating version (Delta CHECK-constraint semantics,
        enforced engine-side).

        ``overwrite``: the new version is exactly ``df``.
        ``append``: the new version is the previous file list + ``df``'s
        files — an append never rewrites existing data (an append also
        carries forward the previous version's file stats and blooms).
        ``stats_cols`` records per-file min/max for those columns in the
        manifest, enabling :meth:`read_pruned` file skipping;
        ``bloom_cols`` records per-file Bloom bitmaps enabling
        :meth:`read_bloom_pruned` equality-probe skipping.

        ``base_version`` pins the commit to the state it was DERIVED
        from: the new version must be exactly ``base_version + 1`` (-1 =
        "table must not exist yet"), so a commit computed over a stale
        read raises :class:`ConcurrentCommitError` instead of silently
        overwriting the interleaved writer's work (lost update).  Every
        read-modify-write in this module (merge/delete/retry/SCD2) pins
        its base; an unpinned commit is last-writer-wins by choice.
        Returns the committed version number.
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        if mode == "append":
            self._check_append_compatible(df)
        if expectations:
            from unicargo_medallion_data_pipeline_spark.quality.expectations import (
                run_suite,
            )

            run_suite(df, expectations, fail_fast=True)
        vs = self.versions()
        latest = vs[-1] if vs else -1
        if base_version is not None and base_version != latest:
            raise ConcurrentCommitError(
                f"state advanced from version {base_version} to {latest} "
                f"since it was read at {self.path}"
            )
        next_v = latest + 1
        new_files, stats, bloom, files_meta = self._write_data_files(
            df, stats_cols, bloom_cols
        )
        files = list(new_files)
        prev = None
        if mode == "append" and vs:
            prev = self._read_manifest(vs[-1])
            files += prev["files"]
            stats = {**prev.get("stats", {}), **stats}
            bloom = {**prev.get("bloom", {}), **bloom}
            files_meta = {**prev.get("files_meta", {}), **files_meta}
        return self._commit(
            next_v,
            files,
            df.schema.jsonValue(),
            meta=meta,
            stats=stats,
            bloom=bloom,
            files_meta=files_meta,
            prior_versions=vs,
            parent_manifest=prev,
        )

    def _check_append_compatible(self, df: DataFrame) -> None:
        """Reject an append whose schema RETYPES a column the parent
        version already has (round-10 sources hunt): the append would
        COMMIT fine — the manifest just lists old + new files under the
        new schema — but the very next read dies inside the parquet
        scan (``PARQUET_COLUMN_DATA_TYPE_MISMATCH``) because the old
        files' physical type no longer matches, i.e. a poisoned table
        published atomically.  Delta rejects this at commit time
        (schema enforcement); so do we.  Adding or dropping columns
        stays allowed — that evolution genuinely round-trips (missing
        columns read as NULL; dropped ones are not projected)."""
        vs = self.versions()
        if not vs:
            return
        from pyspark.sql.types import StructType

        parent = StructType.fromJson(self._read_manifest(vs[-1])["schema"])
        old = {f.name: f.dataType for f in parent.fields}
        # Compare PHYSICAL types only: nested nullability flags
        # (ArrayType.containsNull, MapType.valueContainsNull, inner
        # StructField.nullable) don't change the parquet encoding, and a
        # batch built from literals (containsNull=false) against a
        # read-back table (containsNull=true) is a perfectly compatible
        # append — strict equality rejected it with an error message
        # showing two identical simpleStrings (round-10 ADVICE).
        clashes = [
            (f.name, old[f.name].simpleString(), f.dataType.simpleString())
            for f in df.schema.fields
            if f.name in old
            and _strip_nullability(f.dataType) != _strip_nullability(old[f.name])
        ]
        if clashes:
            detail = ", ".join(f"{n}: {o} -> {new}" for n, o, new in clashes)
            raise ValueError(
                f"append would retype existing column(s) ({detail}) at "
                f"{self.path} — the commit would succeed but every "
                "subsequent read of the old files would fail. Cast the "
                "batch to the table's types, or rewrite with "
                "mode='overwrite' to intentionally change the schema."
            )

    def read_pruned(self, col: str, lo, hi, more: list[tuple] | None = None) -> DataFrame:
        """Read only the files whose recorded [min, max] stats overlap
        EVERY requested range — manifest-level data skipping: files
        excluded by any predicate are never opened (no footer read, no
        task).  ``more`` adds further conjunctive ``(col, lo, hi)``
        predicates.  Files with NO recorded stats for a column pass that
        predicate's pruning (skipping must never drop data).  The
        residual BETWEEN filters are still applied, so the result is
        exact."""
        from pyspark.sql import functions as F

        preds = [(col, lo, hi), *(more or [])]
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no committed version at {self.path}")
        m = self._read_manifest(vs[-1])
        stats = m.get("stats", {})

        def overlaps(f: str, c: str, plo, phi) -> bool:
            s = stats.get(f, {}).get(c)
            if s is None:
                return True
            fmin, fmax = s
            if fmin is None or fmax is None:
                return True  # all-null file stats: cannot exclude
            return not (_cmp_lt(phi, fmin) or _cmp_lt(fmax, plo))

        keep = [
            f
            for f in m["files"]
            if all(overlaps(f, c, plo, phi) for c, plo, phi in preds)
        ]
        from pyspark.sql.types import StructType

        if not keep:
            out = self.spark.createDataFrame(
                [], StructType.fromJson(m["schema"])
            )
        else:
            paths = [posixpath.join(self.path, _DATA_DIR, f) for f in keep]
            # Same manifest schema as read(): stable column order and
            # schema evolution (a pruned read after a column-adding
            # append must not depend on which surviving file wins
            # inference, and the residual filters must always resolve).
            out = self.spark.read.schema(
                StructType.fromJson(m["schema"])
            ).parquet(*paths)
        for c, plo, phi in preds:
            out = out.filter(F.col(c).between(F.lit(plo), F.lit(phi)))
        return out

    def read_bloom_pruned(self, col: str, values: list) -> DataFrame:
        """Point-lookup read: open only the files whose Bloom bitmap for
        ``col`` maybe-contains at least one of ``values`` — equality
        skipping where min/max ranges can't help (a high-cardinality key
        whose value range spans every file).  Files with no recorded
        bloom for ``col`` always survive (skipping must never drop
        data); a residual ``isin`` filter keeps the result exact under
        the bloom's false positives.

        Probe positions are computed by Spark itself over a literal CAST
        to the column's manifest type, using the exact seeded-xxhash64
        expression the commit side hashed the column with — the two
        sides cannot drift.  One probe job over ``len(values)`` local
        rows (no table scan); membership tests are driver-side bit
        checks over O(files) manifest metadata, the same posture as
        min/max stats."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        if not values:
            raise ValueError("values must be non-empty")
        if any(v is None for v in values):
            raise ValueError("bloom probe values must be non-NULL")
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no committed version at {self.path}")
        m = self._read_manifest(vs[-1])
        schema = StructType.fromJson(m["schema"])
        field = next((f for f in schema.fields if f.name == col), None)
        if field is None:
            raise KeyError(f"column {col!r} not in table schema")
        bloom = m.get("bloom", {})
        # Distinct (m, k) parameterizations present (appends under
        # different defaults may coexist); compute probe positions for
        # each in ONE local job.
        mks = sorted(
            {
                (info[col]["m"], info[col]["k"])
                for info in bloom.values()
                if col in info
            }
        )
        pos_by_mk: dict[tuple[int, int], list[list[int]]] = {}
        if mks:
            probe = self.spark.createDataFrame(
                [(v,) for v in values], StructType([field])
            )
            row_exprs = [
                _bloom_positions(F.col(col), mm, kk).alias(f"_mk_{i}")
                for i, (mm, kk) in enumerate(mks)
            ]
            rows = probe.select(*row_exprs).collect()
            for i, mk in enumerate(mks):
                pos_by_mk[mk] = [list(r[f"_mk_{i}"]) for r in rows]

        def maybe_contains(f: str) -> bool:
            info = bloom.get(f, {}).get(col)
            if info is None:
                return True  # no bloom recorded: cannot exclude
            bitmap = base64.b64decode(info["b64"])
            for positions in pos_by_mk[(info["m"], info["k"])]:
                if all(bitmap[p >> 3] & (1 << (p & 7)) for p in positions):
                    return True  # some probe value maybe-present
            return False

        keep = [f for f in m["files"] if maybe_contains(f)]
        if not keep:
            out = self.spark.createDataFrame([], schema)
        else:
            paths = [posixpath.join(self.path, _DATA_DIR, f) for f in keep]
            out = self.spark.read.schema(schema).parquet(*paths)
        return out.filter(F.col(col).isin(*values))

    def latest_meta(self) -> dict:
        """The ``meta`` dict of the latest committed version ({} for a
        missing table or a metadata-less commit)."""
        vs = self.versions()
        if not vs:
            return {}
        return self._read_manifest(vs[-1]).get("meta", {})

    def max_meta_int(self, key: str) -> int:
        """Highest integer ``meta[key]`` across ALL committed versions
        (−1 if none committed or the key never appears) — the
        replay-fence primitive for exactly-once foreachBatch sinks.  A
        fence read from :meth:`latest_meta` alone is WRONG: any
        interleaved commit of another kind (append, compaction,
        erasure, restore) replaces the latest manifest's ``meta`` and
        erases the fence, so a checkpoint replay after a crash would
        re-apply a stale batch on top of newer table state.

        O(1): every commit carries the cumulative running max of its
        integer metadata forward in the manifest (``meta_max``, a
        monotone merge with the parent's — see :meth:`_next_meta_max`),
        so the fence is ONE manifest read regardless of table history,
        survives any interleaving, and survives :meth:`vacuum` expiring
        every older version (the latest manifest always holds the full
        fence).  Manifests written before ``meta_max`` existed fall
        back to a one-time scan of the surviving versions; the next
        commit upgrades the table in place."""
        vs = self.versions()
        if not vs:
            return -1
        m = self._read_manifest(vs[-1])
        if "meta_max" in m:
            b = m["meta_max"].get(key)
            return b if isinstance(b, int) else -1
        out = -1
        for v in vs:
            b = self._read_manifest(v).get("meta", {}).get(key)
            if b is not None and b > out:
                out = b
        return out

    def reset_fence(self, key: str) -> int:
        """Explicitly clear the replay fence ``key`` with a
        METADATA-ONLY commit (same files/schema/stats — zero data
        rewritten) whose ``meta_max`` drops the key, so
        :meth:`max_meta_int` returns −1 again.

        The fence is deliberately PERMANENT otherwise: it survives
        append/compact/erasure/:meth:`restore`/:meth:`vacuum` so an
        accidental checkpoint replay can never re-apply a stale batch.
        That same permanence means INTENTIONAL reprocessing — a
        fresh-checkpoint backfill whose batch ids restart at 0, or a
        restore-then-replay rebuild — would be silently swallowed by
        the sink's idempotence check.  This is the one sanctioned
        escape hatch: an explicit operator action, recorded in history
        (``meta.fence_reset``), after which replays of lower-numbered
        batches apply again.  Delta analogue: clearing
        ``txnAppId``/``txnVersion`` by writing with a new appId.

        Raises :class:`ConcurrentCommitError` if another writer commits
        concurrently (safe to retry) and ``FileNotFoundError`` on an
        uninitialized table."""
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no committed version at {self.path}")
        m = self._read_manifest(vs[-1])
        return self._commit(
            vs[-1] + 1,
            m["files"],
            m["schema"],
            meta={"fence_reset": key},
            stats=m.get("stats", {}),
            bloom=m.get("bloom", {}),
            files_meta=m.get("files_meta", {}),
            prior_versions=vs,
            parent_manifest=m,
            reset_keys={key},
        )

    def count(self, version: int | None = None) -> int:
        """METADATA-ONLY row count (Delta numRecords parity): summed
        from the manifest's per-file row counts, no data file opened.
        Falls back to a real Spark count only if some file predates the
        ``files_meta`` field."""
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no committed version at {self.path}")
        v = vs[-1] if version is None else version
        m = self._read_manifest(v)
        fm = m.get("files_meta", {})
        if all(f in fm for f in m["files"]):
            return sum(fm[f]["rows"] for f in m["files"])
        return self.read(version=v).count()

    def file_report(self, version: int | None = None) -> DataFrame:
        """Per-file (name, rows, bytes) of a version from manifest
        metadata — the small-file/compaction-policy input, no scan."""
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no committed version at {self.path}")
        v = vs[-1] if version is None else version
        m = self._read_manifest(v)
        fm = m.get("files_meta", {})
        rows = [
            (
                f,
                fm.get(f, {}).get("rows"),
                fm.get(f, {}).get("bytes"),
            )
            for f in sorted(m["files"])
        ]
        return self.spark.createDataFrame(
            rows, "file string, n_rows bigint, n_bytes bigint"
        )

    def history(self) -> DataFrame:
        """One row per committed version — the ``DESCRIBE HISTORY``
        shape (Delta's public reference): version, file count, files
        added/removed vs the previous version, total rows (metadata
        sum; NULL for pre-files_meta versions), and the caller metadata
        as a JSON string.  Pure manifest metadata: O(versions) driver
        work, no data files opened."""
        rows = []
        prev: set[str] = set()
        for v in self.versions():
            m = self._read_manifest(v)
            cur = set(m["files"])
            fm = m.get("files_meta", {})
            n_rows = (
                sum(fm[f]["rows"] for f in cur)
                if all(f in fm for f in cur)
                else None
            )
            rows.append(
                (
                    v,
                    len(cur),
                    len(cur - prev),
                    len(prev - cur),
                    n_rows,
                    json.dumps(m.get("meta", {}), sort_keys=True),
                )
            )
            prev = cur
        schema = (
            "version int, n_files int, files_added int, files_removed int,"
            " n_rows bigint, meta_json string"
        )
        return self.spark.createDataFrame(rows, schema)

    def table_changes(self, from_version: int, to_version: int) -> DataFrame:
        """Row-level change data feed between two committed versions:
        the table at ``to_version`` minus the table at ``from_version``
        tagged ``insert``, and the reverse tagged ``delete`` (an updated
        row appears as delete+insert — the standard CDF reduction for a
        table without a declared primary key).  Multiset semantics via
        ``exceptAll``: duplicate rows diff by count.

        Scan cost is the two versions' file lists ONLY — and files
        common to both versions cancel by construction, so they are
        dropped from BOTH sides before the diff (copy-on-write appends
        leave most files untouched; an append-only commit diffs just
        the appended files — no full-table scan, the Iceberg
        incremental-read idea)."""
        vs = self.versions()
        for v in (from_version, to_version):
            if v not in vs:
                raise FileNotFoundError(f"version {v} not in {vs}")
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        m_from = self._read_manifest(from_version)
        m_to = self._read_manifest(to_version)
        shared = set(m_from["files"]) & set(m_to["files"])
        schema = StructType.fromJson(m_to["schema"])

        def _read_files(names, sch) -> DataFrame:
            only = [f for f in names if f not in shared]
            if not only:
                return self.spark.createDataFrame([], sch)
            paths = [posixpath.join(self.path, _DATA_DIR, f) for f in only]
            return self.spark.read.schema(sch).parquet(*paths)

        old = _read_files(m_from["files"], StructType.fromJson(m_from["schema"]))
        new = _read_files(m_to["files"], schema)
        # align columns for the diff (schema evolution: missing → NULL)
        cols = [f.name for f in schema.fields]
        old_names = set(old.columns)
        old = old.select(
            *[
                (F.col(c) if c in old_names else F.lit(None).cast(schema[c].dataType)).alias(c)
                for c in cols
            ]
        )
        inserts = new.exceptAll(old).withColumn("_change_type", F.lit("insert"))
        deletes = old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
        return inserts.unionByName(deletes)

    # ------------------------------------------------------ mutations

    def _latest_version(self) -> int:
        """Latest committed version; FileNotFoundError (never a bare
        IndexError) on an uninitialized table, matching :meth:`read`."""
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no committed version at {self.path}")
        return vs[-1]

    def _check_batch_keys(
        self, batch: DataFrame, keys: list[str], what: str, dups: bool
    ) -> None:
        """Fail-fast key-quality gate for the (small) batch side of a
        merge/delete (round-10 sources hunt).

        NULL keys: SQL/Delta MERGE equality never matches NULL, so a
        NULL-keyed update row can never update anything — it would land
        as a brand-new row NEXT TO the existing NULL-keyed row, forever
        (probed live: old+new both survived), and a NULL delete key
        would silently no-op.  The engine's established convention for
        exactly this (``operators/deletes.py``) is: NULL-keyed TARGET
        rows survive unmatched (never collateral damage), NULL keys in
        the REQUEST raise — a batch keyed on NULL is a data bug to
        surface, not semantics to guess.  The alternative (matching
        null-safely) was rejected because the code-complete Delta MERGE
        branch uses SQL equality, and the two branches must not
        diverge.

        ``dups``: Delta-MERGE parity — two update rows for one key have
        no defined winner (Delta raises "multiple source rows
        matched"); the old union path silently landed both.  Both
        checks ride ONE bounded agg job over the (small) batch side:
        group by the keys, then fold per-group counts and key
        nullability into a single driver row."""
        from pyspark.sql import functions as F

        null_cond = None
        for k in keys:
            c = F.col(k).isNull()
            null_cond = c if null_cond is None else (null_cond | c)
        row = (
            batch.groupBy(*[F.col(k) for k in keys])
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.max(null_cond.cast("int")).alias("_has_null"),
                F.max("_n").alias("_max_n"),
            )
            .collect()[0]
        )
        if row["_has_null"]:
            raise ValueError(
                f"{what} contain NULL merge key values; SQL/Delta MERGE "
                "equality never matches NULL, so such a row can only "
                "duplicate or no-op — clean the batch or delete by a "
                "non-null key"
            )
        if dups and (row["_max_n"] or 0) > 1:
            raise ValueError(
                "updates carry more than one row for at least one "
                "merge key — reduce the batch to one winner per key "
                "first (e.g. streaming.writers.apply_cdc_batch's "
                "rule), as a multi-row upsert per key has no "
                "defined winner"
            )

    def merge_upsert(self, updates: DataFrame, keys: list[str]) -> int:
        """Copy-on-write MERGE: latest state anti-joined on ``keys``,
        unioned with ``updates``, committed as one new version — the
        whole upsert is visible atomically (no dynamic-overwrite swap
        window).  Updates win on key collision.  NULL update keys and
        multi-row-per-key batches raise (see
        :meth:`_check_batch_keys`); NULL-keyed TARGET rows always
        survive untouched.  Pinned to the version read, so a concurrent
        commit conflicts instead of being lost."""
        self._check_batch_keys(updates, keys, "updates", dups=True)
        base = self._latest_version()
        current = self.read(version=base)
        survivors = current.join(
            updates.select(*keys).distinct(), keys, "left_anti"
        )
        merged = survivors.unionByName(updates.select(*current.columns))
        return self.commit(merged, mode="overwrite", base_version=base)

    def delete_keys(self, delete_keys: DataFrame, keys: list[str]) -> int:
        """Copy-on-write DELETE: survivors committed as one version
        (base-pinned, same as merge).  NULL delete keys raise instead
        of silently no-opping (:meth:`_check_batch_keys`); NULL-keyed
        target rows always survive."""
        self._check_batch_keys(delete_keys, keys, "delete keys", dups=False)
        base = self._latest_version()
        current = self.read(version=base)
        survivors = current.join(
            delete_keys.select(*keys).distinct(), keys, "left_anti"
        )
        return self.commit(survivors, mode="overwrite", base_version=base)

    def mutate_with_retry(self, build, max_attempts: int = 5) -> int:
        """Run an optimistic read-modify-commit loop: ``build(current_df)``
        returns the DataFrame to commit as the next version; on a
        :class:`ConcurrentCommitError` (someone committed since the
        read) the state is re-read and ``build`` re-applied, at most
        ``max_attempts`` times.

        This is the correct client shape for concurrent writers: the
        transform must be a pure function of the current state (e.g. an
        upsert of a fixed batch), so replaying it over the winner's
        state yields the intended serialized result.
        """
        last: ConcurrentCommitError | None = None
        for _ in range(max_attempts):
            base = self._latest_version()
            current = self.read(version=base)
            try:
                return self.commit(
                    build(current), mode="overwrite", base_version=base
                )
            except ConcurrentCommitError as e:
                last = e
        raise ConcurrentCommitError(
            f"gave up after {max_attempts} attempts: {last}"
        )

    # ------------------------------------------------------ maintenance

    def compact(
        self,
        target_files: int = 1,
        stats_cols: list[str] | None = None,
        sort_by: list[str] | None = None,
        bloom_cols: list[str] | None = None,
        base_version: int | None = None,
    ) -> int:
        """Rewrite the latest version into ``target_files`` files —
        small-file compaction as one atomic commit (readers flip from
        the fragmented file list to the compacted one instantly; old
        files stay until :meth:`vacuum`).  ``sort_by`` clusters rows
        before the rewrite so recorded ``stats_cols`` ranges become
        tight and :meth:`read_pruned` skips effectively — compaction
        and Z-order-style clustering in one pass.

        The commit is PINNED to the version it read (``base_version``):
        a commit landing between the read and the compaction commit
        raises :class:`ConcurrentCommitError` instead of being silently
        dropped (lost update).  ``stats_cols`` / ``bloom_cols`` default
        to the columns the compacted version already carried stats /
        blooms for, so compaction never silently degrades
        :meth:`read_pruned` / :meth:`read_bloom_pruned` to full scans —
        per-file metadata is invalid for rewritten files and must be
        recomputed, not dropped."""
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no committed version at {self.path}")
        base = vs[-1] if base_version is None else base_version
        m = self._read_manifest(base)
        if stats_cols is None:
            stats_cols = sorted({c for f in m.get("stats", {}).values() for c in f})
        if bloom_cols is None:
            bloom_cols = sorted({c for f in m.get("bloom", {}).values() for c in f})
        df = self._df_from_manifest(m)
        if sort_by:
            df = df.repartitionByRange(target_files, *sort_by)
        else:
            df = df.repartition(target_files)
        return self.commit(
            df,
            mode="overwrite",
            stats_cols=stats_cols or None,
            bloom_cols=bloom_cols or None,
            base_version=base,
        )

    #: Delta-style default retention: an unreferenced file younger than
    #: this may belong to an in-flight writer that has staged its data
    #: but not yet renamed its manifest — deleting it would commit a
    #: version referencing missing files.
    DEFAULT_RETENTION_SECONDS = 7 * 24 * 3600

    def restore(self, version: int) -> int:
        """Delta-style RESTORE: roll the table back to ``version`` as a
        NEW commit whose manifest points at the old version's files —
        METADATA-ONLY (no data rewritten, zero copy), so history is
        preserved and the restore itself is time-travelable/undoable.
        The restored version must not have been vacuumed away."""
        vs = self.versions()
        if version not in vs:
            raise FileNotFoundError(f"version {version} not in {vs}")
        m = self._read_manifest(version)
        return self._commit(
            vs[-1] + 1,
            m["files"],
            m["schema"],
            meta={"restored_from": version},
            stats=m.get("stats", {}),
            bloom=m.get("bloom", {}),
            files_meta=m.get("files_meta", {}),
            prior_versions=vs,
            parent_manifest=m if version == vs[-1] else None,
        )

    def maybe_compact(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        min_files: int = 8,
        stats_cols: list[str] | None = None,
        sort_by: list[str] | None = None,
        bloom_cols: list[str] | None = None,
    ) -> int | None:
        """Policy-driven small-file compaction: rewrite only when the
        latest version has ≥ ``min_files`` files AND their average size
        is under half of ``target_file_bytes`` (both read from manifest
        metadata — no scan).  Target file count = ceil(total_bytes /
        target_file_bytes).  Returns the new version, or None if the
        table is already healthy — safe to call after every append:
        the compaction commit is pinned to the version whose
        ``files_meta`` informed the decision, so a commit landing in
        between raises :class:`ConcurrentCommitError` rather than being
        silently dropped, and stats/bloom columns are carried forward
        (recomputed over the rewritten files) by default."""
        vs = self.versions()
        if not vs:
            return None
        m = self._read_manifest(vs[-1])
        fm = m.get("files_meta", {})
        files = m["files"]
        if len(files) < min_files or not all(f in fm for f in files):
            return None
        total = sum(fm[f]["bytes"] for f in files)
        if total / len(files) >= target_file_bytes / 2:
            return None
        target = max(1, -(-total // target_file_bytes))
        return self.compact(
            target_files=target,
            stats_cols=stats_cols,
            sort_by=sort_by,
            bloom_cols=bloom_cols,
            base_version=vs[-1],
        )

    def vacuum(
        self, keep_last: int = 1, min_age_seconds: float | None = None
    ) -> list[str]:
        """Expire all but the last ``keep_last`` versions and delete
        data files no surviving manifest references, PROVIDED they are
        older than ``min_age_seconds`` (default
        :data:`DEFAULT_RETENTION_SECONDS`, Delta's retention idea: a
        young unreferenced file may be a concurrent writer's staged
        data racing toward its manifest rename — age is the only safe
        discriminator).  Stale ``_stage_*`` directories from crashed
        writers are removed under the same age rule.  Returns the names
        of removed data files/directories.  Time travel reaches only
        surviving versions afterwards — and so does any PER-VERSION
        metadata history (``history()``, CDF, the erasure sink's
        ``erasure_audit_frame``): export what compliance needs to a
        durable log table BEFORE vacuuming.  Replay fences survive
        regardless (``meta_max``; legacy tables are self-upgraded
        below).  Tests pass ``min_age_seconds=0`` to vacuum
        deterministically."""
        import time

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        if min_age_seconds is None:
            min_age_seconds = self.DEFAULT_RETENTION_SECONDS
        cutoff_ms = (time.time() - min_age_seconds) * 1000.0
        vs = self.versions()
        # Legacy-table fence preservation: if manifests are about to be
        # expired and the latest one predates ``meta_max``, the replay
        # fences live ONLY in the per-version ``meta`` of manifests this
        # vacuum may delete.  Self-upgrade first with a metadata-only
        # commit (its ``_next_meta_max`` legacy path reconstructs the
        # running max from every still-surviving manifest), so the
        # documented "fence survives vacuum" property holds
        # unconditionally — not just for tables that already took one
        # new-code commit.  A concurrent commit racing this upgrade
        # raises ConcurrentCommitError; vacuum is safe to re-run.
        m = self._read_manifest(vs[-1]) if len(vs) > keep_last else None
        if m is not None and "meta_max" not in m:
            self._commit(
                vs[-1] + 1,
                m["files"],
                m["schema"],
                meta={"upgrade": "meta_max"},
                stats=m.get("stats", {}),
                bloom=m.get("bloom", {}),
                files_meta=m.get("files_meta", {}),
                prior_versions=vs,
            )
            vs = self.versions()
        keep = set(vs[-keep_last:])
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self._read_manifest(v)["files"])
        fs, jvm = _fs(self.spark, self.path)
        # drop expired manifests first: a reader can no longer pick them
        for v in vs:
            if v not in keep:
                fs.delete(
                    jvm.org.apache.hadoop.fs.Path(self._manifest_path(v)), False
                )
        removed = []
        data_root = posixpath.join(self.path, _DATA_DIR)
        droot = jvm.org.apache.hadoop.fs.Path(data_root)
        if fs.exists(droot):
            for st in fs.listStatus(droot):
                name = st.getPath().getName()
                if name in referenced:
                    continue
                if st.getModificationTime() > cutoff_ms:
                    continue  # young: possibly an in-flight writer's
                if st.isDirectory():
                    if name.startswith("_stage_"):
                        # crashed writer's staging dir
                        fs.delete(st.getPath(), True)
                        removed.append(name)
                    continue
                fs.delete(st.getPath(), False)
                removed.append(name)
        return removed
