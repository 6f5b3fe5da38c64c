"""Local replica of the driver's duckdb-oracle correctness check.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count + column names + values
(order-insensitive: columns sorted by name, rows sorted by all columns).
Used by tests/ and by ``python -m unicargo_medallion_data_pipeline_spark.oracle`` for fast
iteration before the driver's own gate runs.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from dataclasses import dataclass

import duckdb
from pyspark.sql import SparkSession

from unicargo_medallion_data_pipeline_spark.sources.readers import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


# ---------------------------------------------------------------------------
# Type lattice: the driver's value-hash is representation-sensitive (round-5
# post-mortem: DuckDB HUGEINT results hash differently from Spark bigint even
# when every value is equal).  Map both engines' types onto a common lattice
# and treat any class mismatch as a failure.  Integer widths ≤64 bit collapse
# to one class (the driver stringifies values, so int32 vs int64 is safe);
# HUGEINT / UHUGEINT / UBIGINT and DECIMAL are *unsafe* classes nothing on the
# Spark side can match — an oracle must CAST them away (BIGINT / DOUBLE).
# ---------------------------------------------------------------------------

_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER"}


def duck_type_class(t) -> str:
    """Collapse a DuckDB type (string form) onto the comparison lattice."""
    u = str(t).upper()
    # arrays FIRST: 'TIMESTAMP[]'/'DECIMAL(10,2)[]' must not fall into
    # the scalar startswith() branches below and misclassify as scalars
    if u.endswith("[]"):
        return f"list<{duck_type_class(u[:-2])}>"
    if u in _DUCK_INT:
        return "int"
    if u in {"HUGEINT", "UHUGEINT", "UBIGINT"}:
        return "int128"
    if u in {"FLOAT", "DOUBLE"}:
        return "float"
    if u.startswith("DECIMAL"):
        return "decimal"
    if u == "VARCHAR":
        return "str"
    if u == "BOOLEAN":
        return "bool"
    if u == "DATE":
        return "date"
    if u.startswith("TIMESTAMP"):
        return "timestamp"
    if u.startswith("INTERVAL"):
        return "interval"
    return f"other:{u}"


def spark_type_class(dt) -> str:
    """Collapse a Spark DataType onto the same lattice as duck_type_class."""
    from pyspark.sql import types as T  # noqa: PLC0415

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DayTimeIntervalType):
        return "interval"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_type_class(dt.elementType)}>"
    return f"other:{dt.simpleString()}"


# Classes no Spark result can hash-match: the oracle SQL itself is defective
# if it emits one of these, independent of the Spark side.
UNSAFE_ORACLE_CLASSES = ("int128", "decimal")


def _class_unsafe(cls: str) -> bool:
    """True for an unsafe class at any nesting depth — list(sum(x)) per
    group yields HUGEINT[] → list<int128>, just as defective as a bare
    HUGEINT column."""
    if cls in UNSAFE_ORACLE_CLASSES:
        return True
    if cls.startswith("list<") and cls.endswith(">"):
        return _class_unsafe(cls[5:-1])
    return False


def oracle_type_defects(con: duckdb.DuckDBPyConnection, sql: str) -> list[tuple[str, str]]:
    """(column, duckdb_type) pairs whose type class can never hash-match
    Spark output.  Plan-only: ``con.sql`` binds without executing."""
    rel = con.sql(sql)
    return [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if _class_unsafe(duck_type_class(t))
    ]


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        # an AWARE datetime converts to UTC before dropping tzinfo;
        # merely stripping it would compare wall-clock in whatever zone
        # the producer used
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    return v


def _sort_key(row):
    return tuple((x is None, str(x)) for x in row)


def _hash_cell(v):
    """Normalize a collected Spark cell for the deterministic result
    hash.  Superset of :func:`_norm_cell`: additionally canonicalizes
    map cells (Python dicts — Spark's map iteration order is not
    defined) and struct cells (``Row``) so the hash is a pure function
    of the VALUES, not of engine-internal ordering."""
    try:
        from pyspark.sql import Row  # noqa: PLC0415

        if isinstance(v, Row):
            return tuple(sorted((k, _hash_cell(x)) for k, x in v.asDict().items()))
    except ImportError:  # pragma: no cover
        pass
    if isinstance(v, dict):
        return tuple(sorted((k, _hash_cell(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_hash_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return _norm_cell(v)


def result_hash(columns, rows) -> str:
    """Order-insensitive sha256 over a collected result: columns sorted
    by name, rows normalized via :func:`_hash_cell` then sorted — the
    same canonical form the driver's value-hash compares.  Used by the
    plan-fingerprint net to freeze each catalog query's sf0.001 RESULT
    alongside its plan shape, so a same-shape semantics edit (changed
    threshold/literal) trips the snapshot gate too (r13 verdict task 1).
    """
    import hashlib  # noqa: PLC0415

    cols = sorted(columns)
    if len(set(cols)) != len(cols):
        # r14 ADVICE item 4: r[c] name-indexing under a duplicated
        # column name would either raise deep in Row or silently hash
        # one copy twice — a misleading "pass".  No catalog query may
        # emit duplicate names (the driver's compare couldn't either);
        # fail loudly at the gate instead.
        dupes = sorted({c for c in cols if cols.count(c) > 1})
        raise ValueError(
            f"result_hash: duplicate column name(s) {dupes} — alias join "
            "outputs uniquely before hashing"
        )
    norm = sorted(
        (tuple(_hash_cell(r[c]) for c in cols) for r in rows), key=_sort_key
    )
    h = hashlib.sha256(repr(cols).encode())
    for row in norm:
        h.update(repr(row).encode())
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare_query(
    spark: SparkSession, con: duckdb.DuckDBPyConnection, name: str, fn, sql: str, sf_dir: str
) -> CompareResult:
    # Metadata checks FIRST (schema + plan-only bind, no job): a
    # column-name or type-class defect fails before the expensive Spark
    # collect runs — seconds per query across a 200-entry catalog.
    sdf = fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    rel = con.sql(sql)
    duck_types = {c: duck_type_class(t) for c, t in zip(rel.columns, rel.types)}
    duck_cols = sorted(rel.columns)
    if spark_cols != duck_cols:
        return CompareResult(name, False, f"columns differ: spark={spark_cols} duckdb={duck_cols}")
    # the driver's hash is type-sensitive, so a class mismatch is a
    # failure even when every value compares equal here
    spark_types = {f.name: spark_type_class(f.dataType) for f in sdf.schema.fields}
    type_diffs = [
        f"{c}: spark={spark_types[c]} duckdb={duck_types[c]}"
        for c in spark_cols
        if spark_types[c] != duck_types[c]
    ]
    if type_diffs:
        return CompareResult(name, False, "type class mismatch: " + "; ".join(type_diffs))
    srows = [
        tuple(_norm_cell(r[c]) for c in spark_cols) for r in sdf.collect()
    ]
    res = con.execute(sql)
    duck_cols_raw = [d[0] for d in res.description]
    drows_raw = res.fetchall()
    idx = [duck_cols_raw.index(c) for c in duck_cols]
    drows = [tuple(_norm_cell(r[i]) for i in idx) for r in drows_raw]
    if len(srows) != len(drows):
        return CompareResult(name, False, f"row counts differ: spark={len(srows)} duckdb={len(drows)}")
    srows.sort(key=_sort_key)
    drows.sort(key=_sort_key)
    for i, (a, b) in enumerate(zip(srows, drows)):
        if a != b:
            return CompareResult(
                name, False, f"first value mismatch at sorted row {i}:\n  spark : {a}\n  duckdb: {b}"
            )
    return CompareResult(name, True, f"{len(srows)} rows")


def run_all(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> list[CompareResult]:
    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG as catalog  # noqa: PLC0415

    if names:
        unknown = [n for n in names if n not in catalog]
        if unknown:
            raise ValueError(
                f"unknown query name(s): {unknown} — a typo here would "
                "otherwise report '0/0 queries match' and exit 0"
            )
    con = duckdb_connection(sf_dir)
    out: list[CompareResult] = []
    for qname, q in catalog.items():
        if names and qname not in names:
            continue
        if q.sql is None:
            try:
                cnt = q.fn(spark, sf_dir).count()
                out.append(CompareResult(qname, True, f"(rows-only) {cnt} rows"))
            except Exception as e:  # noqa: BLE001
                out.append(CompareResult(qname, False, f"(rows-only) raised: {e}"))
            continue
        try:
            out.append(compare_query(spark, con, qname, q.fn, q.sql, sf_dir))
        except Exception as e:  # noqa: BLE001
            out.append(CompareResult(qname, False, f"raised: {e}"))
    return out


def main() -> int:
    import argparse

    from unicargo_medallion_data_pipeline_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    args = ap.parse_args()
    # PySpark's collect() materializes TimestampType through the HOST
    # timezone (datetime.fromtimestamp), while DuckDB returns the
    # parquet's naive UTC wall time — on a non-UTC host every timestamp
    # would shift by the UTC offset despite session.timeZone=UTC.  Pin
    # the process zone before the session exists.
    os.environ["TZ"] = "UTC"
    try:
        import time as _time

        _time.tzset()
    except AttributeError:  # pragma: no cover — non-POSIX
        pass
    spark = get_spark("oracle-check")
    results = run_all(spark, args.sf, args.names or None)
    failed = [r for r in results if not r.ok]
    for r in results:
        mark = "PASS" if r.ok else "FAIL"
        print(f"[{mark}] {r.name}: {r.detail}")
    print(f"\n{len(results) - len(failed)}/{len(results)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
