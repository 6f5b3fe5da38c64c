"""Multi-dimensional data clustering (Z-order) for parquet layouts.

Reference counterpart: ``README.md:56`` prescribes Delta ``OPTIMIZE`` +
``ZORDER BY`` for file layout but the reference never invokes it (and the
OSS environment here has no Delta runtime).  This module is the
open-Spark analog: rewrite a table so that files are clustered along
MULTIPLE columns at once, which is what makes min/max (row-group /
file-footer) skipping effective for filters on ANY of the clustered
columns — a linear sort helps only the leading column.

How it works (all public DataFrame API, one shuffle):

  1. One tiny global agg computes each cluster column's min/max (a
     single collected row — bounded, allowed driver traffic).
  2. Each column is affine-mapped to an integer in ``[0, 2^bits)``;
     NULLs map to 0 (they cluster together at the low corner).
  3. The per-column integers are bit-interleaved into one long
     ``zvalue`` with pure JVM-side shift/or expressions (no UDF; the
     whole ladder stays inside whole-stage codegen).
  4. ``repartitionByRange(n, zvalue)`` + ``sortWithinPartitions(zvalue)``
     gives each output file a compact z-curve segment, i.e. a tight
     hyper-rectangle in the clustered dimensions.

Scale: the range exchange samples ``zvalue`` (one extra lightweight
job), then shuffles each row exactly once; sortWithinPartitions is a
spillable per-task sort.  At 100 TB this is the standard layout-rewrite
cost — O(data) with no driver materialization.  ``bits`` bounds the
interleave width: 3 columns × 20 bits = 60 bits < the long's 63.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default per-column quantization width.
DEFAULT_BITS = 16


def _quantize(col: Column, cmin, cmax, bits: int) -> Column:
    """Affine-map a column into integer [0, 2^bits); NULL → 0."""
    buckets = (1 << bits) - 1
    if cmax is None or cmin is None or cmax == cmin:
        return F.lit(0).cast("long")
    scaled = (
        (col.cast("double") - float(cmin)) / (float(cmax) - float(cmin))
    ) * F.lit(float(buckets))
    q = F.least(F.greatest(F.round(scaled).cast("long"), F.lit(0)), F.lit(buckets))
    return F.coalesce(q, F.lit(0))


def zvalue_column(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS
) -> Column:
    """Bit-interleaved Z-curve value over ``cols`` as a long Column.

    Ranges are taken from ``df`` itself via one single-row aggregate
    (min/max per column).  Bit i of column j lands at position
    ``i * n_cols + j`` — the textbook Morton interleave.
    """
    if not cols:
        raise ValueError("zvalue_column needs at least one column")
    # cluster columns must be ORDERABLE-NUMERIC (numeric / date /
    # timestamp): a string column would cast('double') to NULL for every
    # value, quantize entirely to bucket 0, and contribute NOTHING to
    # the curve — silently unclustered data, then a TypeError later in
    # clustering_report's span arithmetic.
    from pyspark.sql import types as T

    for f in df.schema.fields:
        if f.name in cols and not isinstance(
            f.dataType,
            (T.NumericType, T.DateType, T.TimestampType, T.TimestampNTZType),
        ):
            raise TypeError(
                f"z-order column {f.name!r} has non-numeric type "
                f"{f.dataType.simpleString()}; map it to a numeric rank "
                "first (e.g. a dictionary/dense_rank encoding)"
            )
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long's 62 usable bits")
    stats = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    ).collect()[0]
    quantized = [
        _quantize(F.col(c), stats[f"min_{c}"], stats[f"max_{c}"], bits)
        for c in cols
    ]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(quantized):
            bit = F.shiftright(q.bitwiseAND(F.lit(1 << i)), i)
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int | None = None,
    target_rows_per_file: int = 1_000_000,
    bits: int = DEFAULT_BITS,
) -> int:
    """Rewrite ``df`` as parquet clustered on the Z-curve of ``cols``.

    Returns the number of output files requested.  ``n_files`` defaults
    to ``ceil(rows / target_rows_per_file)`` (one count job) — at real
    scale pass ``n_files`` explicitly to skip the count.

    The temporary ``__zvalue`` column is dropped before writing, but the
    ROW ORDER it induced survives into the files — parquet footers then
    carry tight per-file/row-group min/max for every clustered column,
    which any engine (Spark parquet filter pushdown, DuckDB zone maps,
    Trino) uses to skip data on reads filtering those columns.
    """
    if n_files is None:
        n_files = max(1, math.ceil(df.count() / target_rows_per_file))
    z = df.withColumn("__zvalue", zvalue_column(df, cols, bits))
    (
        z.repartitionByRange(n_files, "__zvalue")
        .sortWithinPartitions("__zvalue")
        .drop("__zvalue")
        .write.mode("overwrite")
        .parquet(path)
    )
    return n_files


def clustering_report(path: str, cols: list[str]) -> dict[str, float]:
    """Measure layout quality: per-column mean file-range coverage.

    For each clustered column, computes ``mean((file_max - file_min)) /
    (global_max - global_min)`` across parquet files from footer
    statistics only (no data read).  1.0 ≈ every file spans the whole
    domain (no clustering); values near ``1 / n_files ** (1/n_cols)``
    indicate good multi-dimensional clustering.
    """
    import pyarrow.dataset as ds

    dataset = ds.dataset(path, format="parquet")
    per_file: list[dict[str, tuple]] = []
    for frag in dataset.get_fragments():
        frag.ensure_complete_metadata()
        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        md = frag.metadata
        if md.num_row_groups == 0:  # zero-row file: nothing to report
            per_file.append({c: (None, None) for c in cols})
            continue
        schema_names = [md.row_group(0).column(i).path_in_schema
                        for i in range(md.row_group(0).num_columns)]
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for i, name in enumerate(schema_names):
                if name not in cols:
                    continue
                st = row_group.column(i).statistics
                if st is None or not st.has_min_max:
                    continue
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
        per_file.append({c: (mins.get(c), maxs.get(c)) for c in cols})

    report: dict[str, float] = {}
    for c in cols:
        lo = min(f[c][0] for f in per_file if f[c][0] is not None)
        hi = max(f[c][1] for f in per_file if f[c][1] is not None)
        if hi == lo:
            report[c] = 0.0
            continue
        spans = [
            (f[c][1] - f[c][0]) / (hi - lo)
            for f in per_file
            if f[c][0] is not None
        ]
        report[c] = sum(spans) / len(spans)
    return report
