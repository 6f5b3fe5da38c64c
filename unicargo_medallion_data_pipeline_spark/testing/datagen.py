"""Degenerate / adversarial dataset generation for catalog robustness.

The driver's correctness gate runs every catalog query against the
well-behaved synthetic testdata.  At 100 TB the engine will also meet
the data that testdata never contains: empty tables (a filter or a
partition that matched nothing), NULLs in any nullable column
(including join keys), empty and unicode and multi-line strings,
duplicate rows, zero-valued measures (division-by-zero exposure),
massed ties (top-k determinism), empty arrays (zero-norm embeddings),
and boundary dates.  This module derives such datasets FROM the real
testdata — same schemas, same table names — so ``oracle.run_all`` can
sweep the full catalog against them with the exact driver-parity
comparison: both engines read the same mutated parquet, so every
divergence is a genuine semantic difference and every crash is a
robustness defect.

Determinism: all mutation randomness comes from ``random.Random``
seeded with a caller string — same seed, same bytes out — so failures
reproduce exactly across runs and machines.
"""

from __future__ import annotations

import datetime as _dt
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from unicargo_medallion_data_pipeline_spark.sources.readers import TESTDATA_TABLES

#: Edge-case string cells injected into every string column: empty,
#: whitespace-only, unicode (combining chars + CJK + emoji), embedded
#: quote/newline/tab (CSV-hostile), and a long repeated token.
_EDGE_STRINGS = (
    "",
    "   ",
    "naïve 東京 \U0001f680",
    'a"b\nc\td',
    "x" * 400,
)

#: Boundary timestamps safe in both engines' ranges.
_EDGE_TIMESTAMPS = (
    _dt.datetime(1971, 1, 1, 0, 0, 0),
    _dt.datetime(2099, 12, 31, 23, 59, 59),
)


#: The flight-domain fixture tables (sources/flights_fixture.py) — a
#: second sweepable table family alongside TESTDATA_TABLES.
FLIGHTS_FIXTURE_TABLES = ("flights", "airlines", "airports")


def write_empty_dataset(src_dir: str, out_dir: str, tables=TESTDATA_TABLES) -> None:
    """Write a zero-row twin of every table: identical arrow
    schema, no rows.  Models the matched-nothing case every filter and
    every partition eventually hits at scale."""
    os.makedirs(out_dir, exist_ok=True)
    for name in tables:
        path = os.path.join(src_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        schema = pq.read_schema(path).remove_metadata()
        pq.write_table(schema.empty_table(), os.path.join(out_dir, f"{name}.parquet"))


#: Non-finite doubles.  NOT part of the default sweep: the catalog's
#: finite-or-NULL contract is established at the bronze ingest boundary
#: (``scrub_nonfinite``, on by default in the medallion bronze config),
#: while the sweep's oracle comparison reads the raw tables BELOW that
#: boundary — Spark and DuckDB disagree on NaN ordering/grouping, so
#: raw non-finite cells would measure engine disagreement, not engine
#: defects.  ``tests/test_medallion.py`` covers the non-finite path by
#: running bronze over a ``nonfinite=True`` mutated dataset instead.
_NONFINITE_FLOATS = (float("nan"), float("inf"), float("-inf"))


def _mutate_column(values: list, typ: pa.DataType, rng: random.Random,
                   null_frac: float, edge_frac: float,
                   nonfinite: bool = False) -> list:
    """Overwrite a deterministic random subset of cells with NULLs and
    type-appropriate edge values."""
    n = len(values)
    out = list(values)
    float_edges = (0.0, -0.0, 1.0) + (_NONFINITE_FLOATS if nonfinite else ())
    for i in range(n):
        roll = rng.random()
        if roll < null_frac:
            out[i] = None
        elif roll < null_frac + edge_frac:
            if pa.types.is_integer(typ):
                out[i] = rng.choice((0, 1, -1 if not str(typ).startswith("u") else 2))
            elif pa.types.is_floating(typ):
                out[i] = rng.choice(float_edges)
            elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
                out[i] = rng.choice(_EDGE_STRINGS)
            elif pa.types.is_timestamp(typ):
                out[i] = rng.choice(_EDGE_TIMESTAMPS)
            elif pa.types.is_date(typ):
                out[i] = rng.choice(_EDGE_TIMESTAMPS).date()
            elif pa.types.is_list(typ) or pa.types.is_large_list(typ):
                # empty list (zero-norm embedding), all-zero vector of
                # the original length, or — r11 ADVICE — a vector with
                # NULL *elements* (same length): engines disagree on
                # NULL-element norm sums unless the universe excludes
                # such vectors explicitly on both sides.
                cur = out[i]
                choices = [[], [0.0] * len(cur) if cur else []]
                if cur:
                    holed = list(cur)
                    for j in rng.sample(range(len(holed)), min(2, len(holed))):
                        holed[j] = None
                    choices.append(holed)
                out[i] = rng.choice(choices)
            elif pa.types.is_boolean(typ):
                out[i] = rng.choice((True, False))
            # other types: leave the cell alone
    return out


def write_mutated_dataset(
    src_dir: str,
    out_dir: str,
    seed: str,
    sample_frac: float = 0.5,
    null_frac: float = 0.06,
    edge_frac: float = 0.06,
    dup_frac: float = 0.05,
    nonfinite: bool = False,
    tables=TESTDATA_TABLES,
) -> None:
    """Write an adversarial twin of every testdata table.

    Per table (deterministic in ``seed``): sample ``sample_frac`` of the
    rows, exactly duplicate ``dup_frac`` of the sample (duplicate-row
    handling), then per cell overwrite with NULL (``null_frac``) or a
    type-appropriate edge value (``edge_frac``), and finally shuffle row
    order.  Keys are NOT exempt: NULL and zeroed join keys are exactly
    the hostile inputs an inner join / groupBy must survive.
    """
    os.makedirs(out_dir, exist_ok=True)
    for name in tables:
        path = os.path.join(src_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        rng = random.Random(f"{seed}:{name}")
        t = pq.read_table(path)
        schema = t.schema.remove_metadata()
        n = t.num_rows
        keep = [i for i in range(n) if rng.random() < sample_frac]
        if not keep:  # tiny tables (region: 5 rows) must not vanish
            keep = list(range(n))
        dups = [i for i in keep if rng.random() < dup_frac]
        idx = keep + dups
        rng.shuffle(idx)
        cols = []
        for field in schema:
            values = t.column(field.name).take(pa.array(idx, type=pa.int64())).to_pylist()
            values = _mutate_column(values, field.type, rng, null_frac, edge_frac, nonfinite)
            cols.append(pa.array(values, type=field.type))
        pq.write_table(pa.Table.from_arrays(cols, schema=schema), os.path.join(out_dir, f"{name}.parquet"))
