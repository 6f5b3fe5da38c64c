"""Property tests for manifest Bloom-filter skipping: under ANY keyset
and probe set — including a deliberately tiny bitmap that forces false
positives — the pruned read must equal the full-scan filter exactly
(skipping never drops a row; false positives only cost I/O)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from unicargo_medallion_data_pipeline_spark.sources import acid
from unicargo_medallion_data_pipeline_spark.sources.acid import ManifestTable

_keys = st.lists(
    st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60
)
_probes = st.lists(
    st.integers(min_value=-1200, max_value=1200), min_size=1, max_size=8
)


@settings(max_examples=15, deadline=None)
@given(keys=_keys, probes=_probes)
def test_bloom_pruned_equals_full_filter(spark, keys, probes):
    d = tempfile.mkdtemp(prefix="bloomprop_")
    try:
        t = ManifestTable(spark, os.path.join(d, "t"))
        df = spark.createDataFrame([(k, str(k)) for k in keys], "k long, v string")
        t.commit(df.repartition(4), bloom_cols=["k"])
        got = sorted(
            (r["k"], r["v"]) for r in t.read_bloom_pruned("k", probes).collect()
        )
        want = sorted((k, str(k)) for k in keys if k in set(probes))
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=10, deadline=None)
@given(keys=_keys, probes=_probes)
def test_bloom_exact_under_forced_false_positives(spark, keys, probes):
    """A 16-bit bitmap saturates almost immediately — nearly every file
    becomes a maybe-contain — yet the residual filter must keep the
    result exact.  (Skipping degrades to a no-op, never to data loss.)"""
    d = tempfile.mkdtemp(prefix="bloomfp_")
    saved = (acid._BLOOM_BITS, acid._BLOOM_HASHES)
    acid._BLOOM_BITS, acid._BLOOM_HASHES = 16, 2
    try:
        t = ManifestTable(spark, os.path.join(d, "t"))
        df = spark.createDataFrame([(k, str(k)) for k in keys], "k long, v string")
        t.commit(df.repartition(3), bloom_cols=["k"])
        got = sorted(
            (r["k"], r["v"]) for r in t.read_bloom_pruned("k", probes).collect()
        )
        want = sorted((k, str(k)) for k in keys if k in set(probes))
        assert got == want
    finally:
        acid._BLOOM_BITS, acid._BLOOM_HASHES = saved
        shutil.rmtree(d, ignore_errors=True)


def test_bloom_rejects_null_and_empty_probes(spark):
    d = tempfile.mkdtemp(prefix="bloomnull_")
    try:
        t = ManifestTable(spark, os.path.join(d, "t"))
        t.commit(
            spark.createDataFrame([(1, "a")], "k long, v string"),
            bloom_cols=["k"],
        )
        with pytest.raises(ValueError):
            t.read_bloom_pruned("k", [])
        with pytest.raises(ValueError):
            t.read_bloom_pruned("k", [1, None])
        with pytest.raises(KeyError):
            t.read_bloom_pruned("nope", [1])
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# _cmp_lt: the pruning comparator must order ANY mix of numeric
# representations (int / float / Decimal / decimal-text from JSON)
# exactly like exact decimal arithmetic — a lexicographic slip here
# silently mis-prunes files.
# ---------------------------------------------------------------------------


@given(
    a=st.one_of(
        st.integers(-10**12, 10**12),
        st.decimals(
            allow_nan=False, allow_infinity=False, places=4,
            min_value=-10**9, max_value=10**9,
        ),
    ),
    b=st.one_of(
        st.integers(-10**12, 10**12),
        st.decimals(
            allow_nan=False, allow_infinity=False, places=4,
            min_value=-10**9, max_value=10**9,
        ),
    ),
    a_as_text=st.booleans(),
    b_as_text=st.booleans(),
)
def test_cmp_lt_numeric_across_representations(a, b, a_as_text, b_as_text):
    from decimal import Decimal

    from unicargo_medallion_data_pipeline_spark.sources.acid import _cmp_lt

    want = Decimal(a) < Decimal(b)
    av = str(a) if a_as_text else a
    bv = str(b) if b_as_text else b
    # identical-type text/text pairs compare as text by design (dates);
    # only assert when at least one side is a real number
    if not (isinstance(av, str) and isinstance(bv, str)):
        assert _cmp_lt(av, bv) == want, (av, bv)
