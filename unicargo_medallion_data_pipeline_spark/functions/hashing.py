"""Hash/order type guards shared by every full-row-hash site.

Spark's hash family (``xxhash64``/``hash``) and its sort order both
reject MapType — and VariantType — at analysis time, so any operator
that hashes or orders by "all columns" of a CALLER-supplied frame
breaks on the first map-carrying schema.  Round 8 fixed one such site
(the CDC no-`_seq` tiebreak); round 9's hunt found the same latent
class in the streaming merge tiebreak, the compaction bucket id, and
the skew salt.  This module is the single definition they all share.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def xxhashable(dt) -> bool:
    """True iff ``xxhash64`` accepts the type (equivalently: the type is
    orderable) — MapType, VariantType, and anything nesting one fail
    analysis in both the hash family and sort orders."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType) or dt.typeName() == "variant":
        return False
    if isinstance(dt, T.ArrayType):
        return xxhashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(xxhashable(f.dataType) for f in dt.fields)
    return True


def hashable_cols(df: DataFrame, exclude: tuple[str, ...] = ()) -> list[str]:
    """Names of ``df``'s hashable/orderable columns, minus ``exclude``."""
    return [
        f.name
        for f in df.schema.fields
        if f.name not in exclude and xxhashable(f.dataType)
    ]


def row_hash(df: DataFrame, exclude: tuple[str, ...] = ()) -> Column:
    """Deterministic full-row xxhash64 that tolerates unhashable columns:
    hashes the hashable columns directly (fast path, identical to the
    historical ``xxhash64(*all)`` whenever no map/variant is present);
    an all-unhashable row falls back to hashing its JSON rendering.

    Limitation inherited by every caller: rows differing ONLY in
    unhashable columns share a hash value on the fast path — acceptable
    for salts/buckets/tiebreaks, where a shared value costs balance or
    an arbitrary-but-deterministic pick, never correctness.
    """
    cols = hashable_cols(df, exclude)
    if cols:
        return F.xxhash64(*[F.col(c) for c in cols])
    keep = [c for c in df.columns if c not in exclude]
    return F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in keep])))
