"""KMV (bottom-k / K-Minimum-Values) distinct sketch primitives.

The "hash" is a modular affine permutation h(u) = (A·(u mod P) + B) mod P
over the Mersenne prime P = 2³¹ − 1: pure BIGINT arithmetic that Spark
AND DuckDB evaluate bit-identically (A·(u mod P) < 2⁶², no overflow), so
sketches built here carry FULL value-level oracles — unlike engine hash
builtins (xxhash64, md5-to-int) which differ across engines, and unlike
HLL registers which no second engine can replay.

Mergeability is structural: the bottom-k of a union equals the bottom-k
of the union of per-part bottom-k's — any id among the k globally
smallest hashes has fewer than k ids below it within its own part, so it
survives every per-part cut.  That makes (grain → k smallest (h, id)
rows) a MERGEABLE SUMMARY table: a 100 TB lake stores |grains|·k tiny
rows and answers "distinct ids over any grain subset" by re-cutting the
union of those rows — never rescanning facts.  Estimator (Bar-Yossef et
al., RANDOM'02): if the sketch saturates (holds exactly k rows), the
distinct count ≈ (k−1)·P / h_(k); below saturation the sketch IS the
exact id set.

Catalog front-door: events_kmv_distinct_rollup (plans/assoc_gold.py,
value-level oracle at 3 SFs).  Streaming maintenance:
streaming/sketch.py (incremental sketch table via foreachBatch +
ManifestTable commits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

KMV_P = 2_147_483_647
KMV_A = 1_103_515_245
KMV_B = 12_345
KMV_K = 64


def kmv_hash(col: Column) -> Column:
    """Affine permutation hash into [0, P) — exact BIGINT arithmetic.

    ``pmod`` (not ``%``) keeps the documented [0, P) range for NEGATIVE
    ids too: ``%`` keeps the dividend's sign in both Spark and DuckDB,
    which would push negative ids into (−P, 0) and make the saturated
    estimator (k−1)·P / h_k negative/undefined.  The matching oracle SQL
    uses ``((u % P) + P) % P`` (DuckDB has no pmod builtin).  No
    overflow: pmod(u, P) < P = 2³¹−1, so A·pmod + B < 2⁶² < 2⁶³."""
    return F.pmod(
        F.lit(KMV_A) * F.pmod(col, F.lit(KMV_P)) + F.lit(KMV_B), F.lit(KMV_P)
    )


def kmv_bottom_k(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    k: int = KMV_K,
    hash_col: str = "h",
) -> DataFrame:
    """Per-``key_cols`` grain, the k smallest (hash, id) rows of the
    distinct ``id_col`` values — the sketch rows.  Deterministic: ties
    on the hash break on the id.  One dedup exchange + one window over
    grain-sized partitions; output is ≤ |grains|·k rows.

    NULL ids are EXCLUDED (COUNT DISTINCT semantics, same as
    :func:`bitmap_grain`): ``kmv_hash(NULL)`` is NULL, which the
    ascending window sorts FIRST — a null would occupy a bottom-k slot,
    off-by-one the unsaturated count, and displace a real k-th hash in
    the saturated estimator.
    """
    from pyspark.sql import types as T

    dt = df.schema[id_col].dataType
    if not isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise TypeError(
            f"kmv_bottom_k requires an INTEGRAL id column; {id_col!r} is "
            f"{dt.simpleString()} — a non-numeric id would implicitly cast "
            "to NULL hashes that fill bottom-k slots and NULL the "
            "saturated estimator silently.  Hash non-integral ids first "
            "(e.g. xxhash64)."
        )
    if hash_col in (*key_cols, id_col):
        raise ValueError(
            f"hash_col {hash_col!r} collides with a key/id column — "
            "withColumn would silently overwrite it"
        )
    if k < 2:
        raise ValueError(
            "kmv bottom-k needs k >= 2: at k=1 a single id hashing to 0 "
            "makes the saturated estimator (k-1)*P/h_k divide by zero "
            "(for k >= 2 the affine hash is injective, so h_k >= k-1 >= 1)"
        )
    ids = (
        df.select(*key_cols, id_col)
        .filter(F.col(id_col).isNotNull())
        .distinct()
        .withColumn(hash_col, kmv_hash(F.col(id_col)))
    )
    w = Window.partitionBy(*key_cols).orderBy(hash_col, id_col)
    return (
        ids.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate(df: DataFrame, key_cols: list[str], k: int = KMV_K) -> DataFrame:
    """Collapse sketch rows to one estimate row per grain: exact count
    when the sketch is unsaturated, (k−1)·P/h_(k) when saturated."""
    agg = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("sketch_rows"),
        F.max("h").cast("bigint").alias("kth_hash"),
    )
    est = F.when(
        F.col("sketch_rows") < k, F.col("sketch_rows").cast("double")
    ).otherwise(F.lit(float((k - 1) * KMV_P)) / F.col("kth_hash").cast("double"))
    return agg.select(*key_cols, "sketch_rows", "kth_hash", est.alias("distinct_est"))
