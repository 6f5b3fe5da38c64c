"""Winnowing document fingerprints (rolling-hash k-gram selection).

The standard local fingerprinting scheme for copy/contamination
detection (Schleimer, Wilkerson, Aiken — "Winnowing: Local Algorithms
for Document Fingerprinting", SIGMOD 2003, public): hash every
character k-gram of the normalized text, slide a window of w
consecutive gram hashes, and keep each window's MINIMUM.  The selected
hash set is the document's fingerprint, with the classic guarantee:
any shared substring of length >= w + k - 1 characters yields at least
one shared fingerprint — so fingerprint-set intersection is a candidate
generator for long VERBATIM overlap, which whole-document Jaccard
(the near-dup family) does not target.

Spark-first shape: pure higher-order array expressions (transform /
slice / array_min / array_distinct) inside codegen — no UDFs, no
shuffle until the cross-document fingerprint equi-join.  Gram hashes
are md5-derived 60-bit ints (the same engine-verifiable scheme as
SimHash, ``textops/dedup.py``) so an independent engine recomputes
every fingerprint bit-for-bit; a throughput-first deployment swaps in
``xxhash64`` and a true Karp-Rabin ROLLING recurrence — both are
constant-factor optimizations of the identical selection logic.

Positions are deliberately not retained: the engine's unit of work is
candidate PAIR generation (which documents overlap); locating matched
spans is a per-pair follow-up on a handful of candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unicargo_medallion_data_pipeline_spark.textops.analysis import norm_text


def with_winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "fps",
    k: int = 8,
    w: int = 16,
) -> DataFrame:
    """Add ``out_col: array<long>`` — the distinct winnowed fingerprint
    set of the normalized text (k-char grams, window w).  Documents
    shorter than k + w - 1 chars degrade gracefully: fewer grams →
    fewer windows, floor of one window over whatever grams exist.
    Narrow maps only."""
    for tmp in ("__wn_norm", "__wn_h"):
        if tmp in df.columns:
            raise ValueError(f"input already has a {tmp!r} column")
    gram_hash = (
        f"CAST(conv(substring(md5(substring(__wn_norm, i, {k})), 1, 15), 16, 10)"
        " AS BIGINT)"
    )
    hashes = (
        f"transform(sequence(1, greatest(char_length(__wn_norm) - {k - 1}, 1)),"
        f" i -> {gram_hash})"
    )
    select_minima = (
        f"array_distinct(transform(sequence(1, greatest(size(__wn_h) - {w - 1}, 1)),"
        f" i -> array_min(slice(__wn_h, i, {w}))))"
    )
    return (
        df.withColumn("__wn_norm", norm_text(text_col))
        .withColumn("__wn_h", F.expr(hashes))
        .withColumn(out_col, F.expr(select_minima))
        .drop("__wn_norm", "__wn_h")
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 16,
    min_shared: int = 2,
    max_doc_freq: int = 50,
) -> DataFrame:
    """Document pairs sharing winnowed fingerprints — the verbatim-
    overlap candidate generator.

    Pipeline: fingerprint sets (narrow) → explode → drop STOP
    fingerprints (those appearing in more than ``max_doc_freq``
    documents — boilerplate shared by everything, which would otherwise
    make a hot fingerprint's bucket quadratic: the same skew discipline
    as the band-bucket joins) → self equi-join on the fingerprint →
    pair counts.  Returns (a_id, b_id, shared_fps, overlap) with
    a_id < b_id, ``overlap`` = shared / min(|fps_a|, |fps_b|) over the
    POST-stop-filter sets, ``shared_fps >= min_shared``."""
    # Pin the fingerprint frame (same rationale as
    # minhash_lsh_candidates' materialize flag, but worse here): it
    # feeds FIVE plan branches (doc-freq agg, kept, sizes, both pair
    # sides), and unpinned the nested higher-order md5/window-min
    # expressions are re-evaluated per branch OUTSIDE whole-stage
    # codegen — measured minutes vs ~3 s at sf0.001.  Checkpoint blocks
    # are freed by the ContextCleaner when the frame drops.
    fps = with_winnow_fingerprints(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")),
        text_col="text", out_col="fps", k=k, w=w,
    ).select("id", "fps").localCheckpoint(eager=True)
    exploded = fps.select("id", F.explode("fps").alias("fp"))
    rare = (
        exploded.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_doc_freq)
        .select("fp")
    )
    kept = exploded.join(rare, "fp")
    sizes = kept.groupBy("id").agg(F.count(F.lit(1)).alias("n_fps"))
    kept = kept.join(sizes, "id")
    a = kept.select(
        F.col("id").alias("a_id"), F.col("n_fps").alias("a_n"), "fp"
    )
    b = kept.select(
        F.col("id").alias("b_id"), F.col("n_fps").alias("b_n"), "fp"
    )
    pairs = (
        a.join(b, "fp")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            F.count(F.lit(1)).alias("shared_fps"),
            F.min(F.least("a_n", "b_n")).alias("min_n"),
        )
        .filter(F.col("shared_fps") >= min_shared)
    )
    return pairs.select(
        "a_id",
        "b_id",
        "shared_fps",
        (F.col("shared_fps").cast("double") / F.col("min_n")).alias("overlap"),
    )


def winnow_fingerprint_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 16,
) -> DataFrame:
    """``(id, fp)`` winnowed fingerprints in ROW form — the SAME
    selection as :func:`with_winnow_fingerprints` (every window's
    minimum gram hash, distinct per document; equivalence pinned by
    ``tests/test_textops.py``) re-expressed for throughput.

    Why a second form exists (r13 finding): the array form's per-window
    ``array_min(slice(...))`` runs inside an interpreted higher-order
    lambda — measured ~1 ms per window, i.e. MINUTES for a few hundred
    300-char documents.  This form keeps every operator inside codegen:
    explode the gram positions (narrow), hash each gram with a scalar
    md5 projection (whole-stage codegen), then take the sliding-window
    minimum with a doc-keyed ``min() OVER (ORDER BY pos ROWS BETWEEN
    CURRENT ROW AND w-1 FOLLOWING)`` (WindowExec, codegen'd frame) and
    keep the positions the array form keeps (1 .. max(n_grams-w+1, 1);
    the trailing partial windows are exactly what the frame clamp
    produces, so short documents degrade identically).

    Cost shape: one doc-keyed shuffle of the gram-hash rows (the window
    needs a document's grams co-located and ordered).  At lake scale
    that shuffle moves ~(chars x 8B) per doc — still the right trade:
    the interpreted array form is two orders of magnitude more CPU, and
    CPU is the contended resource on a fingerprinting pass."""
    from pyspark.sql import Window as W

    for tmp in ("__wn_n", "__wn_len", "__wn_i", "__wn_h"):
        if tmp in docs.columns:
            raise ValueError(f"input already has a {tmp!r} column")
    n = docs.select(F.col(id_col).alias("id"), norm_text(text_col).alias("__wn_n"))
    grams = n.select(
        "id",
        F.expr("char_length(__wn_n)").alias("__wn_len"),
        F.col("__wn_n"),
        F.explode(
            F.expr(f"sequence(1, greatest(char_length(__wn_n) - {k - 1}, 1))")
        ).alias("__wn_i"),
    ).select(
        "id",
        "__wn_len",
        "__wn_i",
        F.expr(
            f"CAST(conv(substring(md5(substring(__wn_n, __wn_i, {k})), 1, 15),"
            " 16, 10) AS BIGINT)"
        ).alias("__wn_h"),
    )
    frame = W.partitionBy("id").orderBy("__wn_i").rowsBetween(W.currentRow, w - 1)
    n_windows = F.greatest(
        F.greatest(F.col("__wn_len") - F.lit(k - 1), F.lit(1)) - F.lit(w - 1),
        F.lit(1),
    )
    return (
        grams.withColumn("fp", F.min("__wn_h").over(frame))
        .filter(F.col("__wn_i") <= n_windows)
        .select("id", "fp")
        .distinct()
    )
