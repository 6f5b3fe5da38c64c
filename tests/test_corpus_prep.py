"""Randomized differential tests for the corpus-prep operators: the
engine's array-expression / window implementations vs brute-force
pure-Python references over a seeded random corpus."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _random_corpus(rng: random.Random, n_docs: int = 200):
    rows = []
    for i in range(n_docs):
        n = rng.randrange(1, 30)
        # skew the draw so repeats are common (exercises the multiplicity
        # logic) and sprinkle multi-space/captialization noise the
        # normalizer must absorb
        toks = [rng.choice(VOCAB[: rng.randrange(1, len(VOCAB))]) for _ in range(n)]
        text = "  ".join(t.upper() if rng.random() < 0.2 else t for t in toks)
        lang = rng.choice(["en", "de", "fr"])
        rows.append((i, text, lang, toks))
    return rows


def test_repetition_signals_randomized(spark):
    from unicargo_medallion_data_pipeline_spark.textops import analysis as ta

    rng = random.Random(7)
    rows = _random_corpus(rng)
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in rows], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            ta.max_element_count(ta.tokens("text")).alias("top"),
            ta.max_element_count(ta.bigrams("text")).alias("top_bg"),
            ta.duplicated_instance_count(ta.bigrams("text")).alias("dup_bg"),
            F.size(ta.bigrams("text")).alias("nbg"),
        ).collect()
    }
    for i, _, _, toks in rows:
        toks = [t.lower() for t in toks]
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        top = max(toks.count(t) for t in set(toks))
        assert got[i]["top"] == top, i
        assert got[i]["nbg"] == len(bgs), i
        if bgs:
            assert got[i]["top_bg"] == max(bgs.count(b) for b in set(bgs)), i
            assert got[i]["dup_bg"] == sum(
                bgs.count(b) for b in set(bgs) if bgs.count(b) >= 2
            ), i
        else:
            assert got[i]["top_bg"] == 0 and got[i]["dup_bg"] == 0, i


def test_shard_packing_randomized(spark):
    from unicargo_medallion_data_pipeline_spark.textops import analysis as ta
    from pyspark.sql import Window

    rng = random.Random(11)
    rows = _random_corpus(rng)
    budget = 17  # tiny budget → many shard boundaries / straddles
    df = spark.createDataFrame(
        [(i, t, lang) for i, t, lang, _ in rows], "doc_id int, text string, lang string"
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = df.select("doc_id", "lang", ta.token_count("text").alias("n"))
    packed = sized.withColumn(
        "start", F.sum(F.col("n").cast("long")).over(w) - F.col("n")
    ).select(
        "doc_id",
        "lang",
        "n",
        F.expr(f"CAST(start DIV {budget} AS BIGINT)").alias("shard"),
        F.expr(f"CAST(start % {budget} AS BIGINT)").alias("off"),
    )
    got = {r["doc_id"]: r for r in packed.collect()}

    cum: dict[str, int] = {}
    for i, _, lang, toks in sorted(rows):
        start = cum.get(lang, 0)
        r = got[i]
        assert r["n"] == len(toks), i
        assert (r["shard"], r["off"]) == (start // budget, start % budget), i
        cum[lang] = start + len(toks)


def test_pii_redaction_is_idempotent_and_total(spark):
    """redact(redact(x)) == redact(x) (placeholders never re-match), and
    no raw pattern survives a redaction pass — on adversarial synthetic
    rows mixing every kind."""
    from unicargo_medallion_data_pipeline_spark.textops.pii import (
        PII_PATTERNS,
        pii_count,
        redact_pii,
    )

    rng = random.Random(13)
    kinds = [
        lambda: f"user{rng.randrange(99)}@host{rng.randrange(9)}.com",
        lambda: f"{rng.randrange(100,999)}-{rng.randrange(10,99)}-{rng.randrange(1000,9999)}",
        lambda: f"+1 {rng.randrange(200,999)} {rng.randrange(200,999)} {rng.randrange(1000,9999)}",
        lambda: rng.choice(VOCAB),
    ]
    rows = [
        (i, " ".join(rng.choice(kinds)() for _ in range(rng.randrange(1, 8))))
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    once = df.select("id", redact_pii("text").alias("r1"))
    twice = once.select(
        "id",
        "r1",
        redact_pii(F.col("r1")).alias("r2"),
        *[pii_count(k, F.col("r1")).alias(f"n_{k}") for k, _, _ in PII_PATTERNS],
    )
    for r in twice.collect():
        assert r["r1"] == r["r2"], f"not idempotent: {r['r1']!r}"
        for k, _, _ in PII_PATTERNS:
            assert r[f"n_{k}"] == 0, f"survivor {k} in {r['r1']!r}"
