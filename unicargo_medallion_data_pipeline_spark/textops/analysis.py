"""Text analysis: tokenization, quality scoring, language ID, fingerprints.

All pure Column expressions (whole-stage codegen; no UDFs): at 100 TB these
run as a single narrow map over the documents scan — no shuffle at all
until an aggregation asks for one.

Cross-engine determinism: token counts / lengths are exact integers; ratio
scores are single IEEE divisions of exact integers; fingerprints are md5
hex (identical on any engine).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny deterministic stopword sets used for quality scoring and language
#: ID.  Deliberately small and frozen: they are part of the engine's
#: contract (the oracle mirrors them literally).
STOPWORDS_EN = ("the", "and", "of", "to", "in", "a", "is", "for", "on", "with")
MARKERS = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "una", "y"),
}


def norm_text(col: str | Column = "text") -> Column:
    """Canonical text normalization: lowercase, collapse whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(norm_text(col), " ")


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: str | Column = "text") -> Column:
    return F.size(F.array_distinct(tokens(col)))


def stopword_count(col: str | Column = "text", stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(col), lambda x: F.array_contains(sw, x)))


def punct_count(col: str | Column = "text") -> Column:
    """Count of characters in a fixed punctuation set."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, r"[.,!?;:]", ""))


def fingerprint(col: str | Column = "text") -> Column:
    """Exact-dup document fingerprint: md5 of the normalized text."""
    return F.md5(norm_text(col))


def quality_score(col: str | Column = "text") -> Column:
    """Composite [0,1] quality score from length / punctuation / stopword
    signals (the classic pre-training heuristics).  All terms are IEEE
    divisions of exact integers → deterministic.
    """
    n_tok = token_count(col).cast("double")
    # n_tok is never 0 (split('') yields ['']), but n_chars is 0 for an
    # empty document — unguarded, one empty doc kills the whole job
    # under Spark 4's default ANSI divide-by-zero (punct is 0 there, so
    # the clamp leaves the ratio at exactly 0).
    n_chars = F.greatest(
        F.length(F.col(col) if isinstance(col, str) else col).cast("double"),
        F.lit(1.0),
    )
    sw_ratio = stopword_count(col).cast("double") / n_tok
    punct_ratio = punct_count(col).cast("double") / n_chars
    length_term = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    return (
        F.lit(0.4) * length_term + F.lit(0.3) * (F.lit(1.0) - punct_ratio) + F.lit(0.3) * sw_ratio
    )


def marker_count(lang: str, col: str | Column = "text") -> Column:
    """How many tokens are markers of ``lang`` (language-ID n-gram heuristic)."""
    sw = F.array(*[F.lit(s) for s in MARKERS[lang]])
    return F.size(F.filter(tokens(col), lambda x: F.array_contains(sw, x)))


def cjk_char_count(col: str | Column = "text") -> Column:
    """Count of CJK-Unified-block characters.  The replace REMOVES
    everything NON-CJK, so the kept length IS the count — subtracting it
    from the total (punct_count's shape, whose class is un-negated)
    would invert this into a non-CJK count and classify every document
    with one ASCII char as 'zh'."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, "[^一-鿿]", ""))


def predicted_lang(col: str | Column = "text") -> Column:
    """Deterministic argmax over marker counts (ties broken by the fixed
    chain order zh > en > de > fr > es)."""
    zh = cjk_char_count(col)
    counts = {lang: marker_count(lang, col) for lang in MARKERS}
    expr = F.when(zh > 0, "zh")
    # >= against all later languages: an earlier language WINS ties
    # (the documented fixed-chain tiebreak — all-zero marker counts
    # resolve to 'en', and changing this flips results corpus-wide)
    order = ["en", "de", "fr", "es"]
    for i, lang in enumerate(order[:-1]):
        cond = F.lit(True)
        for other in order[i + 1 :]:
            cond = cond & (counts[lang] >= counts[other])
        expr = expr.when(cond, lang)
    return expr.otherwise(order[-1])


def bigrams_of(toks: Column) -> Column:
    """Adjacent token bigrams from an ALREADY-MATERIALIZED token array
    (array<string>; empty for 1-token docs).

    ``toks`` must be a column attribute, not a raw ``split(...)``
    expression: ``element_at`` over an unmaterialized expression
    re-evaluates it on every access, turning the per-doc cost from
    O(n) indexing into O(n²) re-splitting (measured 16× on the 5-gram
    analogue, plans/analytics_gold3.py).

    Guarded by IF(n>=2,...): Spark's ``sequence(1, 0)`` would COUNT DOWN
    ([1, 0]) rather than produce an empty range.
    """
    n = F.size(toks)
    pairs = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    return F.when(n >= 2, pairs).otherwise(F.array().cast("array<string>"))


def bigrams(col: str | Column = "text") -> Column:
    """Adjacent token bigrams straight from a text column.  Convenience
    form for small frames/tests; hot paths should materialize
    ``tokens(col)`` into a projection first and call ``bigrams_of`` on
    the attribute (see its docstring for the quadratic-access hazard)."""
    return bigrams_of(tokens(col))


def max_element_count(arr: Column) -> Column:
    """Highest multiplicity of any element in ``arr`` (0 for empty).

    O(|distinct| · |arr|) per row as a pure codegen'd array expression —
    the right trade for documents (tokens ≪ 10^4); no shuffle, unlike a
    posexplode + groupBy mode computation.
    """
    counts = F.transform(
        F.array_distinct(arr), lambda t: F.size(F.filter(arr, lambda x: x == t))
    )
    return F.coalesce(F.array_max(counts), F.lit(0))


def duplicated_instance_count(arr: Column) -> Column:
    """How many elements of ``arr`` belong to a value occurring ≥ 2 times
    (the numerator of Gopher-style duplicate-n-gram fractions)."""
    per_distinct = F.transform(
        F.array_distinct(arr), lambda t: F.size(F.filter(arr, lambda x: x == t))
    )
    return F.aggregate(
        per_distinct,
        F.lit(0),
        lambda acc, c: acc + F.when(c >= 2, c).otherwise(F.lit(0)),
    )


def md5_int60(col: str | Column = "text", salt: str = "") -> Column:
    """60-bit nonnegative integer from a (salted) md5 prefix — 15 hex
    digits, exact in both engines' signed int64.  The deterministic
    pseudo-randomness primitive behind sampling buckets, train/val/test
    splits, and weighted-sampling keys.  MUST stay bitwise-lockstep
    with :func:`sql_md5_int60` (defined adjacently on purpose — the
    pair replaces four hand-copied expression/SQL sites that had to be
    edited in lockstep by discipline alone)."""
    c = F.col(col) if isinstance(col, str) else col
    if salt:
        c = F.concat(F.lit(salt), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_md5_int60(expr: str = "text", salt: str = "") -> str:
    """DuckDB mirror of :func:`md5_int60` — same salt, same 15-hex-digit
    prefix, same int64 value."""
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"CAST(('0x' || substr(md5({inner}), 1, 15)) AS BIGINT)"
