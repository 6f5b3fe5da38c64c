"""PII detection & redaction for pre-training corpora (north-star surface).

Pure Column expressions over Spark's JVM regex engine — a narrow map per
row, no shuffle, no UDFs: at lake scale redaction runs at parquet-scan
throughput.

Pattern policy: every pattern stays inside the common deterministic
subset of Java regex (Spark) and RE2 (DuckDB, the oracle engine) —
character classes, bounded repetition, ``\\d``/``\\b``, non-capturing
groups; no backreferences, no lookaround.  Within that subset greedy
matching picks the same leftmost match in both engines, so the oracle
can recompute match counts and the md5 of the redacted text exactly.

Reference parity: the reference pipeline has no PII surface; this module
extends it for training-data curation per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (kind, pattern, replacement) — applied in order.  Email first so the
#: phone pattern cannot eat an address's digit runs; SSN before phone so
#: a 3-2-4 digit group is labelled specifically.
#:
#: The phone pattern requires PHONE-LIKE GROUPING — optional +CC, then
#: 3-4 / 3 / 4 digit groups — not just "8+ digits with dashes": the
#: naive class form also matched every ISO date ('2015-01-01'), spaced
#: thousands ('1 000 000 000'), and dotted versions, silently redacting
#: dates corpus-wide.  4-2-2 (dates) and bare 8-digit runs cannot
#: satisfy the 3/4-digit group minimums.  The leading alternation
#: anchors the match START (a '+CC' prefix, a literal '(', or a word
#: boundary before the first digit): without it the engine starts
#: MID-RUN and redacts the tail of any 10+ digit run (ISBNs, card
#: numbers, epoch timestamps).  A bare ``\b`` prefix cannot do this —
#: '+' and '(' are non-word, so ``\b`` before them never matches after
#: a space.  Lookaround stays banned: this must run identically on
#: Java regex and RE2 (cross-engine pinned in tests).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (
        "phone",
        r"(?:\+\d{1,3}[ .-]?\(?|\(|\b)\d{3,4}\)?[ .-]?\d{3}[ .-]?\d{4}\b",
        "<PHONE>",
    ),
)


def redact_pii(col: str | Column = "text") -> Column:
    """Text with every PII match replaced by its typed placeholder."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def pii_count(kind: str, col: str | Column = "text") -> Column:
    """Match count for one PII kind, taken on the text with every
    EARLIER pattern already redacted — exactly mirroring the sequential
    semantics of ``redact_pii``, so each kind counts the matches its
    replacement actually consumes.  Counting every kind on the original
    text instead would double-count overlaps — e.g. the digits of a
    phone number embedded in an email's local part are consumed by the
    email redaction first and must not also count as a phone.  (The
    current phone pattern no longer matches SSN-shaped 3-2-4 groupings,
    but the sequential contract is what keeps EVERY such overlap class
    correct, so keep counting on the redacted-so-far text.)"""
    c = F.col(col) if isinstance(col, str) else col
    for k, pattern, repl in PII_PATTERNS:
        if k == kind:
            return F.regexp_count(c, F.lit(pattern))
        c = F.regexp_replace(c, pattern, repl)
    raise KeyError(kind)
