"""Python UDTF (user-defined table function) support: sentence splitting.

Spark 4's Python UDTFs are the table-valued escape hatch alongside the
row-valued ``pandas_udf`` family: one input row expands to N output rows
through a generator, invoked from SQL as a LATERAL join.  The engine's
catalog stays expression-only (``doc_chunking`` does window chunking with
``posexplode``), but UDTFs are part of the public API surface a Spark
user expects, so the capability is implemented and differentially tested
against the equivalent expression plan (``tests/test_udtf.py``).

Scale posture: a UDTF runs one Python worker per task — per-partition
parallelism is preserved and no shuffle is introduced, but each row
crosses the JVM->Python boundary (Arrow-batched here).  Prefer the
expression form when one exists; reach for a UDTF only for genuinely
imperative row expansion (recursive parsers, stateful tokenizers).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

#: Sentence delimiter mirrored by the expression twin in tests:
#: split on ". " over the canonical normalized text (textops.analysis
#: ``norm_text``: lowercase, collapsed whitespace, trimmed).
_DELIM = ". "


@udtf(returnType="sentence_idx int, sentence string")
class SentenceSplitter:
    """Split a document into (sentence_idx, sentence) rows.

    Normalizes exactly like ``textops.analysis.norm_text`` (lowercase,
    whitespace collapse, trim), splits on ``". "``, and drops empty
    fragments.  NULL text yields no rows (matches LATERAL + explode
    semantics for NULL arrays).
    """

    def eval(self, text):  # noqa: ANN001 — UDTF signature is positional
        if text is None:
            return
        # ASCII-whitespace split ONLY: norm_text's Java '\s+' is
        # ASCII-scoped, while Python str.split() also breaks on Unicode
        # whitespace (NBSP, ideographic space — ubiquitous in scraped
        # web text), which would silently violate the "normalizes
        # exactly like norm_text" contract above.
        norm = " ".join(
            t for t in re.split("[ \\t\\n\\x0b\\f\\r]+", text.lower()) if t
        )
        idx = 0
        for frag in norm.split(_DELIM):
            if frag:
                yield idx, frag
                idx += 1


def register_sentence_splitter(spark) -> str:
    """Register the UDTF for SQL use; returns the function name.

    Usage::

        spark.sql(\"\"\"
          SELECT d.doc_id, s.sentence_idx, s.sentence
          FROM docs d, LATERAL split_sentences(d.text) s
        \"\"\")
    """
    spark.udtf.register("split_sentences", SentenceSplitter)
    return "split_sentences"
