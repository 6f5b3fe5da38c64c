"""Size guards for the exact all-pairs correctness anchors.

The catalog deliberately ships three exact O(n²) queries
(``doc_token_jaccard_pairs``, ``embedding_near_dup_pairs``,
``embedding_knn_exact``) as value-level baselines for their scalable
banded/bucketed twins.  They are correct at oracle scale and a
cluster-killer at lake scale — a 100 M-row corpus would plan a 10^16-row
cross join.  Rather than trusting every caller to read the docstring,
each anchor refuses inputs beyond :data:`ALL_PAIRS_GUARD_ROWS` with an
error naming its scalable twin.  The count is one column-pruned scan of
an input the query reads anyway; at guarded sizes (≤50k rows) it is
noise, and behavior at the driver's oracle scales (sf0.01/0.1) is
byte-identical to the unguarded plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Above this many input rows, an exact all-pairs anchor refuses to run.
#: 50k rows ≈ 1.25e9 pairs — already minutes of work; beyond it the
#: banded twins are strictly better.
ALL_PAIRS_GUARD_ROWS = 50_000


def guard_all_pairs(
    df: DataFrame,
    op: str,
    scalable_twin: str,
    max_rows: int = ALL_PAIRS_GUARD_ROWS,
) -> DataFrame:
    """Return ``df`` unchanged if it has ≤ ``max_rows`` rows, else raise
    pointing the caller at the near-linear twin of ``op``."""
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"{op} is an exact all-pairs (O(n^2)) correctness anchor and its "
            f"input has {n} rows (guard: {max_rows}). At this size use its "
            f"scalable twin instead: {scalable_twin}."
        )
    return df
