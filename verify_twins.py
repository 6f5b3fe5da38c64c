#!/usr/bin/env python
"""Engine-internal differential verification at scales the DuckDB
oracle cannot reach.

The ~10 all-pairs-oracle queries are value-verified at sf0.01 (the
driver's gate) but their DuckDB mirrors are O(n²) and intractable at
sf0.1 (docs/COVERAGE.md round-9 ledger).  Several of them have LOSSLESS
TWINS inside the engine — independent Spark plans whose outputs are
provably identical:

  * doc_minhash_near_dups ≡ doc_prefix_filter_neardups — same shingles,
    same threshold; banding has recall 1 on this corpus (bimodal pair
    distribution, P(miss) ≈ 8e-8), prefix filtering has recall 1 by
    theorem.
  * doc_token_jaccard_pairs ≡ doc_prefix_filter_jaccard — guarded exact
    all-pairs vs its lossless prefix-filter twin (Bayardo WWW'07).
  * doc_simhash_clusters ≡ brute-force Hamming over the same
    fingerprints — the 4-chunk banding is lossless for threshold ≤ 3
    by pigeonhole; the brute force recomputes candidates from nothing.

Comparing twin outputs row-for-row at sf0.1 is therefore a FULL value
check of each pair executed through entirely different physical plans —
the cross-engine oracle's role, played by plan diversity instead of
engine diversity.

Prints one JSON line: {"metric": "twin_equivalence", "sf": ...,
"pairs": {name: {"rows": n, "equal": true}}, "all_equal": true}.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _canon(df, cols):
    """Order-insensitive canonical rows (rounded doubles survive the
    float-vs-double column type differences between twin plans)."""
    out = []
    for r in df.select(*cols).collect():
        out.append(tuple(round(v, 9) if isinstance(v, float) else v for v in r))
    return sorted(out)


def run_pairs(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from unicargo_medallion_data_pipeline_spark.plans.all import CATALOG
    from unicargo_medallion_data_pipeline_spark.sources.readers import load_table
    from unicargo_medallion_data_pipeline_spark.textops import dedup as dd
    from unicargo_medallion_data_pipeline_spark.textops.util import ensure_parallelism

    results: dict = {}

    def compare(name, a_df, b_df, cols):
        a, b = _canon(a_df, cols), _canon(b_df, cols)
        results[name] = {"rows": len(a), "equal": a == b}
        if a != b:
            only_a = set(a) - set(b)
            only_b = set(b) - set(a)
            results[name]["only_a"] = len(only_a)
            results[name]["only_b"] = len(only_b)

    compare(
        "minhash_vs_prefix_filter",
        CATALOG["doc_minhash_near_dups"].fn(spark, sf_dir),
        CATALOG["doc_prefix_filter_neardups"].fn(spark, sf_dir),
        ["a_id", "b_id", "jaccard"],
    )
    compare(
        "allpairs_vs_prefix_filter",
        CATALOG["doc_token_jaccard_pairs"].fn(spark, sf_dir),
        CATALOG["doc_prefix_filter_jaccard"].fn(spark, sf_dir),
        ["a_id", "b_id", "jaccard"],
    )

    # simhash: banded candidates vs brute-force Hamming over the SAME
    # fingerprint column (independent candidate generation).
    d = load_table(spark, sf_dir, "documents")
    fp = (
        ensure_parallelism(d)
        .select("doc_id", dd.simhash60("text").alias("simhash"))
        .localCheckpoint(eager=True)
    )
    a = fp.select(F.col("doc_id").alias("a_id"), F.col("simhash").alias("a_sim"))
    b = fp.select(F.col("doc_id").alias("b_id"), F.col("simhash").alias("b_sim"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            dd.hamming64(F.col("a_sim"), F.col("b_sim")).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )
    compare(
        "simhash_banded_vs_bruteforce",
        CATALOG["doc_simhash_clusters"].fn(spark, sf_dir),
        brute,
        ["a_id", "b_id", "hamming"],
    )
    return results


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from unicargo_medallion_data_pipeline_spark.session import get_spark

    spark = get_spark("verify-twins")
    spark.sparkContext.setLogLevel("ERROR")
    pairs = run_pairs(spark, sf_dir)
    all_equal = all(p["equal"] for p in pairs.values())
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "twin_equivalence",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "pairs": pairs,
                "all_equal": all_equal,
            }
        )
    )
    return 0 if all_equal else 1


if __name__ == "__main__":
    sys.exit(main())
