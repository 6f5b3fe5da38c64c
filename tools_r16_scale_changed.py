#!/usr/bin/env python
"""10x structure-preserving scale sweep of every query CHANGED in r16
(the zero-debt cadence, r15 verdict task 8) — bench_scale's machinery
with the changed-query list.  Prints ONE JSON line; commit as
docs/SCALE10X_r16_changed.json."""
import sys

import bench_scale

bench_scale.QUERIES = [
    "doc_minhash_incremental_near_dups",
    "doc_duplicate_ngram_rate",
    "scd2_as_of_snapshot",
    "embedding_pq_adc_knn",
    "embedding_pq_rerank_knn",
    "embedding_ivfadc_knn",
    "embedding_knn_ivf",
    "embedding_knn_ivf_incremental",
    "embedding_knn_lsh",
    "embedding_hard_negatives",
    "embedding_mutual_nn_pairs",
    "embedding_knn_label_accuracy",
    "embedding_rrf_fusion",
]

if __name__ == "__main__":
    sys.argv = [sys.argv[0], "--replicas", "10", *sys.argv[1:]]
    bench_scale.main()
