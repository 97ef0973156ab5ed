#!/usr/bin/env python
"""Training-data dedup toolkit example: exact -> n-gram Jaccard ->
MinHash LSH -> SimHash -> clusters over one corpus, plus embedding ANN."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from go_readability_spark.operators import (
    brute_force_topk,
    duplicate_clusters,
    exact_duplicates,
    ivf_topk,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_table,
    train_ivf_centroids,
)
from go_readability_spark.plans import build_session

spark = build_session(master="local[8]")
docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

print("exact dup groups :", exact_duplicates(docs).count())
pairs = ngram_jaccard_pairs(docs, threshold=0.5)
print("jaccard pairs    :", pairs.count())
print("minhash pairs    :", minhash_dedup_pairs(docs, threshold=0.5).count())
print("simhash pairs    :", simhash_near_pairs(simhash_table(docs), max_hamming=3).count())
print("dup clusters     :", duplicate_clusters(pairs).count())

queries = emb.where("vec_id < 3")
print("brute-force top-5:", brute_force_topk(emb, queries, k=5).count())
cents = train_ivf_centroids(emb, dim=64, k=8, iterations=2)
print("ivf top-5        :", ivf_topk(emb, queries, cents, k=5, nprobe=3).count())
spark.stop()
