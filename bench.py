#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

Usage:
  python bench.py                # full headline suite
  python bench.py --scaling      # extraction at local[8] vs local[32]
                                 # (north-rule scaling-efficiency evidence)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SYNTH_DOCS = int(os.environ.get("BENCH_SYNTH_DOCS", "3000"))


def _session(cpus):
    from go_readability_spark.plans import build_session

    return build_session(master=f"local[{cpus}]", app_name="bench",
                         **{"spark.sql.shuffle.partitions": str(max(8, int(cpus)))})


def _count(df):
    return df.count()


def bench_queries(spark):
    from pyspark.sql import functions as F

    from go_readability_spark.functions import with_text_features
    from go_readability_spark.operators import (
        brute_force_topk,
        minhash_dedup_pairs,
    )
    from go_readability_spark.plans import extract_pages
    from go_readability_spark.sources import pages_from_documents, synth_pages_distributed

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def q_extract_documents():
        pages = pages_from_documents(spark, SF_DIR)
        return _count(extract_pages(pages, n_buckets=256))

    def q_extract_synth():
        pages = synth_pages_distributed(spark, SYNTH_DOCS, seed=42, skew=True,
                                        num_partitions=int(CPUS))
        return _count(extract_pages(pages, n_buckets=256))

    def q_text_features():
        return _count(with_text_features(docs, "text"))

    def q_minhash_dedup():
        return _count(minhash_dedup_pairs(docs, threshold=0.5))

    def q_ann_topk():
        queries = emb.where(F.col("vec_id") < 20)
        return _count(brute_force_topk(emb, queries, k=10))

    return {
        "extract_documents": (q_extract_documents, None),
        "extract_synth": (q_extract_synth, SYNTH_DOCS),
        "text_features": (q_text_features, None),
        "minhash_dedup": (q_minhash_dedup, None),
        "ann_topk": (q_ann_topk, None),
    }


def run_suite():
    spark = _session(CPUS)
    try:
        timings = {}
        doc_counts = {}
        for name, (fn, n_docs) in bench_queries(spark).items():
            t0 = time.time()
            n = fn()
            timings[name] = round(time.time() - t0, 3)
            doc_counts[name] = n_docs or n
        total = round(sum(timings.values()), 3)
        extract_rate = round(doc_counts["extract_synth"] / timings["extract_synth"], 2)
        print(json.dumps({
            "metric": "readability extraction + corpus-ops wall time",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": SF_DIR.rstrip("/").split("sf")[-1],
            "docs_per_sec": extract_rate,
            "cpus": int(CPUS),
        }))
    finally:
        spark.stop()


def run_scaling():
    """North-rule scaling evidence: identical extraction job on the same
    deterministic corpus at two parallelism levels (local[8] vs local[32]
    stands in for N vs 4N executors in this sandbox)."""
    from go_readability_spark.plans import extract_pages
    from go_readability_spark.sources import synth_pages_distributed

    n_docs = int(os.environ.get("BENCH_SCALING_DOCS", "3000"))
    results = {}
    for cpus in (8, 32):
        spark = _session(cpus)
        try:
            pages = synth_pages_distributed(spark, n_docs, seed=42, skew=True,
                                            num_partitions=64)
            pages.count()  # warm input generation path
            t0 = time.time()
            n = extract_pages(pages, n_buckets=256, num_partitions=64).count()
            dt = time.time() - t0
            results[cpus] = {"sec": round(dt, 2), "docs_per_sec": round(n / dt, 2)}
        finally:
            spark.stop()
    speedup = results[32]["docs_per_sec"] / results[8]["docs_per_sec"]
    efficiency = speedup / 4.0
    print(json.dumps({
        "metric": "extraction scaling efficiency local[8] -> local[32]",
        "value": round(efficiency, 3),
        "unit": "efficiency",
        "n_docs": n_docs,
        "local8": results[8],
        "local32": results[32],
        "speedup": round(speedup, 2),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        run_suite()
