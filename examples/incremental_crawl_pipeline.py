#!/usr/bin/env python
"""Long-lived incremental crawl example: the segment-by-segment lifecycle
the round-6 pieces compose —

  per segment:
    crawl-plan against the persistent seen-URL Bloom store
      ──▶ fetch + (readerable pre-gate) + extract
      ──▶ record fetched urls into the Bloom store
      ──▶ probe the segment against the stored near-dedup index
            (CacheScope releases the operators' internal persists)
      ──▶ append the accepted segment's banding to the index
  on cadence:
    compact_index re-applies the flood cap over the composed appends
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from go_readability_spark.cache import CacheScope
from go_readability_spark.operators import (
    bloom_store_read,
    bloom_store_record,
    compact_index,
    filter_unseen_sharded,
    minhash_index,
    minhash_probe,
)
from go_readability_spark.plans import build_session
from go_readability_spark.sources import synth_pages_distributed

spark = build_session(master="local[8]")
tmp = tempfile.mkdtemp(prefix="inc_crawl_")
bloom_dir = f"{tmp}/seen"
KW = dict(n=3, num_hashes=32, num_bands=8, max_bucket_size=1000)

index_buckets = index_shingles = None
for segment in range(3):
    pages = synth_pages_distributed(
        spark, 200, seed=segment, skew=False, num_partitions=4)
    # a real crawl segment RE-LISTS much of what earlier segments
    # already fetched — simulate that by unioning in the previous
    # segment's pages; the Bloom store must suppress exactly those
    if segment > 0:
        pages = pages.unionByName(
            spark.read.parquet(f"{tmp}/pages/segment={segment - 1}"))
    pages.write.parquet(f"{tmp}/pages/segment={segment}")
    pages = spark.read.parquet(f"{tmp}/pages/segment={segment}")

    # 1. seen-URL suppression against the persistent Bloom store
    n_listed = pages.count()
    if segment > 0:
        filt, meta = bloom_store_read(spark, bloom_dir)
        pages = filter_unseen_sharded(
            pages, filt, key_col="url", n_shards=meta["n_shards"],
            bits_per_shard=meta["bits_per_shard"], k=meta["k"])
    n_new = pages.count()
    print(f"segment {segment}: listed {n_listed}, "
          f"unseen {n_new} (suppressed {n_listed - n_new})")

    # 2. extract (sketched: text straight from the synth corpus here);
    #    real pipelines insert extract_pages / --readerable-gate
    docs = pages.select(
        F.xxhash64("url").alias("doc_id"),
        F.col("html").cast("string").alias("text"))

    # 3. record this segment's urls so later plans skip them
    bloom_store_record(spark, bloom_dir, pages.select("url"))

    # 4. near-dedup against the STORED corpus index.  ORDER MATTERS:
    #    the kept docs are MATERIALIZED to disk before their banding is
    #    appended to the index — `docs` is lazy, and its kill-list plan
    #    READS the index directories; appending this segment's banding
    #    first would make any later re-evaluation match every doc
    #    against itself (jaccard 1.0) and doom the whole segment.
    with CacheScope() as scope:
        if index_buckets is not None:
            dups = minhash_probe(docs, index_buckets, index_shingles,
                                 threshold=0.7, scope=scope, **KW)
            doomed = dups.select(F.col("id_new").alias("doc_id")).distinct()
            docs = docs.join(doomed, "doc_id", "left_anti")
        docs.write.parquet(f"{tmp}/kept/segment={segment}")
    kept = spark.read.parquet(f"{tmp}/kept/segment={segment}")
    with CacheScope() as scope:
        b, s = minhash_index(kept, scope=scope, **KW)
        b.write.mode("append").parquet(f"{tmp}/idx_buckets")
        s.write.mode("append").parquet(f"{tmp}/idx_shingles")
    index_buckets = spark.read.parquet(f"{tmp}/idx_buckets")
    index_shingles = spark.read.parquet(f"{tmp}/idx_shingles")
    print(f"segment {segment}: kept {kept.count()} docs, "
          f"index {index_buckets.count()} bucket rows")

# 5. compaction cadence: re-apply the flood cap over the composed index
cb, cs = compact_index(index_buckets, index_shingles,
                       max_bucket_size=KW["max_bucket_size"],
                       prune_shingles=True)
print("compacted index  :", cb.count(), "bucket rows /",
      cs.count(), "shingle rows")
spark.stop()
