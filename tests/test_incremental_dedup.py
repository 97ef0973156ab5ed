"""Incremental near-dedup (minhash_index / minhash_probe): a new crawl
segment dedups against a STORED corpus index without rescanning the
corpus.  Probe results must equal the cross-pairs of the batch pipeline
run over corpus ∪ segment; appended index increments compose exactly."""

import pytest
from pyspark.sql import functions as F

from go_readability_spark.operators import (
    minhash_dedup_pairs,
    minhash_index,
    minhash_probe,
)

KW = dict(n=3, num_hashes=16, num_bands=4, max_bucket_size=100)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the quiet dark woods tonight")
    rows = []
    for i in range(40):
        words = base.split()
        words[i % len(words)] = f"w{i}"
        rows.append((i, " ".join(words)))
    # plus some unrelated docs
    for i in range(40, 60):
        rows.append((i, " ".join(f"tok{i}x{j}" for j in range(30))))
    return rows


def test_probe_equals_batch_cross_pairs(spark, corpus):
    """probe(segment, index(corpus)) == the corpus×segment pairs of
    minhash_dedup_pairs over the union (same params, same hashes)."""
    seg = [(1000 + i, corpus[i][1] + " tail") for i in range(0, 20, 2)]
    seg += [(2000 + i, " ".join(f"novel{i}y{j}" for j in range(25)))
            for i in range(5)]
    buckets, shingles = minhash_index(_docs(spark, corpus), **KW)
    probe = {
        (r.id_new, r.id_corpus): r.jaccard
        for r in minhash_probe(_docs(spark, seg), buckets, shingles,
                               threshold=0.5, **KW).collect()
    }
    union = minhash_dedup_pairs(
        _docs(spark, corpus + seg), threshold=0.5,
        n=3, num_hashes=16, num_bands=4, max_bucket_size=100).collect()
    cross = {}
    for r in union:
        a, b = r.id_a, r.id_b
        if a < 1000 <= b:
            cross[(b, a)] = r.jaccard
        elif b < 1000 <= a:
            cross[(a, b)] = r.jaccard
    assert probe == cross and probe  # non-empty and identical


def test_incremental_append_composes(spark, corpus):
    """index(corpus) + index(segment) appended == index(corpus∪segment):
    the banding is deterministic, so increments compose exactly."""
    seg = [(1000 + i, corpus[i][1] + " tail") for i in range(6)]
    b1, s1 = minhash_index(_docs(spark, corpus), **KW)
    b2, s2 = minhash_index(_docs(spark, seg), **KW)
    b_all, s_all = minhash_index(_docs(spark, corpus + seg), **KW)
    merged = {(r.id, r.band, r.bucket)
              for r in b1.unionByName(b2).collect()}
    whole = {(r.id, r.band, r.bucket) for r in b_all.collect()}
    assert merged == whole
    # a later probe against the appended index finds segment-2 dupes
    seg3 = [(3000, seg[0][1])]
    hits = minhash_probe(
        _docs(spark, seg3), b1.unionByName(b2), s1.unionByName(s2),
        threshold=0.9, **KW).collect()
    assert any(r.id_corpus == 1000 for r in hits)


def test_index_flood_bucket_dropped_at_build(spark):
    """A template flood in the corpus disappears from the index at
    build time (max_bucket_size), so probes never fan into it."""
    flood = [(i, "identical template page body " * 5) for i in range(50)]
    normal = [(100 + i, " ".join(f"u{i}v{j}" for j in range(25)))
              for i in range(5)]
    buckets, shingles = minhash_index(
        _docs(spark, flood + normal), n=3, num_hashes=16, num_bands=4,
        max_bucket_size=10)
    assert buckets.where(F.col("id") < 50).count() == 0  # flood gone
    probe = minhash_probe(
        _docs(spark, [(9000, "identical template page body " * 5)]),
        buckets, shingles, threshold=0.5,
        n=3, num_hashes=16, num_bands=4, max_bucket_size=10)
    assert probe.count() == 0


def test_compact_index_prunes_cross_increment_flood(spark):
    """VERDICT r5 #3: a template flood split across two appends stays
    under the cap in EACH increment but crosses it in the union —
    compact_index must drop it, bounding probe fan-out, while non-flood
    pairs keep exact batch equivalence."""
    from go_readability_spark.operators import compact_index

    kw = dict(n=3, num_hashes=16, num_bands=4, max_bucket_size=30)
    flood_text = "identical template page body " * 5
    inc1 = [(i, flood_text) for i in range(20)]            # pop 20 <= 30
    inc2 = [(100 + i, flood_text) for i in range(20)]      # pop 20 <= 30
    normal1 = [(500, "the quick brown fox jumps over the lazy dog "
                     "and runs into the woods tonight")]
    normal2 = [(600, "the quick brown fox jumps over the lazy dog "
                     "and runs into the woods tonight extra")]
    b1, s1 = minhash_index(_docs(spark, inc1 + normal1), **kw)
    b2, s2 = minhash_index(_docs(spark, inc2 + normal2), **kw)
    buckets = b1.unionByName(b2)
    shingles = s1.unionByName(s2)

    # before compaction the composed flood bucket holds 40 ids
    probe_doc = _docs(spark, [(9000, flood_text)])
    pre = minhash_probe(probe_doc, buckets, shingles, threshold=0.5, **kw)
    assert pre.count() == 40  # linear fan-out growth: the bug

    cb, cs = compact_index(buckets, shingles, max_bucket_size=30)
    assert cb.where(F.col("id") < 500).count() == 0  # flood gone
    post = minhash_probe(probe_doc, cb, cs, threshold=0.5, **kw)
    assert post.count() == 0

    # batch equivalence on the surviving (non-flood) pairs: compacted
    # index == the bucket relation of one build over the union
    b_all, _ = minhash_index(
        _docs(spark, inc1 + normal1 + inc2 + normal2), **kw)
    assert ({(r.id, r.band, r.bucket) for r in cb.collect()}
            == {(r.id, r.band, r.bucket) for r in b_all.collect()})
    near = minhash_probe(
        _docs(spark, [(9500, normal1[0][1])]), cb, cs, threshold=0.5, **kw)
    assert {r.id_corpus for r in near.collect()} == {500, 600}


def test_compact_index_idempotent_and_prunes_shingles(spark, corpus):
    from go_readability_spark.operators import compact_index

    flood = [(700 + i, "zz flood body " * 4) for i in range(8)]
    b, s = minhash_index(_docs(spark, corpus + flood), **KW)
    b2, s2 = compact_index(b.unionByName(b), s, max_bucket_size=10,
                           prune_shingles=True)
    # the flood bucket doubles to 16 > 10 -> dropped; pruned shingles
    # keep exactly the ids that still have at least one bucket row
    assert b2.where(F.col("id") >= 700).count() == 0
    assert s2.where(F.col("id") >= 700).count() == 0
    assert ({r.id for r in s2.select("id").collect()}
            == {r.id for r in b2.select("id").distinct().collect()})
    b3 = compact_index(b2, max_bucket_size=10)
    assert ({(r.id, r.band, r.bucket) for r in b3.collect()}
            == {(r.id, r.band, r.bucket) for r in b2.collect()})


def test_cache_scope_releases_probe_caches(spark, corpus):
    """VERDICT r5 #5 / ADVICE: a long-lived scheduler probing many
    segments must be able to release the operators' internal persists;
    after CacheScope.release() no cached RDDs leak."""
    from go_readability_spark.cache import CacheScope

    jsc = spark.sparkContext._jsc
    spark.catalog.clearCache()
    base = jsc.getPersistentRDDs().size()
    with CacheScope() as scope:
        buckets, shingles = minhash_index(_docs(spark, corpus),
                                          scope=scope, **KW)
        seg = [(1000, corpus[0][1] + " tail")]
        hits = minhash_probe(_docs(spark, seg), buckets, shingles,
                             threshold=0.5, scope=scope, **KW).collect()
        assert hits
        assert len(scope) == 2
        assert jsc.getPersistentRDDs().size() > base
    assert jsc.getPersistentRDDs().size() == base


def test_cache_scope_releases_curation_cache(spark):
    """The curation stage-boundary persist is also scope-ownable."""
    from go_readability_spark.cache import CacheScope
    from go_readability_spark.plans import curate_corpus
    from go_readability_spark.plans.schema import PAGES_SCHEMA
    from go_readability_spark.sources import synth_corpus_rows

    jsc = spark.sparkContext._jsc
    spark.catalog.clearCache()
    base = jsc.getPersistentRDDs().size()
    pages = spark.createDataFrame(synth_corpus_rows(24, seed=9, skew=False),
                                  schema=PAGES_SCHEMA)
    with CacheScope() as scope:
        out = curate_corpus(pages, num_partitions=4, scope=scope).collect()
        assert out
        # enriched boundary + the near-dedup shingle/signature internals
        assert len(scope) == 3
    assert jsc.getPersistentRDDs().size() == base
