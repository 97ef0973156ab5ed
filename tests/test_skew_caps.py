"""Skew-bound guards for the two pairwise-join operators flagged by the
round-3 review: SemDeDup's within-cluster prune and MinHash-LSH's
band-bucket candidate join. Both must stay bounded when a planted flood
(template farm / mega-cluster) lands the whole input on one join key."""

import hashlib

import pytest
from pyspark.sql import functions as F


def _md5_prefix_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# --------------------------------------------------------------- SemDeDup cap


def _flood_embeddings(spark, n=60, dim=8):
    """n near-identical vectors -> all land in one k-means cluster."""
    rows = [
        (i, [1.0 + (i % 7) * 1e-4 if d == 0 else 0.01 * d for d in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


CENTS = [[1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
         [-1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]]


def test_semdedup_mega_cluster_is_split(spark):
    """With max_cluster_size=8 a 60-row cluster splits into ceil(60/8)=8
    md5-salted sub-buckets; no (bucket, sub) key carries the whole flood,
    and the split matches the pure-python replay of the salt rule."""
    from go_readability_spark.operators.ivf import assign_buckets
    from go_readability_spark.operators.semdedup import _with_salt_sub

    emb, rows = _flood_embeddings(spark)
    salted = _with_salt_sub(assign_buckets(emb, CENTS), max_cluster_size=8)
    per_key = salted.groupBy("bucket", "sub").count().collect()
    assert len(per_key) > 1, "mega-cluster was not split"
    # salt is a uniform hash: no sub-bucket should hold the whole flood,
    # and the expected size is cap-bounded (allow 2x concentration slack)
    assert max(r["count"] for r in per_key) <= 16
    # the split is the documented pure function of (id, cluster size)
    expected_sub = {i: _md5_prefix_long(str(i)) % 8 for i, _ in rows}
    got_sub = {r["id"]: r["sub"] for r in salted.collect()}
    assert got_sub == expected_sub


def test_semdedup_capped_still_dedups_within_subbuckets(spark):
    """Capped semantics: dups are still pruned *within* each sub-bucket
    (keep = lowest id per sub-bucket for an all-identical flood), results
    stay deterministic, and every input row is still emitted once."""
    from go_readability_spark.operators import semantic_dedup

    emb, rows = _flood_embeddings(spark)
    out = semantic_dedup(emb, CENTS, threshold=0.9, max_cluster_size=8).collect()
    assert len(out) == len(rows)
    kept = sorted(r["id"] for r in out if r["keep"])
    # one representative per non-empty sub-bucket: the min id of each
    subs = {}
    for i, _ in rows:
        subs.setdefault(_md5_prefix_long(str(i)) % 8, []).append(i)
    assert kept == sorted(min(v) for v in subs.values())


def test_semdedup_uncapped_matches_capped_when_under_cap(spark):
    """A cluster smaller than the cap is NOT split: capped output ==
    uncapped output bit-for-bit (the driver-oracle compatibility claim)."""
    from go_readability_spark.operators import semantic_dedup

    emb, _ = _flood_embeddings(spark, n=20)
    capped = sorted(
        semantic_dedup(emb, CENTS, threshold=0.9, max_cluster_size=100).collect()
    )
    uncapped = sorted(
        semantic_dedup(emb, CENTS, threshold=0.9, max_cluster_size=None).collect()
    )
    assert capped == uncapped


def test_semdedup_flood_oracle_parity(spark):
    """DuckDB twin replays the salt split bit-for-bit ON a planted flood
    (the cap actually firing, not just configured)."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from go_readability_spark.operators import semantic_dedup
    from go_readability_spark.operators.semdedup import duck_semantic_dedup_sql

    emb, rows = _flood_embeddings(spark)
    got = {
        (r["id"], r["bucket"], r["keep"])
        for r in semantic_dedup(
            emb, CENTS, threshold=0.9, max_cluster_size=8
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": [i for i, _ in rows], "embedding": [v for _, v in rows]}
        ),
    )
    sql = duck_semantic_dedup_sql(CENTS, threshold=0.9, max_cluster_size=8)
    want = {(int(i), int(b), bool(k)) for i, b, k in con.sql(sql).fetchall()}
    assert got == want


# ------------------------------------------------------------ LSH bucket cap


def _template_flood_docs(spark, n_flood=40):
    """A template farm (n_flood identical pages) + one genuine near-dup
    pair + unrelated singletons."""
    flood = [(i, "breaking news widget sidebar footer copyright menu " * 4)
             for i in range(n_flood)]
    near = [
        (100, "the quick brown fox jumps over the lazy dog in the sunny park today"),
        (101, "the quick brown fox jumps over the lazy dog in the sunny park now"),
    ]
    single = [(200, "completely unrelated text about spark catalyst optimizer internals")]
    return spark.createDataFrame(
        flood + near + single, "doc_id long, text string"
    )


def test_lsh_bucket_cap_drops_flood_keeps_signal(spark):
    """With max_bucket_size=10 the 40-page template flood's buckets are
    dropped (bounded candidate set — no quadratic key), while the genuine
    near-dup pair outside the flood is still found."""
    from go_readability_spark.operators.dedup import minhash_dedup_pairs_md5

    docs = _template_flood_docs(spark)
    pairs = minhash_dedup_pairs_md5(
        docs, "doc_id", "text", n=3, num_hashes=16, num_bands=4,
        threshold=0.5, max_bucket_size=10,
    ).collect()
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert not any(i < 100 for i in ids), "flood pairs should be capped away"
    assert (100, 101) in {(r["id_a"], r["id_b"]) for r in pairs}


def test_lsh_bucket_cap_none_restores_exact_semantics(spark):
    """max_bucket_size=None keeps the uncapped behavior: the flood's
    identical pages all pair up (jaccard 1.0)."""
    from go_readability_spark.operators.dedup import minhash_dedup_pairs_md5

    docs = _template_flood_docs(spark, n_flood=8)
    pairs = minhash_dedup_pairs_md5(
        docs, "doc_id", "text", n=3, num_hashes=16, num_bands=4,
        threshold=0.5, max_bucket_size=None,
    ).collect()
    flood_pairs = [r for r in pairs if r["id_a"] < 100 and r["id_b"] < 100]
    assert len(flood_pairs) == 8 * 7 // 2


def test_lsh_candidates_bounded_under_cap(spark):
    """Candidate volume itself is bounded: with the cap, a 40-page flood
    contributes zero candidates (every flood bucket exceeds the cap)."""
    from go_readability_spark.operators.dedup import (
        _band_bucket_md5,
        _minhash_fn_md5,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    docs = _template_flood_docs(spark)
    sigs = minhash_signatures(
        docs, "doc_id", "text", n=3, num_hashes=16, hash_fn=_minhash_fn_md5
    )
    capped = minhash_lsh_candidates(
        sigs, num_bands=4, rows_per_band=4,
        bucket_fn=_band_bucket_md5, max_bucket_size=10,
    )
    assert capped.where(F.col("id_a") < 100).count() == 0
    uncapped = minhash_lsh_candidates(
        sigs, num_bands=4, rows_per_band=4,
        bucket_fn=_band_bucket_md5, max_bucket_size=None,
    )
    assert uncapped.where(F.col("id_a") < 100).count() == 40 * 39 // 2
