"""IVF ANN: deterministic training, the nprobe==k exactness invariant,
planted near-dup recall, and plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_readability_spark.operators import (
    assign_buckets,
    brute_force_topk,
    ivf_topk,
    train_ivf_centroids,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def centroids(spark, emb):
    return train_ivf_centroids(emb, dim=64, k=8, iterations=2, seed=42)


def test_training_is_deterministic_and_normalized(spark, emb, centroids):
    again = train_ivf_centroids(emb, dim=64, k=8, iterations=2, seed=42)
    assert centroids == again
    norms = np.linalg.norm(np.array(centroids), axis=1)
    assert np.allclose(norms, 1.0)


def test_every_vector_gets_exactly_one_bucket(spark, emb, centroids):
    assigned = assign_buckets(emb, centroids)
    n = emb.count()
    assert assigned.count() == n
    assert assigned.where((F.col("bucket") < 0) | (F.col("bucket") >= 8)).count() == 0
    # buckets actually partition the data (not everything in one cell)
    assert assigned.select("bucket").distinct().count() > 1


def test_full_probe_equals_brute_force(spark, emb, centroids):
    """nprobe == k covers every bucket: IVF must return EXACTLY the
    brute-force ranking (same tie-breaking)."""
    queries = emb.where(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id, r.rank)
             for r in brute_force_topk(emb, queries, k=5).collect()}
    ivf = {(r.query_id, r.neighbor_id, r.rank)
           for r in ivf_topk(emb, queries, centroids, k=5, nprobe=8).collect()}
    assert ivf == exact


def test_planted_near_dup_recall(spark):
    rng = np.random.RandomState(3)
    base = rng.randn(400, 24)
    rows = [(i, [float(x) for x in base[i]]) for i in range(400)]
    rows += [(1000 + i, [float(x) for x in base[i] + 0.02 * rng.randn(24)])
             for i in range(25)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(df, dim=24, k=16, iterations=3, seed=7)
    qs = df.where(F.col("vec_id") >= 1000)
    hits = {r.query_id: r.neighbor_id
            for r in ivf_topk(df, qs, cents, k=1, nprobe=3).collect()}
    found = sum(1 for i in range(25) if hits.get(1000 + i) == i)
    assert found >= 23, f"planted recall {found}/25"


def test_probe_plan_broadcasts_queries_not_base(spark, emb, centroids):
    queries = emb.where(F.col("vec_id") < 3)
    df = ivf_topk(emb, queries, centroids, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_zero_vectors_do_not_kill_ann_jobs(spark):
    """Spark 4 runs ANSI mode: an unguarded x/norm threw DIVIDE_BY_ZERO and
    aborted the whole job on the first all-zero embedding. Zero vectors now
    normalize to the zero vector (dot 0 -> ranked last, never a crash)
    across brute force, LSH, and IVF."""
    from go_readability_spark.operators import (
        brute_force_topk,
        cosine_near_pairs_exact,
        lsh_bucketed_topk,
    )

    rows = [(0, [0.0] * 8)] + [
        (i, [float(i), 1.0, 0.5, 0.25, 0.0, 1.0, 2.0, 3.0]) for i in range(1, 12)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where("vec_id in (0, 1)")
    bf = brute_force_topk(df, queries, k=3).collect()
    assert len(bf) == 6
    assert lsh_bucketed_topk(df, queries, k=3, dim=8, n_planes=4).count() >= 3
    assert cosine_near_pairs_exact(df, threshold=0.99).count() >= 1
    cents = train_ivf_centroids(df, dim=8, k=3, iterations=2, seed=1)
    assert ivf_topk(df, queries, cents, k=3, nprobe=3).count() == 6


def test_semantic_dedup_matches_pure_python(spark):
    """semantic_dedup == brute-force reference: same assignment (first-
    index argmax), same keep-lowest-id prune."""
    import numpy as np

    from go_readability_spark.operators import semantic_dedup

    rng = np.random.RandomState(11)
    base = rng.randn(10, 8)
    rows = []
    vid = 0
    for i in range(10):
        for rep in range(3):  # 3 near-copies of each base vector
            v = base[i] + rng.randn(8) * (0.01 if rep else 0.0)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [list(map(float, c)) for c in rng.randn(4, 8)]

    got = {r["id"]: (r["bucket"], r["keep"])
           for r in semantic_dedup(emb, cents, threshold=0.95).collect()}

    # pure-python reference (float32 cast first, like the Spark column)
    def unit(v):
        v = np.asarray(v, dtype="float32").astype("float64")
        n = np.sqrt((v * v).sum())
        return v / n if n else v

    uv = {i: unit(v) for i, v in rows}
    cent = [np.asarray(c) for c in cents]
    bucket = {
        i: int(np.argmax([float(u @ c) for c in cent])) for i, u in uv.items()
    }
    keep = {}
    for i in sorted(uv):
        keep[i] = not any(
            bucket[j] == bucket[i] and float(uv[i] @ uv[j]) >= 0.95
            for j in sorted(uv) if j < i
        )
    assert got == {i: (bucket[i], keep[i]) for i in uv}
    assert sum(1 for k in keep.values() if not k) > 0  # prune actually fired
