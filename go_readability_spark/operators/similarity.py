"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exact baseline (JVM-side vector math via
  zip_with/aggregate; one shuffle for the global rank)
* random-hyperplane LSH bucketing — the scale path (signature → bucket
  join; only same-bucket candidates are scored)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize once so the join-side math is a plain dot product."""
    v = F.col(vec_col).cast("array<double>")
    n = _norm(v)
    return df.withColumn("unit_vec", F.transform(v, lambda x: x / n))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k. The (small) query set is broadcast, so the scan
    over the big side is shuffle-free; the only shuffle is the per-query
    rank. Returns (query_id, neighbor_id, rank) — ids only, so the result
    is float-rounding-proof for oracle comparison."""
    base = with_unit_vectors(df, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "unit_vec"
    )
    qs = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit_vec").alias("query_vec")
    )
    scored = base.join(F.broadcast(qs), F.col("neighbor_id") != F.col("query_id")).withColumn(
        "score", _dot(F.col("unit_vec"), F.col("query_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hyperplane_signature(vec_col, planes) -> "F.Column":
    """Sign pattern of the vector against fixed hyperplanes, packed into a
    long. `planes` is a list of python float lists (deterministic, seeded),
    inlined as literals so executors need no side data."""
    bits = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot(vec_col.cast("array<double>"), lit_plane)
        bits = bits + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bits


def make_planes(dim: int, n_planes: int = 8, seed: int = 42):
    import numpy as np

    rng = np.random.RandomState(seed)
    return [list(rng.randn(dim)) for _ in range(n_planes)]


def lsh_bucketed_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's hyperplane
    bucket. At 10^12 scale the bucket column becomes the table's physical
    partition key so the probe prunes to 1/2^planes of the data."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = make_planes(dim, n_planes, seed)

    base = with_unit_vectors(df, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        "unit_vec",
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    qs = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("unit_vec").alias("query_vec"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    scored = base.join(
        F.broadcast(qs),
        (F.col("neighbor_id") != F.col("query_id"))
        & (base["bucket"] == qs["bucket"]),
    ).withColumn("score", _dot(F.col("unit_vec"), F.col("query_vec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_near_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: pairs are only
    scored within a hyperplane bucket (recall trades off with n_planes)."""
    dim = len(df.select(vec_col).first()[0])
    planes = make_planes(dim, n_planes, seed)
    base = with_unit_vectors(df, vec_col).select(
        F.col(id_col).alias("id"),
        "unit_vec",
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("score", _dot(F.col("a.unit_vec"), F.col("b.unit_vec")))
        .where(F.col("score") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round("score", 6).alias("cosine"),
        )
    )
