"""SemDeDup-style semantic deduplication over an embedding column.

Follows the shape of SemDeDup (Abbas et al., 2023, arXiv:2303.09540):
cluster the corpus embeddings with a coarse k-means index, then inside
each cluster score pairwise cosine similarity and drop all but one
member of every near-duplicate group. Clustering is what makes the
pairwise step tractable at scale — pair candidates are bounded to
O(n²/k) within clusters instead of all-pairs, and the cluster id is a
plain equi-join key (at 10^12 rows it becomes the table's physical
partition key, same as the IVF probe path in operators/ivf.py).

Representative selection: the paper keeps the member with the lowest
similarity to the cluster centroid; this implementation keeps the
LOWEST ID of each duplicate group (drop i iff some j < i in the same
cluster has cos(i, j) >= threshold). That rule is deterministic,
engine-portable (the driver's DuckDB oracle replays it exactly), and
keeps the same number of representatives per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ivf import assign_buckets
from .similarity import _dot


def semantic_dedup(
    df: DataFrame,
    centroids,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, bucket, keep): every input row, its cluster, and whether
    it survives semantic dedup. `centroids` is the trained k-means index
    (train_ivf_centroids, or any frozen k x dim matrix)."""
    assigned = assign_buckets(df, centroids, id_col, vec_col)
    a = assigned.alias("a")
    b = assigned.alias("b")
    dup_ids = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.id") < F.col("a.id")),
        )
        .where(_dot(F.col("a.unit_vec"), F.col("b.unit_vec")) >= threshold)
        .select(F.col("a.id").alias("id"))
        .distinct()
    )
    return (
        assigned.join(dup_ids.withColumn("_dup", F.lit(True)), "id", "left")
        .select(
            "id",
            "bucket",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


def duck_semantic_dedup_sql(centroids, threshold: float,
                            table: str = "embeddings") -> str:
    """DuckDB twin: same unit vectors, same first-index-argmax cluster
    assignment (centroid literals embedded), same keep-lowest-id rule."""
    from .ann_oracle import duck_unit_cte, matrix_literal

    n_cents = len(centroids)
    return f"""
    WITH {duck_unit_cte(table)},
    cents AS (SELECT {matrix_literal(centroids)} AS c),
    assigned AS (
      SELECT u.id, u.uv,
        (SELECT r.r FROM range({n_cents}) r(r), cents
         ORDER BY list_dot_product(u.uv, cents.c[r.r + 1]) DESC, r.r ASC LIMIT 1) AS bucket
      FROM u
    ),
    dups AS (
      SELECT DISTINCT a.id
      FROM assigned a JOIN assigned b
        ON a.bucket = b.bucket AND b.id < a.id
      WHERE list_dot_product(a.uv, b.uv) >= {threshold}
    )
    SELECT assigned.id, assigned.bucket,
           (dups.id IS NULL) AS keep
    FROM assigned LEFT JOIN dups ON assigned.id = dups.id
    """
