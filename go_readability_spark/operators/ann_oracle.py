"""DuckDB twins of the ANN operators (similarity.py / ivf.py), for the
driver's hash-verified correctness gate.

The approximate paths (hyperplane LSH, IVF probe) are deterministic given
their index artifacts — the plane matrix (seeded numpy) and the trained
centroids. Those artifacts are embedded into the generated SQL as DOUBLE
literals (repr() round-trips exactly to the same float64), so DuckDB can
replay bucket assignment, candidate generation, scoring, and ranking
step-for-step against the Spark plan. Verified empirically: 1000/1000
(id, band)→bucket assignments match between engines on the sf0.01 corpus.

This is what upgrades `ann_lsh_topk` from a rows-only driver check to a
full hash-match, and powers the `ann_recall` query (recall@k of LSH and
pinned-index IVF against the exact baseline, as integer rows both engines
must agree on).
"""

from __future__ import annotations

import json
import os

_IVF_INDEX_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "sources", "ivf_index_sf001.json",
)


def load_pinned_ivf_index() -> dict:
    """The committed IVF index artifact for the driver corpus (trained
    once with train_ivf_centroids(dim=64, k=8, iterations=2, seed=42) on
    sf0.01 embeddings; training itself is pytest-covered — the pin makes
    the PROBE leg engine-reproducible, the way a real deployment ships a
    frozen index next to the corpus)."""
    return json.load(open(_IVF_INDEX_PATH))


def matrix_literal(rows) -> str:
    """[[...], ...]::DOUBLE[][] literal; repr() keeps float64 exactness."""
    return (
        "["
        + ", ".join("[" + ", ".join(repr(float(x)) for x in row) + "]" for row in rows)
        + "]::DOUBLE[][]"
    )


def duck_unit_cte(table: str = "embeddings") -> str:
    """CTE fragment `u(id, uv)`: float64 unit vectors with the same
    zero-vector guard as similarity.with_unit_vectors."""
    return f"""
    v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS emb FROM {table}),
    u AS (
      SELECT id, list_transform(emb, x -> CASE WHEN n = 0.0 THEN 0.0 ELSE x / n END) AS uv
      FROM (SELECT id, emb, sqrt(list_sum(list_transform(emb, x -> x * x))) AS n FROM v)
    )"""


def duck_lsh_band_cte(planes, n_bands: int, src: str, out: str) -> str:
    """CTE fragment `{out}(id, uv, band, bucket)`: multi-band hyperplane
    signatures over `{src}(id, uv)` — sign bits packed exactly like
    similarity._band_bucket_expr."""
    per_band = len(planes) // n_bands
    return f"""
    {out} AS (
      SELECT s.id, s.uv, band.b AS band,
        (SELECT sum(CASE WHEN list_dot_product(s.uv, pl.planes[band.b * {per_band} + r.r + 1]) >= 0
                    THEN (1::BIGINT << r.r) ELSE 0::BIGINT END)
         FROM range({per_band}) r(r)) AS bucket
      FROM {src} s, (SELECT {matrix_literal(planes)} AS planes) pl, range({n_bands}) band(b)
    )"""


def duck_exact_topk_cte(k: int, query_pred: str, out: str = "exact_topk") -> str:
    """CTE fragment `{out}(query_id, neighbor_id, rank)` mirroring
    similarity.brute_force_topk (unit-vec dot, rank by score desc/id asc)."""
    return f"""
    q AS (SELECT id AS query_id, uv AS qv FROM u WHERE {query_pred}),
    {out} AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT q.query_id, u.id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY list_dot_product(u.uv, q.qv) DESC, u.id ASC) AS rank
        FROM u CROSS JOIN q WHERE u.id != q.query_id)
      WHERE rank <= {k}
    )"""


def duck_lsh_topk_cte(planes, n_bands: int, k: int, out: str = "lsh_topk") -> str:
    """CTE fragment `{out}(query_id, neighbor_id, rank)` mirroring
    similarity.lsh_bucketed_topk over the `b_base`/`b_q` band CTEs
    (candidates = any-band bucket match, dedup, score, rank)."""
    return f"""
    cand AS (
      SELECT DISTINCT bq.id AS query_id, bb.id AS neighbor_id
      FROM b_base bb JOIN b_q bq
        ON bb.band = bq.band AND bb.bucket = bq.bucket AND bb.id != bq.id
    ),
    {out} AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT c.query_id, c.neighbor_id,
               row_number() OVER (PARTITION BY c.query_id
                                  ORDER BY list_dot_product(un.uv, uq.uv) DESC,
                                           c.neighbor_id ASC) AS rank
        FROM cand c JOIN u un ON un.id = c.neighbor_id
                    JOIN u uq ON uq.id = c.query_id)
      WHERE rank <= {k}
    )"""


def duck_ivf_topk_cte(centroids, k: int, nprobe: int, query_pred: str,
                      out: str = "ivf_topk") -> str:
    """CTE fragment `{out}(query_id, neighbor_id, rank)` mirroring
    ivf.assign_buckets + ivf.ivf_topk with a FIXED centroid matrix:
    bucket = first-index argmax dot; probes = top-nprobe buckets by
    (dot desc, index asc)."""
    n_cents = len(centroids)
    nprobe = min(nprobe, n_cents)
    return f"""
    cents AS (SELECT {matrix_literal(centroids)} AS c),
    assigned AS (
      SELECT u.id, u.uv,
        (SELECT r.r FROM range({n_cents}) r(r), cents
         ORDER BY list_dot_product(u.uv, cents.c[r.r + 1]) DESC, r.r ASC LIMIT 1) AS bucket
      FROM u
    ),
    probes AS (
      SELECT uq.id AS query_id, uq.uv AS qv, pr.bucket
      FROM (SELECT id, uv FROM u WHERE {query_pred}) uq,
      LATERAL (SELECT r.r AS bucket FROM range({n_cents}) r(r), cents
               ORDER BY list_dot_product(uq.uv, cents.c[r.r + 1]) DESC, r.r ASC
               LIMIT {nprobe}) pr
    ),
    {out} AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT p.query_id, a.id AS neighbor_id,
               row_number() OVER (PARTITION BY p.query_id
                                  ORDER BY list_dot_product(a.uv, p.qv) DESC, a.id ASC) AS rank
        FROM assigned a JOIN probes p ON a.bucket = p.bucket AND a.id != p.query_id)
      WHERE rank <= {k}
    )"""


def duck_ann_lsh_topk_sql(planes, n_bands: int, k: int, query_pred: str) -> str:
    """Full statement for the ann_lsh_topk driver oracle."""
    return f"""
    WITH {duck_unit_cte()},
    {duck_lsh_band_cte(planes, n_bands, "u", "b_base")},
    bq_src AS (SELECT id, uv FROM u WHERE {query_pred}),
    {duck_lsh_band_cte(planes, n_bands, "bq_src", "b_q")},
    {duck_lsh_topk_cte(planes, n_bands, k)}
    SELECT query_id, neighbor_id, rank FROM lsh_topk
    """


def duck_ann_ivf_topk_sql(centroids, k: int, nprobe: int, query_pred: str) -> str:
    """Full statement for the ann_ivf_topk driver oracle (pinned-index
    probe — the same frozen centroids the Spark query loads)."""
    return f"""
    WITH {duck_unit_cte()},
    {duck_ivf_topk_cte(centroids, k, nprobe, query_pred)}
    SELECT query_id, neighbor_id, rank FROM ivf_topk
    """


def duck_ann_recall_sql(planes, n_bands: int, centroids, k: int, nprobe: int,
                        query_pred: str) -> str:
    """Full statement for the ann_recall driver oracle: per-query hit
    counts of LSH and pinned-index IVF top-k inside the exact top-k."""
    return f"""
    WITH {duck_unit_cte()},
    {duck_exact_topk_cte(k, query_pred)},
    {duck_lsh_band_cte(planes, n_bands, "u", "b_base")},
    bq_src AS (SELECT id, uv FROM u WHERE {query_pred}),
    {duck_lsh_band_cte(planes, n_bands, "bq_src", "b_q")},
    {duck_lsh_topk_cte(planes, n_bands, k)},
    {duck_ivf_topk_cte(centroids, k, nprobe, query_pred)},
    qids AS (SELECT DISTINCT query_id FROM exact_topk),
    hits AS (
      SELECT 'lsh' AS method, e.query_id, count(*) AS n
      FROM exact_topk e JOIN lsh_topk a USING (query_id, neighbor_id) GROUP BY 2
      UNION ALL
      SELECT 'ivf' AS method, e.query_id, count(*) AS n
      FROM exact_topk e JOIN ivf_topk a USING (query_id, neighbor_id) GROUP BY 2
    )
    SELECT m.method, q.query_id,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
           CAST({k} AS BIGINT) AS k
    FROM qids q CROSS JOIN (SELECT unnest(['lsh', 'ivf']) AS method) m
    LEFT JOIN hits h ON h.method = m.method AND h.query_id = q.query_id
    """


def duck_cosine_near_pairs_sql(planes, n_bands: int, threshold: float) -> str:
    """Full statement for the embedding_near_pairs_lsh driver oracle:
    multi-band candidate generation + cosine verify, ids only (mirrors
    similarity.cosine_near_pairs with the id_a/id_b projection)."""
    return f"""
    WITH {duck_unit_cte()},
    {duck_lsh_band_cte(planes, n_bands, "u", "b_all")},
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM b_all a JOIN b_all b
        ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    )
    SELECT c.id_a, c.id_b
    FROM cand c JOIN u ua ON ua.id = c.id_a JOIN u ub ON ub.id = c.id_b
    WHERE list_dot_product(ua.uv, ub.uv) >= {threshold}
    """
