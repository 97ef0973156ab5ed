"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
scheme): hash every character k-gram, then keep the minimum hash of each
sliding window — a position-robust fingerprint set for copy detection.

Entirely JVM-side column expressions over staged arrays (same
CSE-into-lambda discipline as dedup.shingle_table), with an exact DuckDB
twin for the oracle: the k-gram hash is the first 8 hex chars of md5,
portable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import md5_prefix_long
from .dedup import normalized_text


def _kgram_hashes(text_col, k: int):
    """Array of int hashes, one per character k-gram. Stage `text` as a
    column before calling (lambdas re-evaluate inline expressions)."""
    n_grams = F.length(text_col) - (k - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: md5_prefix_long(F.substring(text_col, i, k)),
    )
    # guard: text shorter than k makes sequence(1, n<=0) DESCENDING ([1,0]),
    # which would emit two phantom k-gram hashes (substring tolerates start
    # 0); the DuckDB oracle yields an empty list for such rows
    return F.when(n_grams >= 1, grams).otherwise(F.array().cast("array<long>"))


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """(id, fingerprints array<long>) — distinct window-minima of k-gram
    hashes over the normalized text, sorted for deterministic output."""
    staged = df.select(
        F.col(id_col).alias("id"), normalized_text(F.col(text_col)).alias("t")
    )
    # the ≥window gate is expressed on text LENGTH (size(hashes) >= window
    # ⟺ length(t) >= k + window - 1): filtering on size(hashes) pushed the
    # whole per-character md5 array into the scan filter, recomputing it
    # once per row just for the size check (measured 18s of the 19s
    # fingerprint time at sf0.1 — same trap as dedup.shingle_table)
    hashed = staged.where(F.length("t") >= k + window - 1).select(
        "id", _kgram_hashes(F.col("t"), k).alias("hashes")
    )
    h = F.col("hashes")
    minima = F.transform(
        F.sequence(F.lit(1), F.size(h) - (window - 1)),
        lambda i: F.array_min(F.slice(h, i, window)),
    )
    return hashed.select(
        "id", F.array_sort(F.array_distinct(minima)).alias("fingerprints")
    )


def winnowing_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    min_overlap: int = 3,
    max_df: int = 100,
) -> DataFrame:
    """Copy-detection pairs: docs sharing ≥ min_overlap winnowing
    fingerprints. Explode + self-join on the fingerprint — the standard
    inverted-index plan. Fingerprints occurring in more than `max_df` docs
    carry no copy signal and quadratically explode the join (hot-key skew),
    so they are dropped first; this is the cap every plagiarism/copy
    detector applies at scale."""
    # persist BEFORE exploding: CollapseProject otherwise re-inlines the
    # whole per-gram hash tree into the Generate operator, re-evaluating it
    # per exploded row (measured: >100x slowdown)
    fps = winnowing_fingerprints(df, id_col, text_col, k, window).persist()
    ex = fps.select("id", F.explode("fingerprints").alias("fp"))
    rare = (
        ex.groupBy("fp").agg(F.count("*").alias("df"))
        .where(F.col("df") <= max_df)
        .select("fp")
    )
    ex_rare = ex.join(rare, "fp", "left_semi")
    a, b = ex_rare.alias("a"), ex_rare.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared_fingerprints"))
        .where(F.col("shared_fingerprints") >= min_overlap)
    )
