"""Corpus-level boilerplate line removal (the CCNet/C4 passage-dedup
step): a line that appears in many documents is navigation/footer/cookie
boilerplate, not content — drop it from every document while preserving
the order of what remains.

Plan:
  docs → posexplode(lines)                    (1 narrow pass)
       → line fingerprint document-frequency  (groupBy md5 — 1 shuffle,
                                               map-side combined)
       → anti-join hot fingerprints           (broadcast: the hot set is
                                               tiny by construction — only
                                               lines with df > threshold)
       → regroup by doc, order by position    (1 shuffle)

The hot-line set is the ONLY thing joined against the exploded corpus and
it shrinks as the threshold rises, so the big side never carries more
than one extra projection. Engine-portable fingerprints (md5) — the
DuckDB oracle reproduces the whole pipeline bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def line_document_frequency(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(fingerprint, df): how many DISTINCT documents contain each
    non-blank (trimmed) line."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).where(F.trim("line") != "")
    return (
        lines.select("id", F.md5(F.trim(F.col("line"))).alias("fingerprint"))
        .distinct()
        .groupBy("fingerprint")
        .agg(F.count("*").alias("df"))
    )


def remove_boilerplate_lines(
    df: DataFrame,
    max_df: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, clean_text, n_lines_kept, n_lines_dropped): documents with
    every line that occurs in more than `max_df` documents removed,
    remaining lines rejoined in original order."""
    hot = (
        line_document_frequency(df, id_col, text_col)
        .where(F.col("df") > max_df)
        .select("fingerprint")
    )
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).where(F.trim("line") != "").withColumn(
        "fingerprint", F.md5(F.trim(F.col("line")))
    )
    kept = exploded.join(F.broadcast(hot), "fingerprint", "left_anti")
    dropped_counts = exploded.join(F.broadcast(hot), "fingerprint", "left_semi")
    return (
        kept.groupBy("id")
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(pos, line))), s -> s.line)"),
                "\n",
            ).alias("clean_text"),
            F.count("*").alias("n_lines_kept"),
        )
        .join(
            dropped_counts.groupBy("id").agg(F.count("*").alias("n_lines_dropped")),
            "id",
            "left",
        )
        .withColumn("n_lines_dropped", F.coalesce("n_lines_dropped", F.lit(0)))
    )
