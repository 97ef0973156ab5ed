"""Exact-substring span deduplication (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better"): any token window of length L
that occurs more than once in the corpus is removed from EVERY document —
span-level removal, unlike document-level MinHash/SimHash or line-level
boilerplate dedup.

The reference method builds a corpus suffix array on one machine; the
Spark-native equivalent hashes every L-token window (rolling inventory,
one row per window), finds hashes with more than one occurrence, and cuts
the covered token positions. Window hashes are the repo's portable
md5-prefix bigint, so the DuckDB oracle replays the whole computation
bit-exactly.

Scale shape:
- tokenize + window hashing: narrow maps over staged arrays (the window
  array is persisted before exploding — CollapseProject would re-inline
  the builder into the Generate);
- one groupBy(window_hash) with map-side partial counts; the semi-join
  back is hash-keyed and uniformly distributed by construction;
- covered-position expansion is explode(sequence(pos, pos+L-1)) —
  bounded fan-out L per duplicated window;
- reconstruction is one groupBy(doc) over kept tokens.
A hot window (a phrase duplicated in 10^9 docs) costs its occurrence
count once in the groupBy — there is no pairwise join anywhere, so no
quadratic blowup; this operator is SAFER at scale than pair-emitting
dedup and is what you run when the goal is corpus cleaning rather than
pair reporting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import DUCK_WS_CLASS, md5_prefix_long
from .dedup import normalized_text


def _window_hashes(toks, length: int):
    """Array of md5-prefix hashes, one per L-token window (joined with a
    single space), empty when the doc has fewer than L tokens."""
    n = F.size(toks) - (length - 1)
    hashes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: md5_prefix_long(F.array_join(F.slice(toks, i, length), " ")),
    )
    return F.when(n >= 1, hashes).otherwise(F.array().cast("array<long>"))


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    length: int = 12,
) -> DataFrame:
    """(id, clean_text, n_tokens_kept, n_tokens_dropped): every token that
    falls inside an L-token window occurring >1 time corpus-wide is
    dropped; surviving tokens are re-joined with single spaces in order.
    Documents shorter than L tokens pass through untouched (they have no
    windows). Tokenization is whitespace over lowercased text — the same
    normalization as the dedup family."""
    tokens = F.filter(
        F.split(F.trim(normalized_text(F.col(text_col))), " "),
        lambda t: t != "",
    )
    staged = df.select(F.col(id_col).alias("id"), tokens.alias("toks"))

    # per-token inventory (id, idx, tok) — reused for reconstruction
    tok_rows = staged.select("id", F.posexplode("toks").alias("idx", "tok"))

    # window inventory; persist BEFORE exploding (re-inline trap)
    windows = staged.select(
        "id", _window_hashes(F.col("toks"), length).alias("whs")
    ).persist()
    win_rows = windows.select("id", F.posexplode("whs").alias("pos", "wh"))

    dup_hashes = (
        win_rows.groupBy("wh").agg(F.count("*").alias("occ"))
        .where(F.col("occ") > 1)
        .select("wh")
    )
    dup_windows = win_rows.join(dup_hashes, "wh", "left_semi")

    covered = dup_windows.select(
        "id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(length - 1))
        ).alias("idx"),
    ).distinct()

    kept = tok_rows.join(covered, ["id", "idx"], "left_anti")
    # totals from the staged array (not a groupBy over exploded tokens):
    # no extra shuffle, and zero-token docs stay in the output
    totals = staged.select("id", F.size("toks").alias("n_tokens"))
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("idx"), F.col("tok")))
                ),
                lambda s: s.getField("tok"),
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_tokens_kept"),
    )
    return (
        totals.join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_tokens_kept"), F.lit(0)).cast("long").alias("n_tokens_kept"),
            (F.col("n_tokens") - F.coalesce(F.col("n_tokens_kept"), F.lit(0)))
            .cast("long")
            .alias("n_tokens_dropped"),
        )
    )


def duck_substring_dedup_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    length: int = 12,
    inject: str | None = None,
) -> str:
    """DuckDB twin of :func:`remove_duplicated_spans` (same normalization,
    same md5-prefix window hashes, same coverage semantics). `inject`
    optionally wraps the text expression (for planted-duplicate driver
    queries)."""
    text_expr = inject if inject is not None else text_col
    mdp = "CAST(('0x' || substr(md5({s}), 1, 8)) AS BIGINT)"
    wh = mdp.format(s=f"array_to_string(t[i:i+{length - 1}], ' ')")
    return f"""
        WITH toks AS (
            SELECT {id_col} AS id,
                   list_filter(string_split_regex(trim(regexp_replace(lower({text_expr}),
                               '{DUCK_WS_CLASS}', ' ', 'g')), ' '), x -> x != '') AS t
            FROM {table}
        ),
        tok_rows AS (
            SELECT id, u.idx AS idx, u.tok AS tok
            FROM (SELECT id, unnest(list_transform(range(1, len(t) + 1),
                       i -> struct_pack(idx := i - 1, tok := t[i]))) AS u
                  FROM toks)
        ),
        win_rows AS (
            SELECT id, u.pos AS pos, u.wh AS wh
            FROM (SELECT id, unnest(list_transform(range(1, len(t) - {length - 1} + 1),
                       i -> struct_pack(pos := i - 1, wh := {wh}))) AS u
                  FROM toks WHERE len(t) >= {length})
        ),
        dup AS (SELECT wh FROM win_rows GROUP BY wh HAVING count(*) > 1),
        covered AS (
            SELECT DISTINCT w.id, w.pos + g.g AS idx
            FROM win_rows w
            JOIN dup USING (wh)
            CROSS JOIN (SELECT unnest(range(0, {length})) AS g) g
        ),
        kept AS (
            SELECT t.* FROM tok_rows t
            WHERE NOT EXISTS (SELECT 1 FROM covered c
                              WHERE c.id = t.id AND c.idx = t.idx)
        ),
        totals AS (SELECT id, len(t) AS n_tokens FROM toks),
        rebuilt AS (
            SELECT id, string_agg(tok, ' ' ORDER BY idx) AS clean_text,
                   count(*) AS n_kept
            FROM kept GROUP BY id
        )
        SELECT t.id AS {id_col},
               coalesce(r.clean_text, '') AS clean_text,
               CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_tokens_kept,
               CAST(t.n_tokens - coalesce(r.n_kept, 0) AS BIGINT) AS n_tokens_dropped
        FROM totals t LEFT JOIN rebuilt r ON r.id = t.id
    """
