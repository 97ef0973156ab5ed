"""Gopher/C4-style repetition and quality filters for training-data
curation (the gates every web-scale LLM corpus pipeline applies between
extraction and tokenization — public heuristics from the Gopher (Rae et
al. 2021, arXiv:2112.11446 Appendix A) and C4 (Raffel et al. 2020) data
pipelines).

Everything is JVM-side column expressions over STAGED array columns
(lines/words staged once; Catalyst does not CSE into HOF lambdas), with
exact DuckDB twins in __spark_entry__ — keep the two in sync. All metrics
are deterministic and guard the empty-document cases the oracle sees.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Gopher-style symbols: hash marks and ellipses stand in for boilerplate
SYMBOL_PATTERN = r"#|\.\.\.|…"
BULLET_PREFIX_PATTERN = r"^\s*([-*•‣▪])"
ELLIPSIS_SUFFIX_PATTERN = r"(\.\.\.|…)\s*$"


def _nonempty(arr: Column) -> Column:
    return F.filter(arr, lambda x: F.trim(x) != "")


def with_repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds the repetition/quality gate metrics, all rounded to 6 places
    (engine-portable):

    * dup_line_frac       — fraction of non-empty lines that repeat
    * dup_para_frac       — fraction of blank-line-separated paragraphs
                            that repeat
    * top_bigram_frac     — occurrences of the most frequent word bigram
                            over all bigram occurrences
    * symbol_word_ratio   — (# of '#'/'…'/'...') / words
    * mean_word_len       — mean whitespace-token length
    * bullet_line_frac    — lines starting with a bullet glyph
    * ellipsis_line_frac  — lines ending with an ellipsis
    """
    txt = F.col(text_col)
    words = F.expr(
        f"filter(split(trim({text_col}), '\\\\s+'), x -> x != '')"
    )
    lines = _nonempty(F.split(txt, "\n"))
    paras = _nonempty(F.split(txt, r"\n{2,}"))

    staged = df.withColumn("_w", words).withColumn("_l", lines).withColumn("_p", paras)

    def dup_frac(arr_name: str) -> Column:
        n = F.size(F.col(arr_name))
        nd = F.size(F.array_distinct(F.col(arr_name)))
        return F.when(n == 0, F.lit(0.0)).otherwise(
            F.round((n - nd) / n.cast("double"), 6)
        )

    # word bigrams WITH multiplicity (repetition is the signal)
    bigrams = F.expr(
        "CASE WHEN size(_w) < 2 THEN array() "
        "ELSE transform(sequence(1, size(_w) - 1), "
        "     i -> concat(element_at(_w, i), ' ', element_at(_w, i + 1))) END"
    )
    staged = staged.withColumn("_bg", bigrams)
    top_bigram = F.expr(
        "CASE WHEN size(_bg) = 0 THEN cast(0.0 as double) ELSE "
        "array_max(transform(array_distinct(_bg), "
        "  g -> size(filter(_bg, x -> x = g)))) / cast(size(_bg) as double) END"
    )

    n_words = F.size(F.col("_w"))
    symbol_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.round(
            F.size(F.regexp_extract_all(txt, F.lit(SYMBOL_PATTERN), F.lit(0)))
            / n_words.cast("double"),
            6,
        )
    )
    mean_word_len = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.round(
            F.aggregate(
                F.col("_w"), F.lit(0).cast("long"), lambda a, w: a + F.length(w)
            )
            / n_words.cast("double"),
            6,
        )
    )
    n_lines = F.size(F.col("_l"))

    def line_frac(pattern: str) -> Column:
        hits = F.size(
            F.filter(F.col("_l"), lambda l: l.rlike(pattern))
        )
        return F.when(n_lines == 0, F.lit(0.0)).otherwise(
            F.round(hits / n_lines.cast("double"), 6)
        )

    return (
        staged.withColumn("dup_line_frac", dup_frac("_l"))
        .withColumn("dup_para_frac", dup_frac("_p"))
        .withColumn("top_bigram_frac", F.round(top_bigram, 6))
        .withColumn("symbol_word_ratio", symbol_ratio)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("bullet_line_frac", line_frac(BULLET_PREFIX_PATTERN))
        .withColumn("ellipsis_line_frac", line_frac(ELLIPSIS_SUFFIX_PATTERN))
        .drop("_w", "_l", "_p", "_bg")
    )


def gopher_quality_gate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Boolean `gopher_pass` column: the Gopher Appendix-A style keep rule
    (word count 50-100k, mean word length 3-10, symbol ratio < 0.1,
    bullet lines < 90%, ellipsis lines < 30%, duplicate lines < 30%,
    duplicate paragraphs < 30%, top bigram < 20%)."""
    from .text import ws_token_count

    m = with_repetition_metrics(df, text_col)
    n_words = ws_token_count(F.col(text_col))
    rule = (
        n_words.between(50, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_word_ratio") < 0.1)
        & (F.col("bullet_line_frac") < 0.9)
        & (F.col("ellipsis_line_frac") < 0.3)
        & (F.col("dup_line_frac") < 0.3)
        & (F.col("dup_para_frac") < 0.3)
        & (F.col("top_bigram_frac") < 0.2)
    )
    return m.withColumn("gopher_pass", rule)
