"""Gopher/C4-style repetition and quality filters for training-data
curation (the gates every web-scale LLM corpus pipeline applies between
extraction and tokenization — public heuristics from the Gopher (Rae et
al. 2021, arXiv:2112.11446 Appendix A) and C4 (Raffel et al. 2020) data
pipelines).

Every metric is ONE self-contained JVM expression whose intermediate
arrays (words / lines / paragraphs / bigrams) are bound as higher-order-
function lambda variables. The binding matters: a staged column referenced
several times gets re-substituted by CollapseProject/predicate-pushdown,
and an array rebuilt INSIDE a per-element lambda turns the top-bigram
metric into an O(grams x words) re-tokenization per row — measured as a
multi-minute hang on 60 synthetic documents when the gate predicate was
pushed through the staging projection. A lambda-bound value is materialized
exactly once per row no matter where the optimizer moves the expression.

DuckDB twins live in __spark_entry__ — keep the formulas in sync.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SYMBOL_PATTERN = "#|\\\\.\\\\.\\\\.|…"
BULLET_PREFIX_PATTERN = "^\\\\s*([-*•‣▪])"
ELLIPSIS_SUFFIX_PATTERN = "(\\\\.\\\\.\\\\.|…)\\\\s*$"

_ZERO = "cast(0.0 as double)"


def _arrays_sql(text_col: str) -> str:
    """named_struct('w', words, 'l', lines, 'p', paragraphs)."""
    return (
        f"named_struct("
        f"'w', filter(split(trim({text_col}), '\\\\s+'), x -> x != ''), "
        # \r?\n so CRLF documents split identically — with bare \n the
        # paragraph split NEVER fires on Windows line endings and the
        # duplicate-paragraph gate is silently disabled (review finding)
        f"'l', filter(split({text_col}, '\\\\r?\\\\n'), x -> trim(x) != ''), "
        f"'p', filter(split({text_col}, '(?:\\\\r?\\\\n){{2,}}'), x -> trim(x) != ''))"
    )


_BIGRAMS = (
    "CASE WHEN size(s.w) < 2 THEN array() "
    "ELSE transform(sequence(1, size(s.w) - 1), "
    "     i -> concat(element_at(s.w, i), ' ', element_at(s.w, i + 1))) END"
)


def _bound(text_col: str, inner: str) -> Column:
    """Evaluate `inner` with s = the arrays struct and bg = the bigram
    array, each bound ONCE per row via single-element-array transforms."""
    return F.expr(
        f"element_at(transform(array({_arrays_sql(text_col)}), "
        f"s -> element_at(transform(array({_BIGRAMS}), bg -> {inner}), 1)), 1)"
    )


def _dup_frac(arr: str) -> str:
    return (
        f"CASE WHEN size({arr}) = 0 THEN {_ZERO} "
        f"ELSE round((size({arr}) - size(array_distinct({arr}))) "
        f"     / cast(size({arr}) as double), 6) END"
    )


def _line_frac(pattern: str) -> str:
    return (
        f"CASE WHEN size(s.l) = 0 THEN {_ZERO} "
        f"ELSE round(size(filter(s.l, x -> x rlike '{pattern}')) "
        f"     / cast(size(s.l) as double), 6) END"
    )


def _metric_sqls(text_col: str) -> dict[str, str]:
    return {
        "dup_line_frac": _dup_frac("s.l"),
        "dup_para_frac": _dup_frac("s.p"),
        "top_bigram_frac": (
            f"round(CASE WHEN size(bg) = 0 THEN {_ZERO} "
            f"ELSE array_max(transform(array_distinct(bg), "
            f"     g -> size(filter(bg, x -> x = g)))) "
            f"     / cast(size(bg) as double) END, 6)"
        ),
        "symbol_word_ratio": (
            f"CASE WHEN size(s.w) = 0 THEN {_ZERO} "
            f"ELSE round(size(regexp_extract_all({text_col}, '{SYMBOL_PATTERN}', 0)) "
            f"     / cast(size(s.w) as double), 6) END"
        ),
        "mean_word_len": (
            f"CASE WHEN size(s.w) = 0 THEN {_ZERO} "
            f"ELSE round(aggregate(s.w, cast(0 as bigint), (a, x) -> a + length(x)) "
            f"     / cast(size(s.w) as double), 6) END"
        ),
        "bullet_line_frac": _line_frac(BULLET_PREFIX_PATTERN),
        "ellipsis_line_frac": _line_frac(ELLIPSIS_SUFFIX_PATTERN),
    }


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
    out = df
    for name, sql in _metric_sqls(text_col).items():
        out = out.withColumn(name, _bound(text_col, sql))
    return out


def gopher_pass_expr(text_col: str = "text") -> Column:
    """The combined Gopher Appendix-A style keep rule as ONE self-contained
    boolean expression (safe to use directly in a filter): word count
    50-100k, mean word length 3-10, symbol ratio < 0.1, bullet lines < 90%,
    ellipsis lines < 30%, duplicate lines < 30%, duplicate paragraphs
    < 30%, top bigram < 20%."""
    m = _metric_sqls(text_col)
    rule = (
        f"size(s.w) BETWEEN 50 AND 100000"
        f" AND ({m['mean_word_len']}) BETWEEN 3.0 AND 10.0"
        f" AND ({m['symbol_word_ratio']}) < 0.1"
        f" AND ({m['bullet_line_frac']}) < 0.9"
        f" AND ({m['ellipsis_line_frac']}) < 0.3"
        f" AND ({m['dup_line_frac']}) < 0.3"
        f" AND ({m['dup_para_frac']}) < 0.3"
        f" AND ({m['top_bigram_frac']}) < 0.2"
    )
    return _bound(text_col, rule)


def gopher_quality_gate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Metrics + boolean `gopher_pass` column (see gopher_pass_expr)."""
    return with_repetition_metrics(df, text_col).withColumn(
        "gopher_pass", gopher_pass_expr(text_col)
    )
