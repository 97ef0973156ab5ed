"""PII redaction + audit for training-data curation: mask emails, IPv4
addresses, and phone numbers in a text column and count what was masked.

Pure JVM-side column expressions (regexp_count / regexp_replace — whole
stage codegen, no Python in the hot path), map-only: no shuffle, scales
to any corpus size by partition count alone.

The patterns are deliberately restricted to the regex subset where Java
(Spark) and RE2 (DuckDB) agree — no lookaround, no backreferences, no
ambiguous alternations — so the DuckDB oracle twin is bit-exact; the
fragments in :func:`duck_pii_fragments` must stay in sync with the
constants here. Redaction is staged (emails → IPv4 → phones) and each
count is taken on the text as it looks at that stage, in both engines,
so overlap between categories can't double-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Java/RE2-portable subset: \b \d and char classes behave identically
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# +CC ddd ddd(d) dddd international, or NANP ddd-ddd-dddd / ddd.ddd.dddd
PHONE_PATTERN = r"\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]\d{4}|\b\d{3}[-.]\d{3}[-.]\d{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

# (pattern, replacement, count-column) in redaction order
PII_STAGES = (
    (EMAIL_PATTERN, EMAIL_TOKEN, "n_emails"),
    (IPV4_PATTERN, IP_TOKEN, "n_ips"),
    (PHONE_PATTERN, PHONE_TOKEN, "n_phones"),
)


def with_pii_redacted(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Add `n_emails`, `n_ips`, `n_phones` and the redacted text.

    Each intermediate redaction is staged as a real column with two
    static references (count + next replace) — safe from the
    CollapseProject single-reference re-inline trap, and evaluated once.
    Null text propagates as null counts + null redaction.
    """
    cur = F.col(text_col)
    stage_cols: list[str] = []
    for i, (pattern, token, count_col) in enumerate(PII_STAGES):
        df = df.withColumn(count_col, F.regexp_count(cur, F.lit(pattern)))
        staged = f"_pii_stage{i}"
        df = df.withColumn(staged, F.regexp_replace(cur, pattern, token))
        stage_cols.append(staged)
        cur = F.col(staged)
    return df.withColumn(out_col, cur).drop(*stage_cols)


def duck_pii_fragments(text_expr: str) -> dict[str, str]:
    """ANSI/DuckDB twins of :func:`with_pii_redacted` over `text_expr`:
    keys `n_emails n_ips n_phones redacted` — used by the driver oracle."""
    t0 = text_expr
    frags: dict[str, str] = {}
    cur = t0
    for pattern, token, count_col in PII_STAGES:
        frags[count_col] = (
            f"CAST(len(regexp_extract_all({cur}, '{pattern}')) AS INTEGER)"
        )
        cur = f"regexp_replace({cur}, '{pattern}', '{token}', 'g')"
    frags["redacted"] = cur
    return frags
