"""URL canonicalization for crawl dedup: the same page is re-seen under
scheme/case variants, default ports, fragments, tracking parameters, and
shuffled query order. `canonical_url` normalizes all of these with pure
column expressions whose regex/list semantics are identical in DuckDB, so
the oracle verifies it bit-for-bit.

Normalization (deliberately conservative — nothing lossy beyond fragments
and known tracking params):
  1. strip the #fragment
  2. lowercase the scheme://authority prefix
  3. drop default ports (http:80, https:443)
  4. drop utm_*/fbclid/gclid/msclkid/igshid/mc_eid tracking params
  5. sort surviving query params (order-insensitive identity)
  6. drop a now-empty '?'
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TRACKING_PARAM_PATTERN = r"^(utm_[^=]*|fbclid|gclid|msclkid|igshid|mc_eid)(=|$)"
_AUTHORITY = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds `canonical_url`. Staged intermediates keep every regex applied
    once (and make the DuckDB twin a direct transliteration)."""
    no_frag = F.regexp_replace(F.col(url_col), "#.*$", "")
    staged = df.withColumn("_cu_nf", no_frag).withColumn(
        "_cu_auth", F.regexp_extract(F.col("_cu_nf"), _AUTHORITY, 1)
    )
    # lowercase scheme + host ONLY — userinfo (user:pass@) is case-
    # sensitive per RFC 3986 §6.2.2.1, so lowercasing it would merge
    # genuinely distinct URLs — then strip default ports
    staged = staged.withColumn(
        "_cu_al",
        F.expr(
            "CASE WHEN instr(_cu_auth, '@') = 0 THEN lower(_cu_auth) "
            "ELSE lower(substring(_cu_auth, 1, instr(_cu_auth, '://') + 2)) "
            "  || substring(_cu_auth, instr(_cu_auth, '://') + 3, "
            "               instr(_cu_auth, '@') - instr(_cu_auth, '://') - 2) "
            "  || lower(substring(_cu_auth, instr(_cu_auth, '@') + 1)) END"
        ),
    )
    al = F.col("_cu_al")
    auth = F.when(
        al.startswith("http://") & al.endswith(":80"),
        F.expr("substring(_cu_al, 1, length(_cu_al) - 3)"),
    ).when(
        al.startswith("https://") & al.endswith(":443"),
        F.expr("substring(_cu_al, 1, length(_cu_al) - 4)"),
    ).otherwise(al)
    tail = F.expr("substring(_cu_nf, length(_cu_auth) + 1)")
    staged = staged.withColumn("_cu_a", auth).withColumn("_cu_t", tail)
    path = F.expr("CASE WHEN instr(_cu_t, '?') = 0 THEN _cu_t "
                  "ELSE substring(_cu_t, 1, instr(_cu_t, '?') - 1) END")
    query = F.expr("CASE WHEN instr(_cu_t, '?') = 0 THEN '' "
                   "ELSE substring(_cu_t, instr(_cu_t, '?') + 1) END")
    staged = staged.withColumn("_cu_p", path).withColumn("_cu_q0", query)
    kept = F.expr(
        f"array_join(array_sort(filter(split(_cu_q0, '&'), "
        f"x -> x != '' AND NOT x rlike '{TRACKING_PARAM_PATTERN}')), '&')"
    )
    staged = staged.withColumn("_cu_q", kept)
    canon = F.expr(
        "CASE WHEN _cu_q = '' THEN _cu_a || _cu_p ELSE _cu_a || _cu_p || '?' || _cu_q END"
    )
    return staged.withColumn("canonical_url", canon).drop(
        "_cu_nf", "_cu_auth", "_cu_al", "_cu_a", "_cu_t", "_cu_p", "_cu_q0", "_cu_q"
    )
