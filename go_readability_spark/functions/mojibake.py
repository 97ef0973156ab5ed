"""Mojibake repair (ftfy-lite): undo the single most common crawl-corpus
encoding accident — UTF-8 bytes decoded as Latin-1/Windows-1252 and
re-encoded ("doubly-encoded UTF-8": 'é' -> 'Ã©', '—' -> 'â€"',
'’' -> 'â€™').

Conservative by design: a row is only rewritten when (a) it contains the
characteristic marker sequences, (b) the reverse transform round-trips
cleanly, and (c) the repair strictly reduces the marker count without
introducing replacement characters. Deterministic, idempotent (repaired
text no longer matches the markers), Arrow-batched.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame

# Ã/Â/â followed by a continuation-range char, or the classic curly-quote
# wrecks — presence means "almost certainly double-encoded"
MOJIBAKE_MARKER = re.compile(
    "[ÃÂ][-¿ŒœŠšŸŽž"
    "ƒˆ˜–—‘’‚“”„"
    "†‡•…‰‹›€™]"
    "|â€|â€™|â€œ|Ã¢â|â„¢"
)


def _sloppy_1252_bytes(s: str) -> bytes:
    """ftfy's 'sloppy windows-1252': cp1252 (the curly-quote block lives at
    0x80-0x9f), with the five cp1252 holes (0x81 8D 8F 90 9D) falling back
    to the raw codepoint byte — exactly how browsers decoded them, so
    exactly how they re-appear in mojibake. Only runs on marker-flagged
    rows, so the per-char loop is off the hot path."""
    out = bytearray()
    for ch in s:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            o = ord(ch)
            if o <= 0xFF:
                out.append(o)
            else:
                raise
    return bytes(out)


# ASCII whitespace only: \s would also match U+00A0, which can be the
# SECOND byte of a mojibake pair ('Â\xa0' = double-encoded nbsp) — splitting
# there would break the pair. UTF-8 continuation bytes map to no ASCII
# whitespace under cp1252, so ASCII-whitespace boundaries never cut a
# mojibake sequence.
_ASCII_WS = re.compile(r"([ \t\n\r\f\v]+)")


def _fix_segment(s: str) -> str:
    if not MOJIBAKE_MARKER.search(s):
        return s
    try:
        fixed = _sloppy_1252_bytes(s).decode("utf-8", errors="strict")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return s
    if "�" in fixed:
        return s
    before = len(MOJIBAKE_MARKER.findall(s))
    after = len(MOJIBAKE_MARKER.findall(fixed))
    return fixed if after < before else s


def fix_mojibake_text(s: str) -> str:
    """Repair one string, or return it unchanged when not confidently
    mojibake. Repair is applied PER whitespace-separated token: real crawl
    docs mix mojibake with legitimately non-ASCII text (em-dashes, curly
    quotes), and a whole-string strict round-trip would let one legitimate
    cp1252-encodable character block every repair in the document."""
    if not s or not MOJIBAKE_MARKER.search(s):
        return s
    return "".join(
        part if i % 2 else _fix_segment(part)
        for i, part in enumerate(_ASCII_WS.split(s))
    )


def with_fixed_text(df: DataFrame, text_col: str = "text",
                    out_col: str | None = None) -> DataFrame:
    """Adds the repaired column (defaults to replacing text_col in place).
    Arrow-batched mapInPandas would be overkill — this is a scalar pandas
    UDF over one string column (vectorized batch transfer, tiny Python)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def fix(col: pd.Series) -> pd.Series:
        return col.map(lambda s: fix_mojibake_text(s) if s is not None else None)

    return df.withColumn(out_col or text_col, fix(df[text_col]))
