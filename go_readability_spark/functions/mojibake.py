"""Mojibake repair: recover text that was UTF-8 double-decoded.

The single most common encoding corruption in web corpora: a page's
UTF-8 bytes were decoded as ISO-8859-1/cp1252 somewhere upstream, so
every multibyte sequence surfaces as 1 Latin-1 char per byte
("café" -> "cafÃ©", curly quote -> "â€™").  The inverse is exact when
it applies: re-encode the characters as Latin-1 (recovering the
original bytes) and decode them as UTF-8 — the ftfy approach, public
knowledge, here as pure JVM column expressions (encode/decode/
is_valid_utf8), no Python in the hot path.

The repair fires only when ALL THREE hold, each a CASE guard so ANSI
encode/decode can never throw on the rows we leave alone:
  1. the string is Latin-1-representable (chars <= U+00FF) — otherwise
     it cannot be a Latin-1 misread in the first place (and encode
     would raise);
  2. it shows a mojibake marker: a UTF-8 lead byte 0xC2-0xF4 followed
     by a continuation byte 0x80-0xBF, read as Latin-1 chars — plain
     ASCII/Latin-1 text never matches;
  3. the recovered bytes are valid UTF-8 (is_valid_utf8) — a stray 'Ã'
     in genuine Latin-1 text fails this and is preserved.
Known ftfy tradeoff, inherited deliberately: text whose author really
meant a marker sequence like "Ã©" (and which round-trips as valid
UTF-8) is indistinguishable from mojibake and gets repaired.

Doubly-corrupted text (decoded wrong twice) repairs one layer per
application; call twice for paranoid pipelines — the operator is
idempotent on clean text.

Scale: map-only, whole-stage codegen, no shuffle, no UDF.  The three
guards are cheap (two char-class regexes + one validation pass) and
short-circuit: an ASCII-only corpus pays two regex scans per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# UTF-8 lead byte (0xC2-0xF4) + continuation byte (0x80-0xBF), as the
# Latin-1 characters they become after a wrong decode.
MOJIBAKE_MARKER = "[\\u00c2-\\u00f4][\\u0080-\\u00bf]"
_LATIN1_ONLY = "^[\\u0000-\\u00ff]*$"


def mojibake_flag(text: Column) -> Column:
    """True where `text` is repairable mojibake (all three guards)."""
    latin1 = text.rlike(_LATIN1_ONLY)
    marker = text.rlike(MOJIBAKE_MARKER)
    # is_valid_utf8 is only reachable when latin1 holds (encode of a
    # char > U+00FF raises under ANSI), hence the nested CASE
    valid = F.when(
        latin1 & marker, F.is_valid_utf8(F.encode(text, "ISO-8859-1"))
    ).otherwise(F.lit(False))
    return latin1 & marker & valid


def repair_mojibake(text: Column) -> Column:
    """The repaired text column: exact inverse decode where the guards
    hold, byte-identical passthrough everywhere else."""
    return F.when(
        mojibake_flag(text),
        F.decode(F.encode(text, "ISO-8859-1"), "UTF-8"),
    ).otherwise(text)


def with_mojibake_repaired(df: DataFrame, text_col: str = "text",
                           out_col: str | None = None,
                           flag_col: str = "was_mojibake") -> DataFrame:
    """Adds boolean `flag_col` and writes the repaired text to `out_col`
    (default: in place).  Rows failing any guard pass through
    byte-identical."""
    out_col = out_col or text_col
    text = F.col(text_col)
    return df.withColumn(flag_col, mojibake_flag(text)).withColumn(
        out_col,
        F.when(F.col(flag_col),
               F.decode(F.encode(text, "ISO-8859-1"), "UTF-8"))
        .otherwise(text),
    )
