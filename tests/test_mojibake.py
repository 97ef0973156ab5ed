"""Mojibake repair (functions/mojibake.py): double-decode inversion."""

import pytest

from go_readability_spark.functions import with_mojibake_repaired


def _repair(spark, s):
    df = spark.createDataFrame([(s,)], "text string")
    r = with_mojibake_repaired(df).collect()[0]
    return r.text, r.was_mojibake


def _corrupt(s: str) -> str:
    """Simulate the upstream bug: UTF-8 bytes decoded as Latin-1."""
    return s.encode("utf-8").decode("iso-8859-1")


@pytest.mark.parametrize("clean", [
    "café au lait",
    "curly ’quotes“ and — dashes…",
    "mixed 日本語 and ASCII",
    "emoji 🎉 four-byte",
    "naïve Ångström's œuvre",
])
def test_roundtrip_repairs_exactly(spark, clean):
    fixed, flag = _repair(spark, _corrupt(clean))
    assert flag is True
    assert fixed == clean


@pytest.mark.parametrize("s", [
    "plain ascii only",
    "genuine latin-1: café ±2°",         # marker absent -> untouched
    "stray lead byte Ã not mojibake",     # invalid UTF-8 -> untouched
    "already wide 日本語",                 # not latin-1 -> untouched
    "",
    "tabs\tand\nnewlines stay ascii",
])
def test_clean_text_passes_through(spark, s):
    fixed, flag = _repair(spark, s)
    assert flag is False
    assert fixed == s


def test_idempotent_on_repaired_output(spark):
    once, _ = _repair(spark, _corrupt("café — ’…"))
    twice, flag = _repair(spark, once)
    assert twice == once and flag is False


def test_double_corruption_one_layer_per_pass(spark):
    clean = "café"
    twice_corrupted = _corrupt(_corrupt(clean))
    once_fixed, f1 = _repair(spark, twice_corrupted)
    assert f1 is True and once_fixed == _corrupt(clean)
    fully_fixed, f2 = _repair(spark, once_fixed)
    assert f2 is True and fully_fixed == clean


def test_out_col_and_plan_shape(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(_corrupt("é"),)], "text string")
    out = with_mojibake_repaired(df, out_col="fixed")
    row = out.collect()[0]
    assert row.text == _corrupt("é") and row.fixed == "é"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # map-only


def test_column_batch(spark):
    """Mixed batch: each row independently gated (no task failure from
    ANSI encode/decode on the unrepairable rows)."""
    rows = [(_corrupt("déjà vu"),), ("plain",), ("日本語",), ("Ã",)]
    df = spark.createDataFrame(rows, "text string")
    got = [r.text for r in with_mojibake_repaired(df).collect()]
    assert got == ["déjà vu", "plain", "日本語", "Ã"]


def test_curate_fix_mojibake_end_to_end(spark):
    """--fix-mojibake repairs extracted article text inside the full
    curation pipeline (extraction -> repair -> gates -> dedup)."""
    from pyspark.sql import functions as F

    from go_readability_spark.plans import curate_corpus

    body = ("This is a long enough clean paragraph about data pipelines "
            "and their curious habits, repeated for length. " * 5)
    clean_tail = "café — naïve “quoted” résumé"
    corrupted_tail = clean_tail.encode("utf-8").decode("iso-8859-1")
    html = (f"<html><body><div class='article-content'><h1>T</h1>"
            f"<p>{body}</p><p>{body} {corrupted_tail}</p></div>"
            f"</body></html>").encode()
    pages = spark.createDataFrame(
        [("https://m.example.org/a.html", None, bytearray(html), None, None)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = curate_corpus(pages, min_length=50, min_quality=0.0,
                        languages=(), fix_mojibake=True).collect()
    assert len(out) == 1
    text = out[0].text_content
    assert clean_tail in text
    assert "Ã©" not in text and "â€" not in text


def test_unicode_normalization_forms(spark):
    import unicodedata

    from go_readability_spark.functions import with_normalized_text

    decomposed = "Café ℌ ﬁne Ａ"
    df = spark.createDataFrame([(decomposed,), (None,)], "text string")
    nfc = [r.text for r in with_normalized_text(df, form="NFC").collect()]
    assert nfc[0] == unicodedata.normalize("NFC", decomposed)
    assert "Café" in nfc[0] and "ℌ" in nfc[0]  # NFC keeps script H
    assert nfc[1] is None
    nfkc = [r.text for r in with_normalized_text(df, form="NFKC").collect()]
    assert nfkc[0] == unicodedata.normalize("NFKC", decomposed)
    assert "H" in nfkc[0] and "fine" in nfkc[0] and " A" in nfkc[0]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="form"):
        with_normalized_text(df, form="NFX")
