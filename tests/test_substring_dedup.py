"""Exact-substring span dedup: behavior on planted duplicates, exactness
vs a from-scratch pure-Python reference of the same algorithm, and the
invariants (kept + dropped == total; short docs untouched)."""

from __future__ import annotations

import hashlib
import re

from go_readability_spark.operators.substring_dedup import (
    remove_duplicated_spans,
)

SPAN = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"  # 12 toks
CORPUS = [
    (0, f"intro words here {SPAN} and a unique tail for zero"),
    (1, f"{SPAN} different continuation text for document one entirely"),
    (2, "a fully unique document with no repeated spans at all in it whatsoever"),
    (3, "short doc"),
    (4, ""),
    (5, f"repeat inside one doc {SPAN} middle filler tokens {SPAN} done"),
    (6, "Mixed CASE   and   extra    whitespace document unique text"),
]


def _md5p(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_reference(corpus, length=12):
    toks = {
        i: [t for t in re.sub(r"\s+", " ", txt.strip().lower()).split(" ") if t]
        for i, txt in corpus
    }
    from collections import Counter

    occ = Counter()
    for ws in toks.values():
        for i in range(len(ws) - length + 1):
            occ[_md5p(" ".join(ws[i:i + length]))] += 1
    out = {}
    for did, ws in toks.items():
        covered = set()
        for i in range(len(ws) - length + 1):
            if occ[_md5p(" ".join(ws[i:i + length]))] > 1:
                covered.update(range(i, i + length))
        kept = [w for j, w in enumerate(ws) if j not in covered]
        out[did] = (" ".join(kept), len(kept), len(ws) - len(kept))
    return out


def test_matches_pure_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_tokens_kept, r.n_tokens_dropped)
        for r in remove_duplicated_spans(df, length=12).collect()
    }
    assert got == _py_reference(CORPUS)


def test_planted_span_removed_everywhere(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r.doc_id: r for r in remove_duplicated_spans(df, length=12).collect()}
    for i in (0, 1, 5):
        assert "alpha beta gamma" not in got[i].clean_text, i
        assert got[i].n_tokens_dropped >= 12, i
    # unique docs untouched
    assert got[2].clean_text.startswith("a fully unique document")
    assert got[2].n_tokens_dropped == 0
    assert got[3].clean_text == "short doc" and got[3].n_tokens_dropped == 0
    assert got[4].clean_text == "" and got[4].n_tokens_kept == 0
    # same-doc repetition: both occurrences cut
    assert got[5].clean_text == "repeat inside one doc middle filler tokens done"


def test_kept_plus_dropped_is_total(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    for r in remove_duplicated_spans(df, length=12).collect():
        total = len([t for t in re.sub(r"\s+", " ", dict(CORPUS)[r.doc_id].strip().lower()).split(" ") if t])
        assert r.n_tokens_kept + r.n_tokens_dropped == total


def test_duckdb_tokenizer_matches_java_on_vertical_tab(spark):
    """RE2's \\s omits \\x0B; the oracles spell the whitespace class out
    (DUCK_WS_CLASS) so a vertical tab splits tokens in BOTH engines."""
    import duckdb

    from go_readability_spark.functions.text import DUCK_WS_CLASS

    text = "alpha\x0bbeta gamma"
    duck = duckdb.sql(
        "SELECT list_filter(string_split_regex(trim(regexp_replace(lower(?),"
        f" '{DUCK_WS_CLASS}', ' ', 'g')), ' '), x -> x != '') AS t",
        params=[text],
    ).fetchone()[0]
    from pyspark.sql import functions as F

    from go_readability_spark.operators.dedup import normalized_text

    spark_toks = (
        spark.createDataFrame([(text,)], "text string")
        .select(F.split(F.trim(normalized_text(F.col("text"))), " ").alias("t"))
        .collect()[0].t
    )
    assert duck == spark_toks == ["alpha", "beta", "gamma"]
