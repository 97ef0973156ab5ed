"""PII redaction: masking behavior, staged-count semantics, null safety,
and bit-parity between the Spark (Java regex) and DuckDB (RE2) engines on
adversarial strings — the portability claim functions/pii.py makes."""

from __future__ import annotations

import pytest

from go_readability_spark.functions.pii import (
    PII_STAGES,
    duck_pii_fragments,
    with_pii_redacted,
)

CASES = [
    ("mail me at alice.smith+spam@sub.example.co.uk today", 1, 0, 0),
    ("server 192.168.001.1 and 8.8.8.8 are up", 0, 2, 0),
    ("call +1 555 867 5309 or 415-555-0133 or 415.555.0134", 0, 0, 3),
    ("a@b.io from 10.0.0.7 tel +44 201 7946 0958", 1, 1, 1),
    ("no pii here, just text 1.2 and v1.2.3 and a@b", 0, 0, 0),
    ("", 0, 0, 0),
    ("version 1.2.3.4 is an ip-shaped string", 0, 1, 0),  # documented limit
    ("x" * 5000 + " bob@example.org", 1, 0, 0),
]


def _spark_redact(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    return {
        r.id: r
        for r in with_pii_redacted(df, "text").orderBy("id").collect()
    }


def test_counts_and_masks(spark):
    rows = _spark_redact(spark, [t for t, *_ in CASES])
    for i, (text, ne, ni, np_) in enumerate(CASES):
        r = rows[i]
        assert (r.n_emails, r.n_ips, r.n_phones) == (ne, ni, np_), text
        for pat, token, col in PII_STAGES:
            if r[col]:
                assert token in r.text_redacted, text
    assert rows[0].text_redacted == "mail me at <EMAIL> today"
    assert rows[1].text_redacted == "server <IP> and <IP> are up"
    assert rows[2].text_redacted == "call <PHONE> or <PHONE> or <PHONE>"
    assert rows[4].text_redacted == CASES[4][0]  # untouched


def test_null_text_propagates(spark):
    df = spark.createDataFrame([(1, None)], "id long, text string")
    r = with_pii_redacted(df, "text").collect()[0]
    assert r.n_emails is None and r.text_redacted is None


def test_idempotent(spark):
    texts = [t for t, *_ in CASES]
    once = _spark_redact(spark, texts)
    twice = _spark_redact(spark, [once[i].text_redacted or "" for i in range(len(texts))])
    for i in range(len(texts)):
        assert twice[i].text_redacted == (once[i].text_redacted or "")
        assert (twice[i].n_emails, twice[i].n_ips, twice[i].n_phones) == (0, 0, 0)


def test_duckdb_bit_parity(spark):
    """Same strings through both engines: redaction and counts identical —
    this is what makes the driver oracle trustworthy."""
    import duckdb

    texts = [t for t, *_ in CASES] + [
        "edge trailing dot a@b.com.",          # TLD boundary
        "tab\tseparated\t1.2.3.4\t+1 555 123 4567 end",
        "unicode café bob@exämple-ascii-ok.com 127.0.0.1",
    ]
    srows = _spark_redact(spark, texts)
    f = duck_pii_fragments("t")
    con = duckdb.connect()
    con.execute("CREATE TABLE tt (id BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", list(enumerate(texts)))
    drows = con.sql(
        f"SELECT id, {f['n_emails']} e, {f['n_ips']} i, {f['n_phones']} p, "
        f"{f['redacted']} red FROM tt ORDER BY id"
    ).fetchall()
    for did, e, i_, p, red in drows:
        s = srows[did]
        assert (s.n_emails, s.n_ips, s.n_phones) == (e, i_, p), texts[did]
        assert s.text_redacted == red, texts[did]
