"""Robustness tier: hostile/degenerate input must never crash the UDF —
at 10^12 documents every pathological page shape WILL occur."""

import pytest

from go_readability_spark.plans.extract import extract_record


def _ok(record):
    assert record["error"] is None, record["error"]
    assert record["length"] == len(record["text_content"])
    return record


def test_deep_div_nesting():
    html = b"<html><body>" + b"<div>" * 3000 + b"deep content here" + b"</div>" * 3000
    _ok(extract_record("http://x/d.html", html))


def test_deep_phrasing_nesting():
    html = b"<p>" + b"<span>" * 2500 + b"x" + b"</span>" * 2500
    _ok(extract_record("http://x/s.html", html))


def test_deep_anchor_chain():
    html = b"<body>" + b"<a href=x>" * 2000 + b"t" + b"</a>" * 2000
    _ok(extract_record("http://x/a.html", html))


def test_binary_garbage():
    _ok(extract_record("http://x/g.html", bytes(range(256)) * 20))


def test_empty_and_none():
    _ok(extract_record("http://x/e.html", b""))
    _ok(extract_record("http://x/n.html", None))


def test_null_bytes_and_bad_utf8():
    _ok(extract_record("http://x/z.html", b"<p>a\x00b\xff\xfec</p>"))


def test_unclosed_everything():
    _ok(extract_record("http://x/u.html", b"<div><table><tr><td><b><i>text<p>more"))


def test_huge_attribute():
    html = b'<p class="' + b"x" * 500_000 + b'">content</p>'
    _ok(extract_record("http://x/h.html", html))


def test_many_siblings():
    html = b"<body>" + b"<p>para text</p>" * 20_000
    _ok(extract_record("http://x/m.html", html))


@pytest.mark.parametrize("snippet", [
    b"<script>while(1){<div>", b"<!--", b"<![CDATA[junk", b"<?php echo ?>",
    b"</p></div></table>", b"<svg><foreignObject><div>x</div></foreignObject></svg>",
    b"<table><table><table>a", b"<select><option><p>x",
])
def test_fragment_zoo(snippet):
    _ok(extract_record("http://x/f.html", snippet))


def test_hypothesis_fuzz():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    tags = st.sampled_from(
        ["div", "p", "a", "span", "table", "tr", "td", "ul", "li", "script",
         "style", "noscript", "title", "br", "img", "h1", "form", "svg"]
    )
    chunk = st.one_of(
        st.text(max_size=30),
        tags.map(lambda t: f"<{t}>"),
        tags.map(lambda t: f"</{t}>"),
        tags.map(lambda t: f"<{t} class='c{t}' id='i{t}'>"),
        st.sampled_from(["<!-- c -->", "&amp;", "&#x41;", "<![CDATA[x]]>", "<!DOCTYPE html>"]),
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(chunk, max_size=60))
    def run(parts):
        html = "".join(parts).encode("utf-8", "replace")
        rec = extract_record("http://fuzz/x.html", html)
        assert rec["error"] is None
        assert rec["length"] == len(rec["text_content"])

    run()


def test_charset_sniffing():
    """Non-UTF8 pages decode via declared charset; valid UTF-8 always wins
    (the `qq` fixture declares gb2312 but IS UTF-8 — parity depends on it)."""
    from go_readability_spark.dom import body_element, parse_html, text_content

    gb = "<html><head><meta charset=gb2312></head><body><p>中文内容测试页面很长的句子</p></body></html>".encode("gb2312")
    doc = parse_html(gb)
    assert "中文内容测试页面" in text_content(body_element(doc))

    latin = "<html><head><meta charset=iso-8859-1></head><body><p>café naïve</p></body></html>".encode("latin-1")
    assert "café naïve" in text_content(body_element(parse_html(latin)))

    # declared-but-wrong charset: valid UTF-8 bytes stay UTF-8
    utf8_claiming_gb = "<meta charset=gb2312><p>日本語テキスト</p>".encode("utf-8")
    assert "日本語テキスト" in text_content(body_element(parse_html(utf8_claiming_gb)))


def test_cross_process_determinism():
    """Extraction must be identical under different PYTHONHASHSEEDs — at
    10^12 rows, executor processes have different hash seeds and results
    must not depend on set/dict iteration order."""
    import hashlib
    import os
    import subprocess
    import sys

    script = (
        "import sys, hashlib; sys.path.insert(0, '/root/repo')\n"
        "from go_readability_spark.sources.synthetic import synth_corpus_rows\n"
        "from go_readability_spark.plans.extract import extract_record\n"
        "h = hashlib.sha256()\n"
        "for r in synth_corpus_rows(20, seed=77, skew=True):\n"
        "    rec = extract_record(r['url'], r['html'])\n"
        "    h.update(rec['text_content'].encode()); h.update(rec['content'].encode())\n"
        "    h.update(str(rec['title']).encode()); h.update(str(rec['readerable']).encode())\n"
        "print(h.hexdigest())\n"
    )
    digests = set()
    for seed in ("0", "1", "42424242"):
        env = dict(os.environ, PYTHONHASHSEED=seed)
        out = subprocess.run([sys.executable, "-c", script], env=env,
                             capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-500:]
        digests.add(out.stdout.strip())
    assert len(digests) == 1, digests


def test_nesting_bomb_is_linear_and_lossless():
    """Unclosed '<div><p>' bombs made the per-start-tag scope scan walk an
    unbounded open stack — O(n^2), minutes of CPU for one hostile page.
    The Blink-style 512 element-depth cap bounds the stack (content still
    attaches, flat) and parsing stays linear."""
    import time

    from go_readability_spark.dom import parse_html, text_content
    from go_readability_spark.plans.extract import extract_record

    t0 = time.time()
    doc = parse_html(("<div><p>" * 30000 + "payload text").encode())
    assert time.time() - t0 < 30, "nesting bomb not linear"
    assert "payload text" in text_content(doc)

    # legitimate deep-but-closed documents keep their content too
    rec = extract_record(
        "https://x.example/deep",
        ("<div>" * 5000 + "deep text content here" + "</div>" * 5000).encode(),
    )
    assert rec["error"] is None


# ------------------------- round-2 continuation: core parity review fixes

def test_bom_stripped_before_tokenizing():
    """HTML5 §13.2.3.5 / x/net/html: a UTF-8 BOM must not flip the builder
    to in_body before <head> (title/meta were misplaced into body and
    scored as article content)."""
    from go_readability_spark.dom import parse_html
    from go_readability_spark.dom.serialize import outer_html

    s = outer_html(parse_html(
        b"\xef\xbb\xbf<html><head><title>My Title</title></head><body><p>hi</p></body></html>"
    ))
    assert "<head><title>My Title</title></head>" in s
    assert "﻿" not in s


def test_stray_end_head_in_body_ignored():
    from go_readability_spark.dom import parse_html
    from go_readability_spark.dom.serialize import outer_html

    s = outer_html(parse_html(b"<body><div id=a><p>one</p></head><p>two</p></div>"))
    assert '<div id="a"><p>one</p><p>two</p></div>' in s, s


def test_self_closed_foreign_root_acknowledged():
    """<svg/> must close immediately (HTML5 foreign content honors the
    self-closing flag) — it previously swallowed the rest of the document
    into the svg subtree."""
    from go_readability_spark.dom import parse_html
    from go_readability_spark.dom.serialize import outer_html

    s = outer_html(parse_html(b"<body><p>one</p><svg/><p>two</p></body>"))
    assert "<svg></svg><p>two</p>" in s, s
    # nested self-closed foreign element inside foreign content
    s2 = outer_html(parse_html(b"<body><svg><circle/><rect></rect></svg><p>after</p>"))
    assert "<p>after</p>" in s2, s2


def test_self_closed_script_is_rawtext():
    """x/net/html's tokenizer enters script-data state on <script/> — the
    following markup is script TEXT up to </script>, never real elements
    (they were previously parsed as elements inside <script> and then
    deleted by removeScripts)."""
    from go_readability_spark.dom import parse_html
    from go_readability_spark.dom.serialize import outer_html

    s = outer_html(parse_html(
        b'<body><script src="x"/>inside<p>still inside</p></script><p>outside</p>'
    ))
    assert '<script src="x">inside<p>still inside</p></script>' in s, s
    assert s.count("<p>outside</p>") == 1


def test_ascii_whitespace_regex_parity():
    """RE2's \\s is [\\t\\n\\f\\r ] exactly: &nbsp; and \\v are NOT
    whitespace (Unicode \\s flipped br-chain collapsing and
    single-tag-inside decisions vs the reference)."""
    from go_readability_spark.readability import regexps as rx

    assert rx.RX_WHITESPACE.match(" \t\n\f\r ")
    assert not rx.RX_WHITESPACE.match("\xa0")
    assert not rx.RX_WHITESPACE.match("\v")
    assert rx.RX_HAS_CONTENT.search("x\xa0")   # nbsp at end IS content
    assert rx.RX_HAS_CONTENT.search("x\v")
    assert not rx.RX_HAS_CONTENT.search("x ")


def test_span_attributes_atoi_strict():
    """strconv.Atoi parity: int(' 5 ') / int('1_0') / Unicode digits must
    NOT count as valid spans (they flipped data-table marking)."""
    from go_readability_spark.readability.parser import _atoi

    assert _atoi("5") == 5 and _atoi("+7") == 7 and _atoi("-2") == -2
    for bad in (" 5 ", "1_0", "٥", "5x", "", None, "+ 5"):
        assert _atoi(bad) == 0, bad


def test_parse_date_deterministic_defaults():
    """Missing date components must fill from a FIXED default, not the
    current day (published_time differed per run date; short months even
    raised on the 29th-31st)."""
    from datetime import datetime

    from go_readability_spark.readability.metadata import parse_date

    assert parse_date("May 2020") == datetime(2020, 5, 1)
    assert parse_date("February 2021") == datetime(2021, 2, 1)
