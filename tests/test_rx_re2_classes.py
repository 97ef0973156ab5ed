"""RE2-class parity for the remaining readability regexes (review batch 6).

Go regexp's \\s is exactly [\\t\\n\\f\\r ] and \\d/\\S are ASCII, while
Python's are Unicode (and Python's re.ASCII \\s still includes \\v, which
RE2's does not). Go's $ without (?m) anchors at end-of-TEXT; Python's $
also matches before a trailing newline. Each test here encodes the
behavior of the reference pattern (parser.go:21-64) on inputs where the
naive Python translation diverges.
"""

from go_readability_spark.readability import regexps as rx
from go_readability_spark.readability.parser import Parser, _atoi


NBSP = " "


def test_srcset_nbsp_is_not_a_separator():
    # RE2 \S+ swallows &nbsp;: "a.jpg 2x" is ONE url token to Go
    m = rx.RX_SRCSET_URL.match(f"a.jpg{NBSP}2x")
    assert m is not None and m.group(1) == f"a.jpg{NBSP}2x" and m.group(2) is None


def test_srcset_descriptor_requires_ascii_space_and_digit():
    m = rx.RX_SRCSET_URL.match("a.jpg 2x, b.jpg 400w")
    assert m.group(1) == "a.jpg" and m.group(2) == " 2x"
    # Unicode digit is not [0-9] to RE2: "٢x" is not a descriptor, so the
    # head token can't complete a match (needs , or end after it) — the
    # first match anywhere is the trailing "٢x" treated as its own URL
    assert rx.RX_SRCSET_URL.match("a.jpg ٢x") is None
    m2 = rx.RX_SRCSET_URL.search("a.jpg ٢x")
    assert m2.group(1) == "٢x" and m2.group(2) is None


def test_lazy_srcset_needs_ascii_space_digit():
    assert rx.RX_LAZY_IMAGE_SRCSET.search(".jpg 2") is not None
    assert rx.RX_LAZY_IMAGE_SRCSET.search(f".jpg{NBSP}2") is None
    assert rx.RX_LAZY_IMAGE_SRCSET.search(".jpg ٢") is None


def test_display_none_nbsp_not_whitespace():
    assert rx.RX_DISPLAY_NONE.search("display: none") is not None
    assert rx.RX_DISPLAY_NONE.search(f"display:{NBSP}none") is None
    assert rx.RX_VISIBILITY_HIDDEN.search(f"visibility:{NBSP}hidden") is None


def test_b64_data_url_nbsp():
    assert rx.RX_B64_DATA_URL.match("data:image/png;base64,AAAA") is not None
    # RE2 [^\s;,] INCLUDES &nbsp; (its \s is ASCII), so the mime group
    # captures it — and then never string-equals "image/svg+xml" at the
    # unwrapNoscriptImages call site (parser.go:1922-1933)
    m = rx.RX_B64_DATA_URL.match(f"data:{NBSP}image/svg+xml;base64,AAAA")
    assert m is not None and m.group(1) == f"{NBSP}image/svg+xml"
    assert m.group(1) != "image/svg+xml"


def test_has_content_trailing_newline_is_not_content():
    # rxHasContent is `\S$`: end-of-text in RE2, so "x\n" has NO content
    assert rx.RX_HAS_CONTENT.search("x") is not None
    assert rx.RX_HAS_CONTENT.search("x\n") is None
    assert rx.RX_HAS_CONTENT.search("x\v") is not None  # \v IS \S to RE2


def test_sentence_period_end_of_text_only():
    assert rx.RX_SENTENCE_PERIOD.search("done.") is not None
    assert rx.RX_SENTENCE_PERIOD.search("done. next") is not None
    assert rx.RX_SENTENCE_PERIOD.search("done.\n") is None


def test_atoi_rejects_trailing_newline():
    assert _atoi("5") == 5 and _atoi("-12") == -12
    assert _atoi("5\n") == 0  # strconv.Atoi("5\n") errors
    assert _atoi(" 5") == 0 and _atoi("٥") == 0


def test_name_pattern_vertical_tab():
    # RE2 \s excludes \v; Python re.ASCII \s includes it
    assert rx.RX_NAME_PATTERN.match("dc:title") is not None
    assert rx.RX_NAME_PATTERN.match("dc:title\n") is not None  # \n IS Go \s
    assert rx.RX_NAME_PATTERN.match("dc:title\v") is None


def test_jsonld_api_reference_anchor():
    assert rx.RX_JSONLD_ARTICLE_TYPES.search("APIReference") is not None
    assert rx.RX_JSONLD_ARTICLE_TYPES.search("APIReference\n") is None
    # unanchored middle alternatives still match with trailing text (the
    # reference pattern's own quirk, kept bug-compatible)
    assert rx.RX_JSONLD_ARTICLE_TYPES.search("NewsArticle\n") is not None


def test_schema_org_trailing_newline():
    assert rx.RX_SCHEMA_ORG.search("https://schema.org") is not None
    assert rx.RX_SCHEMA_ORG.search("https://schema.org\n") is None


def test_srcset_rewrite_end_to_end_with_nbsp():
    """The whole-pipeline effect: an &nbsp; inside srcset keeps the Go
    tokenization (one URL), not Python's (url + descriptor)."""
    html = (
        "<html><body><article>"
        "<p>Long enough paragraph of article text, with commas, sentences."
        " More filler prose to keep the candidate scoring happy.</p>"
        f'<img src="p/a.jpg" srcset="p/a.jpg{NBSP}2x">'
        "</article></body></html>"
    )
    art = Parser().parse(html, page_url="http://ex.com/dir/page.html")
    if art.content and "srcset" in art.content:
        # whole token absolutized: the nbsp is part of the URL path (Go
        # net/url escapes it), not a separator before a "2x" descriptor
        assert "a.jpg %32x".replace(" ", NBSP) not in art.content
        assert "p/a.jpg" in art.content
