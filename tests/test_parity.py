"""Parity tier (SURVEY.md §5 strategy 1): run the pure-Python extraction
over every reference fixture and assert text + metadata identity against the
goldens, mirroring /root/reference/parser_test.go:33-111."""

import json
import os

import pytest

from conftest import BASE_URL, BEAUTIFIED_GOLDENS, TEST_PAGES, fixture_cases

from go_readability_spark.dom import body_element, parse_html, text_content
from go_readability_spark.readability import Parser, check_document
from go_readability_spark.readability.metadata import parse_date

CASES = fixture_cases()

pytestmark = pytest.mark.skipif(not CASES, reason="reference corpus not present")


def _utc(dt):
    from datetime import timezone

    if dt.tzinfo is None:
        return dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def _norm(s: str) -> str:
    return " ".join(s.replace("\xad", "").split())


def _expected_text(case: str) -> str:
    raw = open(os.path.join(TEST_PAGES, case, "expected.html"), "rb").read()
    return text_content(body_element(parse_html(raw))).strip()


@pytest.fixture(scope="module")
def results():
    out = {}
    for case in CASES:
        src = open(os.path.join(TEST_PAGES, case, "source.html"), "rb").read()
        doc = parse_html(src)
        readerable = check_document(doc)
        art = Parser().parse_document(doc, BASE_URL)
        out[case] = (art, readerable)
    return out


@pytest.mark.parametrize("case", CASES)
def test_text_content(case, results):
    art, _ = results[case]
    exp = _expected_text(case)
    if case in BEAUTIFIED_GOLDENS:
        assert _norm(art.text_content) == _norm(exp)
    else:
        assert art.text_content == exp  # byte identity — the north invariant


@pytest.mark.parametrize("case", CASES)
def test_metadata(case, results):
    art, readerable = results[case]
    meta = json.load(open(os.path.join(TEST_PAGES, case, "expected-metadata.json")))
    assert art.title == meta.get("title", ""), "title"
    assert art.byline == (meta.get("byline") or ""), "byline"
    assert art.excerpt == (meta.get("excerpt") or ""), "excerpt"
    assert art.site_name == (meta.get("siteName") or ""), "siteName"
    assert art.language == (meta.get("language") or ""), "language"
    assert readerable == meta.get("readerable", False), "readerable"
    # times compared after re-parsing the golden strings, as the reference
    # harness does (parser_test.go:101-107, 267-279)
    for field, attr in (("publishedTime", "published_time"), ("modifiedTime", "modified_time")):
        want = meta.get(field)
        if want:
            got = getattr(art, attr)
            assert got is not None, field
            # Go compares instants via time.Equal; dateparse treats naive
            # strings as UTC (parser_test.go:101-107)
            assert _utc(got) == _utc(parse_date(want)), field


def test_length_is_rune_count(results):
    art, _ = results[CASES[0]]
    assert art.length == len(art.text_content)
