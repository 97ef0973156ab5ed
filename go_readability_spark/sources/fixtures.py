"""Pack the reference test corpus into the north-rule `pages` table shape
and the `expected_articles` golden table (FIXTURES.md §1-2)."""

from __future__ import annotations

import hashlib
import json
import os
from datetime import datetime, timedelta

TEST_PAGES = "/root/reference/test-pages"
BASE_URL = "http://fakehost/test/page.html"


def fixture_case_ids(test_pages: str = TEST_PAGES) -> list[str]:
    if not os.path.isdir(test_pages):
        return []
    return sorted(
        c
        for c in os.listdir(test_pages)
        if os.path.isfile(os.path.join(test_pages, c, "source.html"))
    )


def case_url(case_id: str) -> str:
    # the reference harness parses every fixture against the same base URL
    # (parser_test.go:19); the fragment keeps urls unique per case while
    # resolving identically (fragments don't participate in resolution)
    return f"{BASE_URL}#{case_id}"


def deterministic_ts(url: str) -> datetime:
    h = int.from_bytes(hashlib.sha1(url.encode()).digest()[:4], "big")
    return datetime(2025, 1, 1) + timedelta(days=h % 365, seconds=h % 86400)


def load_pages_rows(test_pages: str = TEST_PAGES):
    rows = []
    for case in fixture_case_ids(test_pages):
        src = open(os.path.join(test_pages, case, "source.html"), "rb").read()
        meta = json.load(open(os.path.join(test_pages, case, "expected-metadata.json")))
        url = case_url(case)
        rows.append(
            {
                "url": url,
                "warc_ts": deterministic_ts(url),
                "html": src,
                "text": None,
                "lang": meta.get("language"),
            }
        )
    return rows


def pages_dataframe(spark, test_pages: str = TEST_PAGES):
    from ..plans.schema import PAGES_SCHEMA

    return spark.createDataFrame(load_pages_rows(test_pages), schema=PAGES_SCHEMA)


def expected_articles_rows(test_pages: str = TEST_PAGES):
    """Golden rows; expected_text computed with our DOM (both sides of the
    parity join use the same textContent definition)."""
    from ..dom import body_element, parse_html, text_content

    rows = []
    for case in fixture_case_ids(test_pages):
        raw = open(os.path.join(test_pages, case, "expected.html"), "rb").read()
        meta = json.load(open(os.path.join(test_pages, case, "expected-metadata.json")))
        rows.append(
            {
                "url": case_url(case),
                "case_id": case,
                "expected_text": text_content(body_element(parse_html(raw))).strip(),
                "expected_html": raw.decode("utf-8", errors="replace"),
                "title": meta.get("title"),
                "byline": meta.get("byline"),
                "excerpt": meta.get("excerpt"),
                "site_name": meta.get("siteName"),
                "language": meta.get("language"),
                "readerable": meta.get("readerable", False),
            }
        )
    return rows
