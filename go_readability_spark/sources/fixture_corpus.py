"""Scale/skew tier corpus (SURVEY.md §5 tier 3): deterministic expansion of
the reference's 118 real fixture pages into an arbitrarily large `pages`
table — real-world HTML structure (nav junk, tables, lazy images, JSON-LD)
instead of templated markup, with host/size skew.

Fixture bytes are broadcast once; expansion happens on executors."""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timedelta

from .fixtures import TEST_PAGES, fixture_case_ids


def load_fixture_blobs(test_pages: str = TEST_PAGES):
    blobs = []
    for case in fixture_case_ids(test_pages):
        with open(os.path.join(test_pages, case, "source.html"), "rb") as f:
            blobs.append((case, f.read()))
    return blobs


def fixture_mix_pages(spark, n_docs: int, seed: int = 42, test_pages: str = TEST_PAGES,
                      num_partitions: int = 32):
    """n_docs pages sampled (deterministically) from the real fixture set,
    urls perturbed per replica; ~30% land on one megahost (skew knob)."""
    import pandas as pd

    from ..plans.schema import PAGES_SCHEMA

    blobs = load_fixture_blobs(test_pages)
    if not blobs:
        raise FileNotFoundError(f"no fixtures under {test_pages}")
    sc = spark.sparkContext
    b_blobs = sc.broadcast(blobs)

    def gen(batches):
        cases = b_blobs.value
        n_cases = len(cases)
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for idx in pdf["id"]:
                idx = int(idx)
                h = hashlib.sha256(f"{seed}:{idx}".encode()).digest()
                case, html = cases[int.from_bytes(h[:4], "big") % n_cases]
                host = (
                    "megahost.example.org"
                    if h[4] < 77  # ~30%
                    else f"site{h[5] % 32}.example.org"
                )
                rows["url"].append(f"https://{host}/{case}/{idx}.html")
                rows["warc_ts"].append(datetime(2025, 1, 1) + timedelta(seconds=idx))
                rows["html"].append(html)
                rows["text"].append(None)
                rows["lang"].append(None)
            yield pd.DataFrame(rows)

    return spark.range(0, n_docs, 1, num_partitions).mapInPandas(
        gen, schema=PAGES_SCHEMA
    )


# ------------------------------------------------- driver parity corpus
#
# The 118 reference fixtures materialized as two parquet tables so the
# DRIVER's correctness gate (not just pytest) hash-verifies extraction
# itself: `fixture_pages` is the input (url, warc_ts, html), and
# `fixture_goldens` carries the expected outputs derived from the
# reference's own goldens (expected-metadata.json verbatim; text md5 over
# expected.html body text — the same data tests/test_parity.py asserts
# against, semantics /root/reference/parser_test.go:34-111).

# ASCII whitespace collapse + soft-hyphen strip, applied to BOTH sides of
# the text hash. Java \s == [ \t\n\x0B\f\r]; the class below is spelled
# with literal control chars so the Python re and the Spark (Java) regex
# are the same automaton. Four goldens are js-beautified Mozilla imports
# where byte identity is impossible even for the reference, so the hash is
# defined over normalized text for all cases (byte-identical implies
# normalized-identical for the other 114).
ASCII_WS_CLASS = "[ \t\n\x0b\x0c\r]+"
SOFT_HYPHEN = "­"


def normalize_parity_text(s: str) -> str:
    import re

    return re.sub(ASCII_WS_CLASS, " ", s.replace(SOFT_HYPHEN, "")).strip(" ")


def normalize_parity_col(col):
    """Spark column twin of normalize_parity_text."""
    from pyspark.sql import functions as F

    return F.trim(
        F.regexp_replace(
            F.regexp_replace(col, SOFT_HYPHEN, ""), ASCII_WS_CLASS, " "
        )
    )


# Goldens whose expected.html was generated from a differently-formatted
# source revision (FIXTURES.md §7) — byte identity against expected.html is
# impossible even for the reference itself; their content_md5 golden comes
# from the pins file below instead (tests/conftest.py documents the same
# set).  videos-2/wapo-2 byte-match since round 4 (their pins equal
# md5(expected.html), so cached golden parquets are unchanged).
BEAUTIFIED_GOLDENS = {"theverge", "visibility-hidden"}

# Pinned regression values checked into the repo
# (sources/fixture_pins.json): `image` and `favicon` per fixture, plus
# content_md5 for the 4 beautified goldens. The reference publishes no
# goldens for image/favicon (its harness, parser_test.go:77-107, checks
# title/byline/excerpt/siteName/language/readerable/times only), so these
# two columns are honest regression pins — generated once from the
# metadata extractor that the parity suite verifies indirectly, and
# frozen in git so any behavior drift turns the driver oracle red.
_PINS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "fixture_pins.json")


def fixture_url(case: str) -> str:
    """Driver-corpus URL for a fixture case. The case id rides the QUERY
    string so every row's url is unique (it is the join key) while the
    PATH stays exactly the base URL the reference harness parses with —
    RFC 3986 merge ignores the base's query, so relative-href resolution
    (and therefore content bytes) match expected.html exactly."""
    return f"http://fakehost/test/page.html?case={case}"


def ensure_parity_parquets(out_dir: str | None = None,
                           test_pages: str = TEST_PAGES) -> tuple[str, str]:
    """Build (once, cached on disk) and return the paths of
    (fixture_pages.parquet, fixture_goldens.parquet).

    v2 goldens carry the FULL Article surface the driver hash-verifies:
    normalized-text md5, title/byline/excerpt/site_name/lang/readerable,
    published_time/modified_time (re-parsed from expected-metadata.json the
    way parser_test.go:267-279 does), content_md5 (md5 of the raw
    expected.html bytes — byte identity — for the 114 generator-produced
    goldens; pinned for the 4 beautified imports), and the image/favicon
    regression pins."""
    import hashlib as _hashlib
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    if out_dir is None:
        out_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            "dist", "fixtures",
        )
    pages_path = os.path.join(out_dir, "fixture_pages_v2.parquet")
    golden_path = os.path.join(out_dir, "fixture_goldens_v2.parquet")
    if os.path.exists(pages_path) and os.path.exists(golden_path):
        return pages_path, golden_path

    from ..dom import body_element, parse_html, text_content
    from ..readability.metadata import parse_date

    def _utc_naive(dt):
        from datetime import timezone

        if dt is None:
            return None
        if dt.tzinfo is None:
            return dt
        return dt.astimezone(timezone.utc).replace(tzinfo=None)

    cases = fixture_case_ids(test_pages)
    if not cases:
        raise FileNotFoundError(f"no fixtures under {test_pages}")
    pins = json.load(open(_PINS_PATH))

    pages = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    golden = {
        "url": [], "text_md5": [], "content_md5": [], "title": [], "byline": [],
        "excerpt": [], "site_name": [], "lang": [], "readerable": [],
        "image": [], "favicon": [], "published_time": [], "modified_time": [],
    }
    ts = datetime(2025, 1, 1)
    for case in cases:
        url = fixture_url(case)
        with open(os.path.join(test_pages, case, "source.html"), "rb") as f:
            pages["url"].append(url)
            pages["warc_ts"].append(ts)
            pages["html"].append(f.read())
            pages["text"].append(None)
            pages["lang"].append(None)
        exp_raw = open(os.path.join(test_pages, case, "expected.html"), "rb").read()
        exp_text = text_content(body_element(parse_html(exp_raw))).strip()
        meta = json.load(open(os.path.join(test_pages, case, "expected-metadata.json")))
        pin = pins.get(case, {})
        golden["url"].append(url)
        golden["text_md5"].append(
            _hashlib.md5(normalize_parity_text(exp_text).encode("utf-8")).hexdigest()
        )
        golden["content_md5"].append(
            pin.get("content_md5", "") if case in BEAUTIFIED_GOLDENS
            else _hashlib.md5(exp_raw).hexdigest()
        )
        golden["title"].append(meta.get("title", ""))
        golden["byline"].append(meta.get("byline") or "")
        golden["excerpt"].append(meta.get("excerpt") or "")
        golden["site_name"].append(meta.get("siteName") or "")
        golden["lang"].append(meta.get("language") or "")
        golden["readerable"].append(bool(meta.get("readerable", False)))
        golden["image"].append(pin.get("image", ""))
        golden["favicon"].append(pin.get("favicon", ""))
        for key, col in (("publishedTime", "published_time"),
                         ("modifiedTime", "modified_time")):
            want = meta.get(key)
            golden[col].append(_utc_naive(parse_date(want)) if want else None)

    os.makedirs(out_dir, exist_ok=True)
    pages_schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string()),
    ])
    golden_schema = pa.schema([
        ("url", pa.string()), ("text_md5", pa.string()),
        ("content_md5", pa.string()), ("title", pa.string()),
        ("byline", pa.string()), ("excerpt", pa.string()),
        ("site_name", pa.string()), ("lang", pa.string()),
        ("readerable", pa.bool_()),
        ("image", pa.string()), ("favicon", pa.string()),
        ("published_time", pa.timestamp("us")),
        ("modified_time", pa.timestamp("us")),
    ])
    # atomic rename so a concurrent reader never sees a half-written file
    for path, data, schema in (
        (pages_path, pages, pages_schema),
        (golden_path, golden, golden_schema),
    ):
        tmp = f"{path}.tmp-{os.getpid()}"
        pq.write_table(pa.table(data, schema=schema), tmp)
        os.replace(tmp, path)
    return pages_path, golden_path
