"""WAT archives — Common Crawl's pre-parsed metadata sidecar.

Common Crawl publishes three artifacts per crawl segment: WARC (raw
responses), WET (extracted text — sources/warc.py docs_from_wet), and WAT
(`metadata` records whose JSON payload carries the pre-parsed HTML
metadata, most importantly the outlink list). This module completes the
triplet: link-graph and anchor-text analysis (operators/linkgraph.py)
can run from WAT without touching HTML at all — a WAT segment is ~1/5
the bytes of its WARC and the links are already extracted, so at crawl
scale the host-graph pipeline's scan cost drops by that factor and the
regex extraction stage disappears.

Record framing is ISO 28500 like WARC/WET (iter_warc_records is reused
verbatim); only the payload differs: a JSON envelope

    Envelope.WARC-Header-Metadata.{WARC-Target-URI, WARC-Date}
    Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata
        .Head.Base                  (the page's <base href>, if any)
        .Links[] = {"path": "A@/href", "url": <href AS WRITTEN>,
                    "text": <anchor text>}

Hrefs in WAT are RAW (as written in the document, unresolved) — the same
contract as extract_links' regex output — so resolve_links applies
unchanged and the two routes (HTML regex vs WAT parse) produce identical
edge sets over the same corpus (differentially tested).

Parsing is tolerant the way crawl-scale readers must be: a record whose
JSON is malformed is skipped; a page without HTML-Metadata or Links
still yields its row (empty link array) so page counts survive; `path`
is carried through so callers can select link kinds (A@/href vs IMG@/src
vs LINK@/href) instead of this module guessing for them.

Reference: the library (go-shiori/go-readability) has no archive layer;
this is the crawl-ingestion surface of BASELINE.json's north rule
(Common-Crawl-style pages at 10^12 scale).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from datetime import datetime

from pyspark.sql import DataFrame, types as T

from .warc import (
    _parse_warc_date,
    archive_reader,
    iter_warc_records,
    warc_record,
)

WAT_LINKS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("base", T.StringType(), True),
        T.StructField(
            "links",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("path", T.StringType(), True),
                        T.StructField("href", T.StringType(), True),
                        T.StructField("text", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)


def wat_bytes_to_link_rows(raw: bytes) -> Iterator[dict]:
    """`metadata` records of one WAT archive as per-page link rows:
    (url, warc_ts, base, links[{path, href, text}]).

    A malformed JSON payload skips that record only; a page whose
    envelope lacks HTML-Metadata/Links yields an empty link list (the
    page existed — downstream page counts must see it)."""
    def _dig(d, *keys):
        for k in keys:
            d = d.get(k) if isinstance(d, dict) else None
        return d if isinstance(d, dict) else {}

    for headers, payload in iter_warc_records(raw):
        if headers.get("warc-type") != "metadata":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        try:
            env = json.loads(payload.decode("utf-8", errors="replace"))
            if not isinstance(env, dict):
                continue
            # real Common Crawl WAT carries metadata records derived
            # from request AND response records under the same target
            # URI; only the response-derived one has the page's links.
            # Keep it (and records from minimal writers that omit the
            # envelope type); skip request/metadata-derived ones, which
            # would otherwise yield 1-2 duplicate empty rows per page.
            hdr_type = _dig(env, "Envelope", "WARC-Header-Metadata").get(
                "WARC-Type")
            if hdr_type is not None and hdr_type != "response":
                continue
            meta = _dig(env, "Envelope", "Payload-Metadata",
                        "HTTP-Response-Metadata", "HTML-Metadata")
            head = meta.get("Head")
            base = head.get("Base") if isinstance(head, dict) else None
            links = []
            raw_links = meta.get("Links")
            if isinstance(raw_links, list):
                for li in raw_links:
                    if not isinstance(li, dict):
                        continue
                    href = li.get("url")
                    if href is None:
                        continue
                    # coerce to str: a non-string path/text would pass
                    # through to the Arrow serializer OUTSIDE the
                    # containment try/except and fail the whole task
                    path, text = li.get("path"), li.get("text")
                    links.append(
                        {
                            "path": None if path is None else str(path),
                            "href": str(href),
                            "text": None if text is None else str(text),
                        }
                    )
            row = {
                "url": str(url),
                "warc_ts": _parse_warc_date(headers),
                "base": base if isinstance(base, str) and base else None,
                "links": links,
            }
        except Exception:
            continue  # malformed/wrong-shape RECORD: skip it, keep the
            #           archive (per-record tolerance, not per-archive)
        yield row


def links_from_wat(spark, path: str | list[str],
                   strict: bool = False) -> DataFrame:
    """Read .wat/.wat.gz archives under `path` (dir or explicit file
    list — the file-aligned segmentation path) into per-page link rows.
    Same one-archive-per-task parallelism and corrupt-archive
    containment as pages_from_warc."""
    return archive_reader(spark, path, wat_bytes_to_link_rows,
                          schema=WAT_LINKS_SCHEMA, strict=strict)


def write_wat(
    pages: list[tuple[str, datetime, list[tuple[str, str, str]], str | None]],
    gz: bool = True,
) -> bytes:
    """Build a WAT blob from (url, ts, links, base) tuples, each link a
    (path, href, text) triple — for tests and the driver oracle row.
    Shapes the envelope exactly as the parser consumes it (and as
    Common Crawl emits it): metadata record, JSON payload, raw hrefs."""
    out = b""
    for url, ts, links, base in pages:
        html_meta: dict = {
            "Links": [
                {"path": p, "url": h, "text": t} for p, h, t in links
            ]
        }
        if base:
            html_meta["Head"] = {"Base": base}
        env = {
            "Envelope": {
                "WARC-Header-Metadata": {
                    "WARC-Target-URI": url,
                    "WARC-Date": ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                    "WARC-Type": "response",
                },
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {"HTML-Metadata": html_meta}
                },
            }
        }
        body = json.dumps(env, sort_keys=True).encode("utf-8")
        out += warc_record("metadata", url, ts, "application/json", body,
                           gz=gz)
    return out
