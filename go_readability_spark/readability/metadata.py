"""Metadata extraction: title, meta tags, JSON-LD, favicon, dates.

Fresh Python implementation of the behaviors documented in SURVEY.md §2g;
semantics cited to `/root/reference/parser.go` line ranges.
"""

from __future__ import annotations

import html as _htmlmod
import json
import re
from datetime import datetime

from ..dom import (
    get_attribute,
    get_elements_by_tag_name,
    iter_elements,
    text_content,
)
from .regexps import (
    RX_CDATA,
    RX_FAVICON_SIZE,
    RX_JSONLD_ARTICLE_TYPES,
    RX_NAME_PATTERN,
    RX_PROPERTY_PATTERN,
    RX_SCHEMA_ORG,
    RX_TITLE_ANY_SEPARATOR,
    RX_TITLE_HIERARCHY_SEP,
    RX_TITLE_REMOVE_1ST_PART,
    RX_TITLE_REMOVE_FINAL_PART,
    RX_TITLE_SEPARATOR,
    normalize_spaces,
)
from .utils import char_count, go_fields, go_trim_space, str_or, text_similarity, to_absolute_uri, word_count


def get_inner_text(node, normalize: bool = True) -> str:
    """parser.go:1664-1670."""
    txt = go_trim_space(text_content(node))
    if normalize:
        txt = normalize_spaces(txt)
    return txt


def get_article_title(doc) -> str:
    """parser.go:352-424."""
    cur_title = ""
    orig_title = ""
    title_had_hierarchical_separators = False

    titles = get_elements_by_tag_name(doc, "title")
    if titles:
        orig_title = get_inner_text(titles[0], True)
        cur_title = orig_title

    if RX_TITLE_SEPARATOR.search(cur_title):
        title_had_hierarchical_separators = bool(RX_TITLE_HIERARCHY_SEP.search(cur_title))
        cur_title = RX_TITLE_REMOVE_FINAL_PART.sub(r"\1", orig_title)
        if word_count(cur_title) < 3:
            cur_title = RX_TITLE_REMOVE_1ST_PART.sub(r"\1", orig_title)
    elif ": " in cur_title:
        headings = get_elements_by_tag_name(doc, "h1") + get_elements_by_tag_name(doc, "h2")
        trimmed_title = go_trim_space(cur_title)
        match = any(go_trim_space(text_content(h)) == trimmed_title for h in headings)
        if not match:
            cur_title = orig_title[orig_title.rfind(":") + 1:]
            if word_count(cur_title) < 3:
                cur_title = orig_title[orig_title.find(":") + 1:]
            elif word_count(orig_title[: orig_title.find(":")]) > 5:
                cur_title = orig_title
    elif char_count(cur_title) > 150 or char_count(cur_title) < 15:
        h_ones = get_elements_by_tag_name(doc, "h1")
        if len(h_ones) == 1:
            cur_title = get_inner_text(h_ones[0], True)

    cur_title = go_trim_space(cur_title)
    cur_title = normalize_spaces(cur_title)

    cur_title_word_count = word_count(cur_title)
    tmp_orig_title = RX_TITLE_ANY_SEPARATOR.sub("", orig_title)
    if cur_title_word_count <= 4 and (
        not title_had_hierarchical_separators
        or cur_title_word_count != word_count(tmp_orig_title) - 1
    ):
        cur_title = orig_title

    return cur_title


def get_jsonld(doc) -> dict:
    """parser.go:1263-1386: first schema.org Article-family ld+json block."""
    metadata: dict | None = None
    for el in iter_elements(doc):
        if el.tag != "script" or get_attribute(el, "type") != "application/ld+json":
            continue
        if metadata is not None:
            break
        content = RX_CDATA.sub("", text_content(el))
        try:
            parsed = json.loads(content)
        except Exception:
            continue
        if not isinstance(parsed, dict):
            continue
        str_context = parsed.get("@context")
        if not isinstance(str_context, str) or not RX_SCHEMA_ORG.search(str_context):
            continue

        if "@type" not in parsed:
            graph_list = parsed.get("@graph")
            if not isinstance(graph_list, list):
                continue
            for graph in graph_list:
                if not isinstance(graph, dict):
                    continue
                str_type = graph.get("@type")
                if isinstance(str_type, str) and RX_JSONLD_ARTICLE_TYPES.search(str_type):
                    parsed = graph
                    break

        str_type = parsed.get("@type")
        if not isinstance(str_type, str) or not RX_JSONLD_ARTICLE_TYPES.search(str_type):
            continue

        metadata = {}

        name = parsed.get("name")
        headline = parsed.get("headline")
        name_is_str = isinstance(name, str)
        headline_is_str = isinstance(headline, str)
        if name_is_str and headline_is_str and name != headline:
            title = get_article_title(doc)
            name_matches = text_similarity(name, title) > 0.75
            headline_matches = text_similarity(headline, title) > 0.75
            if headline_matches and not name_matches:
                metadata["title"] = headline
            else:
                metadata["title"] = name
        elif name_is_str:
            metadata["title"] = go_trim_space(name)
        elif headline_is_str:
            metadata["title"] = go_trim_space(headline)

        author = parsed.get("author")
        if isinstance(author, dict):
            author_name = author.get("name")
            if isinstance(author_name, str):
                metadata["byline"] = go_trim_space(author_name)
        elif isinstance(author, list):
            authors = []
            for a in author:
                if isinstance(a, dict) and isinstance(a.get("name"), str):
                    authors.append(go_trim_space(a["name"]))
            metadata["byline"] = ", ".join(authors)

        description = parsed.get("description")
        if isinstance(description, str):
            metadata["excerpt"] = go_trim_space(description)

        publisher = parsed.get("publisher")
        if isinstance(publisher, dict) and isinstance(publisher.get("name"), str):
            metadata["siteName"] = go_trim_space(publisher["name"])

        date_published = parsed.get("datePublished")
        if isinstance(date_published, str):
            metadata["datePublished"] = date_published

    return metadata or {}


def get_article_favicon(doc, document_uri: str | None) -> str:
    """parser.go:2172-2209: largest square PNG favicon."""
    favicon = ""
    favicon_size = -1
    for link in get_elements_by_tag_name(doc, "link"):
        link_rel = go_trim_space(get_attribute(link, "rel"))
        link_type = go_trim_space(get_attribute(link, "type"))
        link_href = go_trim_space(get_attribute(link, "href"))
        link_sizes = go_trim_space(get_attribute(link, "sizes"))

        if link_href == "" or "icon" not in link_rel:
            continue
        if link_type != "image/png" and ".png" not in link_href:
            continue

        size = 0
        for sizes_location in (link_sizes, link_href):
            m = RX_FAVICON_SIZE.search(sizes_location)
            if m is None or m.group(1) != m.group(2):
                continue
            size = int(m.group(1))
            break

        if size > favicon_size:
            favicon_size = size
            favicon = link_href

    return to_absolute_uri(favicon, document_uri)


def get_article_metadata(doc, json_ld: dict, document_uri: str | None) -> dict:
    """parser.go:1390-1508: <meta> scan + precedence chains."""
    values: dict[str, str] = {}
    for element in get_elements_by_tag_name(doc, "meta"):
        element_name = get_attribute(element, "name")
        element_property = get_attribute(element, "property")
        content = get_attribute(element, "content")
        if content == "":
            continue
        matches: list[str] = []
        if element_property != "":
            matches = [m.group(0) for m in RX_PROPERTY_PATTERN.finditer(element_property)]
            for m in reversed(matches):
                name = "".join(go_fields(m.lower()))
                values[name] = go_trim_space(content)
        if not matches and element_name != "" and RX_NAME_PATTERN.search(element_name):
            name = "".join(go_fields(element_name.lower())).replace(".", ":")
            values[name] = go_trim_space(content)

    metadata_title = str_or(
        json_ld.get("title", ""),
        values.get("dc:title", ""),
        values.get("dcterm:title", ""),
        values.get("og:title", ""),
        values.get("weibo:article:title", ""),
        values.get("weibo:webpage:title", ""),
        values.get("title", ""),
        values.get("twitter:title", ""),
    )
    if metadata_title == "":
        metadata_title = get_article_title(doc)

    metadata_byline = str_or(
        json_ld.get("byline", ""),
        values.get("dc:creator", ""),
        values.get("dcterm:creator", ""),
        values.get("author", ""),
    )

    metadata_excerpt = str_or(
        json_ld.get("excerpt", ""),
        values.get("dc:description", ""),
        values.get("dcterm:description", ""),
        values.get("og:description", ""),
        values.get("weibo:article:description", ""),
        values.get("weibo:webpage:description", ""),
        values.get("description", ""),
        values.get("twitter:description", ""),
    )

    metadata_site_name = str_or(json_ld.get("siteName", ""), values.get("og:site_name", ""))

    metadata_image = str_or(
        values.get("og:image", ""),
        values.get("image", ""),
        values.get("twitter:image", ""),
    )

    metadata_favicon = get_article_favicon(doc, document_uri)

    metadata_published_time = str_or(
        json_ld.get("datePublished", ""),
        values.get("article:published_time", ""),
        values.get("dcterms.available", ""),
        values.get("dcterms.created", ""),
        values.get("dcterms.issued", ""),
        values.get("weibo:article:create_at", ""),
    )

    metadata_modified_time = str_or(
        json_ld.get("dateModified", ""),  # never set by get_jsonld — bug-compat
        values.get("article:modified_time", ""),
        values.get("dcterms.modified", ""),
    )

    return {
        "title": _htmlmod.unescape(metadata_title),
        "byline": _htmlmod.unescape(metadata_byline),
        "excerpt": _htmlmod.unescape(metadata_excerpt),
        "siteName": _htmlmod.unescape(metadata_site_name),
        "image": metadata_image,
        "favicon": metadata_favicon,
        "publishedTime": _htmlmod.unescape(metadata_published_time),
        "modifiedTime": _htmlmod.unescape(metadata_modified_time),
    }


# ---------------------------------------------------------------- date parsing

_ISO_RX = re.compile(
    r"^\s*(\d{4})-(\d{2})-(\d{2})"
    r"(?:[T ](\d{2}):(\d{2})(?::(\d{2})(?:[.,](\d+))?)?"
    r"(Z|[+-]\d{2}:?\d{2})?)?\s*$"
)


# ASCII digits, end-of-text \Z: dateparse scans bytes, so "123\n" and
# Unicode digits are NOT an epoch to Go
_DIGITS_RX = re.compile(r"^[0-9]+\Z")
# trailing zone NAME after an explicit numeric offset (Go time.String()
# emits e.g. "2012-08-03 18:31:59 +0000 UTC"); also "(CEST)" comments
_OFFSET_THEN_NAME_RX = re.compile(r"([+-]\d{2}:?\d{2})\s+[A-Z]{2,5}$")
_PAREN_ZONE_RX = re.compile(r"\s*\([A-Za-z]{2,5}\)$")
# "PST-08" / "GMT+05:30": abbreviation glued to an explicit offset — the
# offset wins (dateparse semantics); normalize to "±HH:MM"
_ABBR_OFFSET_RX = re.compile(r"\b[A-Z]{2,5}([+-])(\d{1,2})(?::?(\d{2}))?$")
_CJK_DATE_RX = re.compile(r"^(\d{4})年(\d{1,2})月(\d{1,2})日?(.*)$")
# two-digit year at the end of a slash/dot/dash numeric date
_YY_TAIL_RX = re.compile(r"^(\d{1,2}([/.\-])\d{1,2}\2)(\d{2})(\s|$)")


def _epoch_to_datetime(s: str):
    """All-digit strings: calendar forms first (yyyymmdd,
    yyyymmddhhmmss), then unix epochs by magnitude (sec/ms/us/ns) —
    araddon/dateparse ParseAny's digit handling."""
    from datetime import timezone as _tz

    n = len(s)
    if n == 8:  # yyyymmdd
        try:
            return datetime(int(s[:4]), int(s[4:6]), int(s[6:8]))
        except ValueError:
            return None
    if n == 14:  # yyyymmddhhmmss
        try:
            return datetime(
                int(s[:4]), int(s[4:6]), int(s[6:8]),
                int(s[8:10]), int(s[10:12]), int(s[12:14]),
            )
        except ValueError:
            return None
    if n in (10, 13, 16, 19):
        v = int(s)
        scale = {10: 1, 13: 10**3, 16: 10**6, 19: 10**9}[n]
        try:
            # (v % scale) scaled to MICROseconds — note ns (scale 10^9)
            # must divide DOWN by 1000, so the multiplier form
            # `* (10**6 // scale)` would floor to 0 and drop the
            # fractional part entirely
            micro = (v % scale) * 10**6 // scale if scale > 1 else 0
            return datetime.fromtimestamp(v // scale, tz=_tz.utc).replace(
                microsecond=micro
            )
        except (ValueError, OSError, OverflowError):
            return None
    return None


def _normalize_date_string(s: str) -> str:
    m = _CJK_DATE_RX.match(s)
    if m:
        s = go_trim_space((
            f"{m.group(1)}-{int(m.group(2)):02d}-{int(m.group(3)):02d}"
            f"{m.group(4)}"
        ))
    # "September 17, 2012 at 10:09am" -> drop the connective
    s = re.sub(r"\bat\b", " ", s)
    s = _PAREN_ZONE_RX.sub("", go_trim_space(s))
    m = _OFFSET_THEN_NAME_RX.search(s)
    if m:
        s = s[: m.end(1)]
    m = _ABBR_OFFSET_RX.search(s)
    if m:
        sign, hh, mm = m.group(1), int(m.group(2)), m.group(3) or "00"
        s = f"{s[:m.start()]}{sign}{hh:02d}:{mm}"
    # Go's two-digit-year rule (time.Parse): 69-99 -> 19xx, 00-68 -> 20xx.
    # dateutil instead windows around the current year ('71 -> 2071).
    m = _YY_TAIL_RX.match(s)
    if m:
        yy = int(m.group(3))
        full = 1900 + yy if yy >= 69 else 2000 + yy
        s = f"{m.group(1)}{full}{s[m.end(3):]}"
    return go_trim_space(re.sub(r"\s+", " ", s))


def parse_date(date_str: str):
    """Emulation of araddon/dateparse.ParseAny
    (`/root/reference/parser-parse.go:149-156`): ISO fast-path, calendar/
    epoch digit strings, then dateutil over a normalized string with Go's
    conventions (two-digit-year century rule; unknown zone abbreviations
    mean offset ZERO, exactly like Go time.Parse, so instants compare
    equal to the reference). Returns a datetime or None."""
    if not date_str:
        return None
    s = go_trim_space(date_str)
    if _DIGITS_RX.match(s):
        return _epoch_to_datetime(s)
    m = _ISO_RX.match(s)
    if m:
        try:
            from datetime import timedelta, timezone

            y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
            hh = int(m.group(4) or 0)
            mm = int(m.group(5) or 0)
            ss = int(m.group(6) or 0)
            frac = m.group(7) or ""
            micro = int((frac + "000000")[:6]) if frac else 0
            tz = None
            tzs = m.group(8)
            if tzs == "Z":
                tz = timezone.utc
            elif tzs:
                sign = 1 if tzs[0] == "+" else -1
                tzs2 = tzs[1:].replace(":", "")
                tz = timezone(sign * timedelta(hours=int(tzs2[:2]), minutes=int(tzs2[2:])))
            return datetime(y, mo, d, hh, mm, ss, micro, tzinfo=tz)
        except ValueError:
            return None
    s = _normalize_date_string(s)
    m = _ISO_RX.match(s)  # normalization may have produced ISO (CJK dates)
    if m:
        return parse_date(s) if s != go_trim_space(date_str) else None
    try:
        from dateutil import parser as _du

        # unknown zone abbreviations resolve to offset 0 — Go time.Parse
        # attaches a zero-offset FixedZone for names it can't load, and the
        # reference compares instants (parser_test.go:101-107)
        def _tzinfos(name, offset):
            if offset is not None:
                return offset
            return 0 if name else None  # unnamed/absent zone stays naive

        # fixed default: without it dateutil fills missing components from
        # the CURRENT date, making 'May 2020' parse to a different day on
        # every run (and raise entirely on the 29th-31st for short months).
        # First-of-period defaults match dateparse's zero-value fill.
        from datetime import datetime as _dt

        return _du.parse(s, fuzzy=False, tzinfos=_tzinfos,
                         default=_dt(1970, 1, 1))
    except Exception:
        return None
