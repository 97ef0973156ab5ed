"""Scalar helpers mirroring `/root/reference/utils.go` semantics."""

from __future__ import annotations

import re as _re
from urllib.parse import urlsplit, urlunsplit

from .regexps import RX_TOKENIZE

# Go url.Parse's rejected control set, as one C-level scan (see
# to_absolute_uri)
_RX_CTRL = _re.compile("[\x00-\x1f\x7f]")


def char_count(s: str) -> int:
    """Unicode code-point count (utils.go:27-29, utf8.RuneCountInString)."""
    return len(s)


# Go unicode.IsSpace is exactly the Unicode White_Space property; Python's
# str.strip()/split()/isspace() additionally treat the ASCII separator
# controls \x1c-\x1f as whitespace, which Go does not. strings.TrimSpace /
# strings.Fields parity therefore needs an explicit character set.
_GO_WS = (
    "\t\n\v\f\r \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)
_GO_WS_RUN = None  # compiled lazily (regexps imports utils)


def go_trim_space(s: str) -> str:
    """strings.TrimSpace parity (keeps \\x1c-\\x1f, unlike str.strip())."""
    return s.strip(_GO_WS)


def go_fields(s: str):
    """strings.Fields parity."""
    global _GO_WS_RUN
    if _GO_WS_RUN is None:
        import re as _re

        _GO_WS_RUN = _re.compile("[" + _GO_WS + "]+")
    return [t for t in _GO_WS_RUN.split(s) if t]


def word_count(s: str) -> int:
    """utils.go:22-24 (strings.Fields)."""
    return len(go_fields(s))


def trim(s: str) -> str:
    """utils.go:97-100: collapse all whitespace runs to single spaces."""
    return " ".join(go_fields(s))


def is_valid_url(s: str) -> bool:
    """utils.go:32-35 — Go nurl.ParseRequestURI succeeds only for absolute
    URIs or rooted paths."""
    if not s:
        return False
    try:
        parts = urlsplit(s)
    except ValueError:
        return False
    if any(ord(c) < 0x20 or c == "\x7f" for c in s):
        return False
    return bool(parts.scheme) or s.startswith("/")


# Go net/url escaping emulation (net/url shouldEscape/setPath semantics):
# String() emits the original escaped path verbatim when it is "valid
# encoded" (alnum, -_.~, sub-delims, :@/[]%), otherwise the whole path is
# re-escaped with encodePath rules — an all-or-nothing re-serialization.
_GO_PATH_VALID = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "-_.~!$&'()*+,;=:@[]%/"
)
_GO_PATH_SAFE = "$&+,/:;=@-_.~"  # chars escape() leaves alone in encodePath
_HEX = "0123456789abcdefABCDEF"


def _go_valid_encoded_path(p: str) -> bool:
    return all(c in _GO_PATH_VALID for c in p)


def _valid_percent(s: str) -> bool:
    i = 0
    while True:
        i = s.find("%", i)
        if i == -1:
            return True
        if len(s) - i < 3 or s[i + 1] not in _HEX or s[i + 2] not in _HEX:
            return False
        i += 3


def _go_reencode_path(path: str) -> str:
    from urllib.parse import quote, unquote_to_bytes

    if _go_valid_encoded_path(path) and _valid_percent(path):
        return path
    decoded = unquote_to_bytes(path)
    return quote(decoded, safe=_GO_PATH_SAFE)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4, literally — unlike urllib's urljoin, EMPTY segments
    are kept ('a//b' stays 'a//b', as Go's net/url ResolveReference does)."""
    inp = path
    out: list[str] = []  # completed path segments, each starting with '/'
    while inp:
        if inp.startswith("../"):  # A
            inp = inp[3:]
        elif inp.startswith("./"):  # A
            inp = inp[2:]
        elif inp.startswith("/./"):  # B
            inp = "/" + inp[3:]
        elif inp == "/.":  # B
            inp = "/"
        elif inp.startswith("/../"):  # C
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":  # C
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):  # D
            inp = ""
        else:  # E: move the first segment (incl. any leading '/') to output
            start = 1 if inp.startswith("/") else 0
            j = inp.find("/", start)
            seg, inp = (inp[:j], inp[j:]) if j != -1 else (inp, "")
            out.append(seg)
    return "".join(out)


def _rfc3986_join(base: str, ref: str) -> str:
    """RFC 3986 §5.2 reference resolution — Go net/url ResolveReference
    parity. Python's urljoin deviates by COLLAPSING empty path segments
    ('http//x' resolved against '/a/' becomes '/a/http/x'), which breaks
    byte parity on pathological hrefs (utils_test.go:50-73)."""
    b = urlsplit(base)
    r = urlsplit(ref)
    if r.scheme:
        return urlunsplit(
            (r.scheme, r.netloc, _remove_dot_segments(r.path), r.query, r.fragment)
        )
    if r.netloc:
        return urlunsplit(
            (b.scheme, r.netloc, _remove_dot_segments(r.path), r.query, r.fragment)
        )
    if not r.path:
        return urlunsplit(
            (b.scheme, b.netloc, b.path, r.query if ("?" in ref) else b.query, r.fragment)
        )
    if r.path.startswith("/"):
        path = _remove_dot_segments(r.path)
    else:
        # merge: base path up to (and including) its last '/'
        prefix = b.path[: b.path.rfind("/") + 1] if "/" in b.path else ("/" if b.netloc else "")
        path = _remove_dot_segments(prefix + r.path)
    return urlunsplit((b.scheme, b.netloc, path, r.query, r.fragment))


def to_absolute_uri(uri: str, base: str | None) -> str:
    """utils.go:39-67: resolve uri against base, passing through fragments,
    data: URIs and already-absolute URLs *unchanged*. Resolution output is
    re-serialized with Go net/url's path-escaping semantics so hrefs match
    the reference byte-for-byte (e.g. 'a b' -> 'a%20b', 'C|' -> 'C%7C')."""
    if not uri or not base:
        return uri
    if uri.startswith("#"):
        return uri
    if uri.startswith("data:"):
        return uri
    if _RX_CTRL.search(uri) is not None:
        # Go url.Parse rejects control characters -> passthrough
        # (compiled class == `any(ord(c) < 0x20 or ord(c) == 0x7F ...)`,
        # r7: the per-character genexpr was a measured profile line on
        # link-heavy pages)
        return uri
    if not _valid_percent(uri):
        # Go url.Parse rejects invalid percent escapes -> passthrough
        return uri
    try:
        parts = urlsplit(uri)
        if parts.scheme and parts.hostname:
            return uri
    except ValueError:
        return uri
    try:
        resolved = _rfc3986_join(base, uri)
    except ValueError:
        return uri
    try:
        r = urlsplit(resolved)
    except ValueError:
        return resolved
    path = _go_reencode_path(r.path)
    if path == r.path:
        return resolved
    return urlunsplit((r.scheme, r.netloc, path, r.query, r.fragment))


def index_of(items, item) -> int:
    """utils.go:9-16: first index of item, -1 when absent."""
    try:
        return list(items).index(item)
    except ValueError:
        return -1


def str_or(*args: str) -> str:
    """utils.go:70-77."""
    for a in args:
        if a:
            return a
    return ""


def text_similarity(text_a: str, text_b: str) -> float:
    """parser.go:690-707 — 1 - (chars of B-unique tokens / chars of all
    B tokens), ASCII \\W tokenization, lowercased."""
    tokens_a = [t for t in RX_TOKENIZE.split(text_a.lower()) if t]
    set_a = set(tokens_a)
    tokens_b = [t for t in RX_TOKENIZE.split(text_b.lower()) if t]
    unique_b = [t for t in tokens_b if t not in set_a]
    merged_b = " ".join(tokens_b)
    merged_unique_b = " ".join(unique_b)
    if len(merged_b) == 0:
        # Go: 0/0 division yields NaN; every comparison with NaN is false
        return float("nan")
    distance_b = len(merged_unique_b) / len(merged_b)
    return 1 - distance_b
