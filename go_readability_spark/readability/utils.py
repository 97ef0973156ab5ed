"""Scalar helpers mirroring `/root/reference/utils.go` semantics."""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit

from .regexps import RX_TOKENIZE


def char_count(s: str) -> int:
    """Unicode code-point count (utils.go:27-29, utf8.RuneCountInString)."""
    return len(s)


def word_count(s: str) -> int:
    """utils.go:22-24 (strings.Fields)."""
    return len(s.split())


def trim(s: str) -> str:
    """utils.go:97-100: collapse all whitespace runs to single spaces."""
    return " ".join(s.split()).strip()


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


def to_absolute_uri(uri: str, base: str | None) -> str:
    """utils.go:39-67: resolve uri against base, passing through fragments,
    data: URIs and already-absolute URLs *unchanged*."""
    if not uri or not base:
        return uri
    if uri.startswith("#"):
        return uri
    if uri.startswith("data:"):
        return uri
    try:
        parts = urlsplit(uri)
        if parts.scheme and parts.hostname:
            return uri
    except ValueError:
        return uri
    try:
        return urljoin(base, uri)
    except ValueError:
        return uri


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
