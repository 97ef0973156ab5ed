"""Precompiled regular expressions and constant sets.

Semantics mirror the reference's package-level regexes
(`/root/reference/parser.go:21-64`) and the re2c DFA patterns
(`/root/reference/internal/re2go/*.re`). Compiled once per worker at
module import so Arrow batches reuse them (SURVEY.md §4).

Go regexp `\\w`/`\\W` are ASCII-only, so patterns that depend on word
classes use re.ASCII here.
"""

from __future__ import annotations

import re

RX_VIDEOS = re.compile(
    r"//(www\.)?((dailymotion|youtube|youtube-nocookie|player\.vimeo|v\.qq)\.com"
    r"|(archive|upload\.wikimedia)\.org|player\.twitch\.tv)",
    re.I,
)
RX_TOKENIZE = re.compile(r"\W+", re.I | re.ASCII)
# RE2-faithful character classes (see the whitespace note below): Go \s is
# exactly [\t\n\f\r ] — even Python's re.ASCII \s differs by including \v.
_S = r"[\t\n\f\r ]"
_NS = r"[^\t\n\f\r ]"
# RE2's \s is exactly [\t\n\f\r ] — ASCII only, and no \v (Python's
# Unicode \s matched &nbsp; etc., flipping br-chain and single-tag-inside
# decisions vs the reference; even re.ASCII would wrongly include \v)
RX_WHITESPACE = re.compile(r"^[\t\n\f\r ]*$")
RX_HAS_CONTENT = re.compile(r"[^\t\n\f\r ]\Z")  # \Z: RE2 $ is end-of-text
RX_HASH_URL = re.compile(r"^#.+", re.I)
RX_PROPERTY_PATTERN = re.compile(
    rf"{_S}*(dc|dcterm|og|article|twitter){_S}*:{_S}*"
    rf"(author|creator|description|title|site_name|published_time|modified_time|image{_NS}*){_S}*",
    re.I,
)
RX_NAME_PATTERN = re.compile(
    rf"^{_S}*(?:(dc|dcterm|article|og|twitter|weibo:(article|webpage)){_S}*[\.:]{_S}*)?"
    rf"(author|creator|description|title|site_name|published_time|modified_time|image){_S}*\Z",
    re.I,
)
RX_TITLE_SEPARATOR = re.compile(r" [\|\-\\/>»] ", re.I)
RX_TITLE_HIERARCHY_SEP = re.compile(r" [\\/>»] ", re.I)
RX_TITLE_REMOVE_FINAL_PART = re.compile(r"(.*)[\|\-\\/>»] .*", re.I)
RX_TITLE_REMOVE_1ST_PART = re.compile(r"[^\|\-\\/>»]*[\|\-\\/>»](.*)", re.I)
RX_TITLE_ANY_SEPARATOR = re.compile(r"[\|\-\\/>»]+", re.I)
# Go's $ (no (?m)) is end-of-TEXT, which in Python is \Z — Python's $
# also matches before a trailing newline, which RE2's does not.
RX_DISPLAY_NONE = re.compile(rf"display{_S}*:{_S}*none", re.I)
RX_VISIBILITY_HIDDEN = re.compile(rf"visibility{_S}*:{_S}*hidden", re.I)
RX_SENTENCE_PERIOD = re.compile(r"\.( |\Z)", re.I)
RX_SHARE_ELEMENTS = re.compile(r"(\b|_)(share|sharedaddy)(\b|_)", re.I | re.ASCII)
RX_FAVICON_SIZE = re.compile(r"([0-9]+)x([0-9]+)", re.I)
RX_LAZY_IMAGE_SRCSET = re.compile(rf"\.(jpg|jpeg|png|webp){_S}+[0-9]", re.I)
RX_LAZY_IMAGE_SRC = re.compile(
    rf"^{_S}*{_NS}+\.(jpg|jpeg|png|webp){_NS}*{_S}*\Z", re.I
)
RX_IMG_EXTENSIONS = re.compile(r"\.(jpg|jpeg|png|webp)", re.I)
RX_SRCSET_URL = re.compile(
    rf"({_NS}+)({_S}+[0-9.]+[xw])?({_S}*(?:,|\Z))", re.I
)
RX_B64_DATA_URL = re.compile(
    rf"^data:{_S}*([^\t\n\f\r ;,]+){_S}*;{_S}*base64{_S}*,", re.I
)
RX_JSONLD_ARTICLE_TYPES = re.compile(
    r"^Article|AdvertiserContentArticle|NewsArticle|AnalysisNewsArticle"
    r"|AskPublicNewsArticle|BackgroundNewsArticle|OpinionNewsArticle"
    r"|ReportageNewsArticle|ReviewNewsArticle|Report|SatiricalArticle"
    r"|ScholarlyArticle|MedicalScholarlyArticle|SocialMediaPosting|BlogPosting"
    r"|LiveBlogPosting|DiscussionForumPosting|TechArticle|APIReference\Z",
    re.I,
)
RX_CDATA = re.compile(rf"^{_S}*<!\[CDATA\[|\]\]>{_S}*\Z")
RX_SCHEMA_ORG = re.compile(r"^https?\:\/\/schema\.org\/?\Z", re.I)

# --- re2c DFA equivalents (internal/re2go/*.re) ------------------------------

# grab-article.re:3-20
RX_UNLIKELY_CANDIDATES = re.compile(
    r"-ad-|ai2html|banner|breadcrumbs|combx|comment|community|cover-wrap"
    r"|disqus|extra|footer|gdpr|header|legends|menu|related|remark|replies"
    r"|rss|shoutbox|sidebar|skyscraper|social|sponsor|supplemental|ad-break"
    r"|agegate|pagination|pager|popup|yom-remote",
    re.I,
)
# grab-article.re:22-39
RX_MAYBE_CANDIDATE = re.compile(
    r"and|article|body|column|content|main|shadow", re.I
)
# check-byline.re:13
RX_BYLINE = re.compile(r"byline|author|dateline|writtenby|p-author", re.I)
# class-weight.re:13
RX_POSITIVE_CLASS = re.compile(
    r"article|body|content|entry|hentry|h-entry|main|page|pagination|post"
    r"|text|blog|story",
    re.I,
)
# class-weight.re:53-93 — the original pattern with its ^/$/space 'hid' cases
RX_NEGATIVE_CLASS = re.compile(
    r"-ad-|hidden|\Ahid\Z| hid\Z| hid |\Ahid |banner|combx|comment|com-|contact"
    r"|foot|footer|footnote|gdpr|masthead|media|meta|outbrain|promo|related"
    r"|scroll|share|shoutbox|sidebar|skyscraper|sponsor|shopping|tags|tool"
    r"|widget",
    re.I,
)
# grab-article.re:41-61 — nine Unicode comma variants
COMMAS = ",،﹐︐︑⹁⸴⸲，"
RX_COMMAS = re.compile("[" + COMMAS + "]")
# normalize.re:6-42 — collapse runs of exactly these 5 chars (NOT \v, not
# Unicode spaces)
RX_NORMALIZE = re.compile(r"[\t\n\f\r ]{2,}")

UNLIKELY_ROLES = frozenset(
    ("menu", "menubar", "complementary", "navigation", "alert", "alertdialog", "dialog")
)
DIV_TO_P_ELEMS = frozenset(
    ("blockquote", "dl", "div", "img", "ol", "p", "pre", "table", "ul", "select")
)
ALTER_TO_DIV_EXCEPTIONS = ("div", "article", "section", "p")
PRESENTATIONAL_ATTRIBUTES = (
    "align", "background", "bgcolor", "border", "cellpadding", "cellspacing",
    "frame", "hspace", "rules", "style", "valign", "vspace",
)
DEPRECATED_SIZE_ATTRIBUTE_ELEMS = ("table", "th", "td", "hr", "pre")
PHRASING_ELEMS = frozenset((
    "abbr", "audio", "b", "bdo", "br", "button", "cite", "code", "data",
    "datalist", "dfn", "em", "embed", "i", "img", "input", "kbd", "label",
    "mark", "math", "meter", "noscript", "object", "output", "progress", "q",
    "ruby", "samp", "script", "select", "small", "span", "strong", "sub",
    "sup", "textarea", "time", "var", "wbr",
))


# --------------------------------------------------------------- string memos
# class/id strings repeat massively across a page (every list item shares
# the same class attr), so the grab-walk's per-element DFA verdicts are
# memoized on the exact input string. The memo'd functions are PURE
# (string -> verdict), so this cannot change any result — it only skips
# re-running the same regexes on the same strings (measured ~35% of all
# re.search calls in the fixture-corpus profile). Size-capped so a
# long-lived executor can't grow them unboundedly: on overflow the dict
# is cleared, not LRU'd — hit rates are page-local, so a clear costs one
# page of re-misses.

_UNLIKELY_MEMO: dict = {}
_CLASS_WEIGHT_MEMO: dict = {}
_MEMO_CAP = 100_000


def is_unlikely_candidate_string(s: str) -> bool:
    """Memoized `RX_UNLIKELY_CANDIDATES and not RX_MAYBE_CANDIDATE` over
    the grab-walk's class+" "+id match string (parser.go unlikely test;
    the ancestor/tag conditions stay at the call site — they depend on
    the node, not the string)."""
    v = _UNLIKELY_MEMO.get(s)
    if v is None:
        if len(_UNLIKELY_MEMO) >= _MEMO_CAP:
            _UNLIKELY_MEMO.clear()
        v = (
            RX_UNLIKELY_CANDIDATES.search(s) is not None
            and RX_MAYBE_CANDIDATE.search(s) is None
        )
        _UNLIKELY_MEMO[s] = v
    return v


def class_weight_string(s: str) -> int:
    """Memoized ±25 positive/negative class-weight contribution of one
    class or id string (parser.go:1729-1759 per-string half)."""
    v = _CLASS_WEIGHT_MEMO.get(s)
    if v is None:
        if len(_CLASS_WEIGHT_MEMO) >= _MEMO_CAP:
            _CLASS_WEIGHT_MEMO.clear()
        v = 0
        if RX_NEGATIVE_CLASS.search(s):
            v -= 25
        if RX_POSITIVE_CLASS.search(s):
            v += 25
        _CLASS_WEIGHT_MEMO[s] = v
    return v


def normalize_spaces(s: str) -> str:
    """re2go.NormalizeSpaces (normalize.re:6-42).

    Fast path: a run of 2+ needs two ADJACENT members of
    {\\t,\\n,\\f,\\r,space}; with none of \\t\\n\\f\\r present, only
    "  " can form one — five C-level scans skip the regex for ~85% of
    inner-text calls (exact same result by construction)."""
    if (
        "\n" not in s and " " * 2 not in s and "\t" not in s
        and "\r" not in s and "\f" not in s
    ):
        return s
    if len(s) >= 4096:
        # Large-text memo (r7): the scorer normalizes the SAME article
        # text several times per document (inner-text of the top
        # candidate, link density, excerpt, retry-sieve length check) —
        # a ~170 us regex scan per 170 KB repeated ~4x per doc was the
        # top tottime on the synthetic bench profile. Pure-function
        # memo, size-capped like the other string memos in this repo;
        # small strings skip it (dict churn would cost more than the
        # scan).
        v = _NORM_MEMO.get(s)
        if v is None:
            if len(_NORM_MEMO) >= 64:
                _NORM_MEMO.clear()
            v = _NORM_MEMO[s] = RX_NORMALIZE.sub(" ", s)
        return v
    return RX_NORMALIZE.sub(" ", s)


_NORM_MEMO: dict = {}


def count_commas(s: str) -> int:
    """re2go.CountCommas (grab-article.re:41-61)."""
    n = 0
    for ch in COMMAS:
        n += s.count(ch)
    return n
