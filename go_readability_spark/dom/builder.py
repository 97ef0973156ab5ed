"""HTML5-ish tree builder on top of the stdlib ``html.parser`` tokenizer.

The reference parses documents with golang.org/x/net/html, a WHATWG-HTML5
tree builder (`/root/reference/parser-parse.go:18` via go-shiori/dom). No
third-party HTML library is available in this environment, so this module
implements the HTML5 tree-construction rules that crawl extraction
exercises:

* implied <html>/<head>/<body> structure; quirks-mode doctype
  classification (in quirks mode <table> does not close an open <p>)
* raw-text elements (script/style/iframe/noscript/xmp/noembed/noframes/
  plaintext) and RCDATA (title/textarea) with entity decoding;
  unterminated raw-text content emitted at EOF
* HTML5 tokenization fixes over stdlib HTMLParser: end-tag-open requires
  an ASCII letter ('</ p>' is a bogus comment, '</ script>' is script
  TEXT), attribute-state character references (the '&copy=2020' legacy
  lookahead rule), comment states (abrupt <!-->, --!> closes, '-- >'
  does not), CDATA sections (bogus comment in HTML, real in foreign)
* auto-closing: <p> before blocks, li/dd/dt, td/th/tr/table sections,
  option/optgroup; the active formatting elements list (reconstruction,
  Noah's Ark, markers) and the full adoption agency algorithm (WHATWG
  §13.2.6.4.7), so ``<b>1<p>2</b>3</p>`` builds x/net/html's tree
* table modes: foster-parenting, clear-to-table-context, hidden-input
  exception, caption/colgroup/implied-colgroup structure
* in-select (+ in-select-in-table) and in-frameset/after-frameset modes
  (frameset replaces an empty body: frameset pages have NO body element,
  matching the reference's empty-content outcome)
* void elements; ``<tag/>`` self-closing honored only in foreign content
* </p> with no open p inserts an empty <p>; </br> acts as <br>
* \r\n -> \n normalization, U+00AD strip (reference-chain behavior),
  leading-newline stripping after <pre>

Hostile-input bounds: 512 element depth cap, 64 active-formatting
entries, bounded entity scans — formatting/nesting floods stay linear.
"""

from __future__ import annotations

import html as _htmlmod
import html.parser as _hp
import re as _re_mod
from html.parser import HTMLParser

from .node import (
    COMMENT,
    DOCUMENT,
    ELEMENT,
    TEXT,
    Node,
    create_element,
)

VOID_ELEMENTS = frozenset(
    "area base basefont bgsound br col embed frame hr img input keygen "
    "link meta param source track wbr".split()
)

RAW_TEXT = frozenset(
    "script style iframe noembed noframes noscript xmp".split()
)
RCDATA = frozenset(("title", "textarea"))

HEAD_ELEMENTS = frozenset(
    "base basefont bgsound link meta title style script noscript template".split()
)

# start tags that close an open <p> (WHATWG "in body" rules)
CLOSE_P = frozenset(
    "address article aside blockquote center details dialog dir div dl "
    "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup "
    "hr listing main menu nav ol p plaintext pre section summary table ul "
    "xmp".split()
)

HEADINGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))

SPECIAL = frozenset(
    "address applet area article aside base basefont bgsound blockquote "
    "body br button caption center col colgroup dd details dir div dl dt "
    "embed fieldset figcaption figure footer form frame frameset h1 h2 h3 "
    "h4 h5 h6 head header hgroup hr html iframe img input keygen li link "
    "listing main marquee menu meta nav noembed noframes noscript object "
    "ol p param plaintext pre script section select source style summary "
    "table tbody td template textarea tfoot th thead title tr track ul "
    "wbr xmp".split()
)

SCOPE_BOUNDARY = frozenset(
    "html table td th caption object template marquee applet".split()
)
BUTTON_SCOPE_BOUNDARY = SCOPE_BOUNDARY | {"button"}

TABLE_SECTION = frozenset(("tbody", "thead", "tfoot"))
TABLE_CONTEXT = frozenset(("table", "tbody", "thead", "tfoot", "tr"))
# tags legal directly inside table context (everything else is foster-parented)
TABLE_ALLOWED = frozenset(
    "caption colgroup col tbody thead tfoot tr td th script style template form".split()
)

FOREIGN_ROOTS = frozenset(("svg", "math"))

# HTML start tags that BREAK OUT of foreign content (WHATWG §13.2.6.5
# "any other start tag" in foreign content): pop the foreign elements and
# reprocess as HTML — an unclosed <svg> icon must not swallow the page
FOREIGN_BREAKOUT = frozenset(
    "b big blockquote body br center code dd div dl dt em embed h1 h2 h3 "
    "h4 h5 h6 head hr i img li listing menu meta nobr ol p pre ruby s "
    "small span strong strike sub sup table tt u ul var".split()
)

# WHATWG formatting elements: tracked in the active-formatting list and
# subject to the adoption agency algorithm on their end tags
FORMATTING = frozenset(
    "a b big code em font i nobr s small strike strong tt u".split()
)
# start tags that push a marker onto the active formatting list (their
# close clears the list back to the marker)
AFE_MARKER_TAGS = frozenset("applet marquee object template caption td th".split())
# in-body start tags that do NOT "reconstruct the active formatting
# elements" before inserting (blocks, list items, table structure,
# rawtext/head metadata). Everything else — formatting tags, phrasing
# voids like <br>/<img>, and unknown tags — reconstructs, per the spec's
# per-tag "in body" rules. xmp is the one CLOSE_P member that DOES
# reconstruct (close p, then reconstruct, then rawtext).
NO_RECONSTRUCT = (CLOSE_P - {"xmp"}) | frozenset(
    "li dd dt td th tr tbody thead tfoot caption colgroup col form frame "
    "frameset iframe noembed noframes noscript script style title textarea "
    "base basefont bgsound link meta template param source track".split()
)

_MARKER = object()  # active-formatting-list marker sentinel

# every tag with a tag-specific branch anywhere in _start_tag's slow
# path; anything NOT here takes the generic in-body fast path
_SPECIAL_START = frozenset(
    "frameset image html head body form caption col colgroup tbody td tfoot "
    "th thead tr frame select input keygen textarea hr li dd dt a nobr "
    "button option optgroup table svg math pre listing".split()
)

# WHATWG 13.2.6.4.1: public identifier prefixes that trigger quirks mode
# (the same table x/net/html compiles as quirkyIDs)
_QUIRKY_PUBLIC_PREFIXES = (
    "+//silmaril//dtd html pro v0r11 19970101//",
    "-//advasoft ltd//dtd html 3.0 aswedit + extensions//",
    "-//as//dtd html 3.0 aswedit + extensions//",
    "-//ietf//dtd html 2.0 level 1//",
    "-//ietf//dtd html 2.0 level 2//",
    "-//ietf//dtd html 2.0 strict level 1//",
    "-//ietf//dtd html 2.0 strict level 2//",
    "-//ietf//dtd html 2.0 strict//",
    "-//ietf//dtd html 2.0//",
    "-//ietf//dtd html 2.1e//",
    "-//ietf//dtd html 3.0//",
    "-//ietf//dtd html 3.2 final//",
    "-//ietf//dtd html 3.2//",
    "-//ietf//dtd html 3//",
    "-//ietf//dtd html level 0//",
    "-//ietf//dtd html level 1//",
    "-//ietf//dtd html level 2//",
    "-//ietf//dtd html level 3//",
    "-//ietf//dtd html strict level 0//",
    "-//ietf//dtd html strict level 1//",
    "-//ietf//dtd html strict level 2//",
    "-//ietf//dtd html strict level 3//",
    "-//ietf//dtd html strict//",
    "-//ietf//dtd html//",
    "-//metrius//dtd metrius presentational//",
    "-//microsoft//dtd internet explorer 2.0 html strict//",
    "-//microsoft//dtd internet explorer 2.0 html//",
    "-//microsoft//dtd internet explorer 2.0 tables//",
    "-//microsoft//dtd internet explorer 3.0 html strict//",
    "-//microsoft//dtd internet explorer 3.0 html//",
    "-//microsoft//dtd internet explorer 3.0 tables//",
    "-//netscape comm. corp.//dtd html//",
    "-//netscape comm. corp.//dtd strict html//",
    "-//o'reilly and associates//dtd html 2.0//",
    "-//o'reilly and associates//dtd html extended 1.0//",
    "-//o'reilly and associates//dtd html extended relaxed 1.0//",
    "-//softquad software//dtd hotmetal pro 6.0::19990601::extensions to html 4.0//",
    "-//softquad//dtd hotmetal pro 4.0::19971010::extensions to html 4.0//",
    "-//spyglass//dtd html 2.0 extended//",
    "-//sq//dtd html 2.0 hotmetal + extensions//",
    "-//sun microsystems corp.//dtd hotjava html//",
    "-//sun microsystems corp.//dtd hotjava strict html//",
    "-//w3c//dtd html 3 1995-03-24//",
    "-//w3c//dtd html 3.2 draft//",
    "-//w3c//dtd html 3.2 final//",
    "-//w3c//dtd html 3.2//",
    "-//w3c//dtd html 3.2s draft//",
    "-//w3c//dtd html 4.0 frameset//",
    "-//w3c//dtd html 4.0 transitional//",
    "-//w3c//dtd html experimental 19960712//",
    "-//w3c//dtd html experimental 970421//",
    "-//w3c//dtd w3 html//",
    "-//w3o//dtd w3 html 3.0//",
    "-//webtechs//dtd mozilla html 2.0//",
    "-//webtechs//dtd mozilla html//",
)
_QUIRKY_PUBLIC_EXACT = frozenset((
    "-//w3o//dtd w3 html strict 3.0//en//",
    "-/w3c/dtd html 4.0 transitional/en",
    "html",
))
_NO_SYSTEM_QUIRKY_PREFIXES = (
    "-//w3c//dtd html 4.01 frameset//",
    "-//w3c//dtd html 4.01 transitional//",
)

_DOCTYPE_RX = _re_mod.compile(
    r"""doctype[\t\n\f\r ]+([^\t\n\f\r >]+)"""
    r"""(?:[\t\n\f\r ]+(public|system)[\t\n\f\r ]+"""
    r"""(?:"([^"]*)"|'([^']*)')"""
    r"""(?:[\t\n\f\r ]+(?:"([^"]*)"|'([^']*)'))?)?""",
    _re_mod.I,
)


def _doctype_is_quirky(decl: str) -> bool:
    """decl is the text between '<!' and '>'."""
    m = _DOCTYPE_RX.match(decl.strip())
    if m is None:
        return True  # malformed doctype: force-quirks
    name = m.group(1).lower()
    if name != "html":
        return True
    kind = (m.group(2) or "").lower()
    public = ""
    system = None
    if kind == "public":
        public = (m.group(3) or m.group(4) or "").lower()
        if m.group(5) is not None or m.group(6) is not None:
            system = (m.group(5) or m.group(6) or "").lower()
    elif kind == "system":
        system = (m.group(3) or m.group(4) or "").lower()
    if public in _QUIRKY_PUBLIC_EXACT:
        return True
    if system == "http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd":
        return True
    if any(public.startswith(p) for p in _QUIRKY_PUBLIC_PREFIXES):
        return True
    if system is None and any(
        public.startswith(p) for p in _NO_SYSTEM_QUIRKY_PREFIXES
    ):
        return True
    return False

# ---- HTML5 attribute-value character references -----------------------------
# In ATTRIBUTE values (only), a named reference not terminated by ';' whose
# next character is alphanumeric or '=' is NOT expanded (the legacy rule that
# keeps hrefs like '?a=1&ampb=2' and '&copy=2020' intact). Python's
# html.unescape applies data-state semantics everywhere, so stdlib
# HTMLParser corrupts such URLs; x/net/html implements the spec rule.
from html.entities import html5 as _HTML5_ENTITIES

_CHARREF_RX = _re_mod.compile(
    r"&(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[a-zA-Z][a-zA-Z0-9]*;?)"
)
# tokenizer fast-path patterns (strict subsets of the stdlib tolerant
# grammar — anything else falls back to HTMLParser's own scanners).
# _FULL_TAG parses a complete well-formed start tag — name, attribute
# span, self-closing slash — in ONE C-level match instead of stdlib's
# locatestarttagend + tagfind + one attrfind match per attribute.
# Possessive quantifiers (3.11+) keep failure linear on hostile input.
# Grammar notes vs attrfind_tolerant: attr names exclude = / > and
# whitespace entirely; attrs are whitespace-separated; a single '=' per
# attr; unquoted values may not START with a quote or '=' but may
# contain '/' and quotes, exactly like the stdlib class. Anything the
# strict grammar rejects (junk separators, '==', quote-adjacent attrs)
# falls through to the stdlib path, so divergence is impossible —
# either this matches and produces the same (name, value) list, or the
# original scanner runs.
_FULL_TAG = _re_mod.compile(
    r"([a-zA-Z][a-zA-Z0-9]*+)"
    r"((?:[ \t\n\r\f]++[^\s/>=]++"
    r"(?:[ \t\n\r\f]*+=[ \t\n\r\f]*+"
    r"(?:\"[^\"]*+\"|'[^']*+'|(?![\"'=])[^>\s]*+))?+)*+)"
    r"[ \t\n\r\f]*+(/?)>"
)
_ATTR_ITER = _re_mod.compile(
    r"[ \t\n\r\f]++([^\s/>=]++)"
    r"(?:[ \t\n\r\f]*+=[ \t\n\r\f]*+"
    r"(\"[^\"]*+\"|'[^']*+'|(?![\"'=])[^>\s]*+))?+"
)
_FAST_ENDTAG = _re_mod.compile(r"([a-zA-Z][a-zA-Z0-9]*)[ \t\n\r\f]*>")

# raw attr-span -> parsed immutable ((name, value), ...); see
# parse_starttag for the aliasing discipline
_ATTR_SPAN_CACHE: dict = {}

_ALNUM_EQ = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789="
)


def _unescape_attr(s: str) -> str:
    """html.unescape with the attribute-state legacy restriction."""
    if "&" not in s:
        return s
    out = []
    pos = 0
    for m in _CHARREF_RX.finditer(s):
        out.append(s[pos:m.start()])
        pos = m.end()
        body = m.group(1)
        if body[0] == "#":
            out.append(_htmlmod.unescape(m.group(0)))
            continue
        # longest entity-name prefix (the html5 table keys both 'amp'
        # and 'amp;'); scan capped at the longest real entity name
        # (31 chars + ';') so a hostile '&aaaa...' run can't go quadratic
        match = None
        for ln in range(min(len(body), 33), 0, -1):
            if body[:ln] in _HTML5_ENTITIES:
                match = body[:ln]
                break
        if match is None:
            out.append("&" + body)
            continue
        rest = body[len(match):]
        if not match.endswith(";"):
            nxt = rest[:1] or s[m.end():m.end() + 1]
            if nxt and nxt in _ALNUM_EQ:
                out.append("&" + body)  # legacy rule: leave literal
                continue
        out.append(_HTML5_ENTITIES[match])
        out.append(rest)
    out.append(s[pos:])
    return "".join(out)

# WHATWG foreign-content case adjustments (x/net/html foreign.go): the HTML
# tokenizer lowercases names; inside <svg>/<math> these get their canonical
# mixed case back.
SVG_TAG_ADJUST = {
    t.lower(): t
    for t in (
        "altGlyph altGlyphDef altGlyphItem animateColor animateMotion "
        "animateTransform clipPath feBlend feColorMatrix feComponentTransfer "
        "feComposite feConvolveMatrix feDiffuseLighting feDisplacementMap "
        "feDistantLight feDropShadow feFlood feFuncA feFuncB feFuncG feFuncR "
        "feGaussianBlur feImage feMerge feMergeNode feMorphology feOffset "
        "fePointLight feSpecularLighting feSpotLight feTile feTurbulence "
        "foreignObject glyphRef linearGradient radialGradient textPath"
    ).split()
}
SVG_ATTR_ADJUST = {
    a.lower(): a
    for a in (
        "attributeName attributeType baseFrequency baseProfile calcMode "
        "clipPathUnits contentScriptType contentStyleType diffuseConstant "
        "edgeMode externalResourcesRequired filterUnits glyphRef "
        "gradientTransform gradientUnits kernelMatrix kernelUnitLength "
        "keyPoints keySplines keyTimes lengthAdjust limitingConeAngle "
        "markerHeight markerUnits markerWidth maskContentUnits maskUnits "
        "numOctaves pathLength patternContentUnits patternTransform "
        "patternUnits pointsAtX pointsAtY pointsAtZ preserveAlpha "
        "preserveAspectRatio primitiveUnits refX refY repeatCount repeatDur "
        "requiredExtensions requiredFeatures specularConstant "
        "specularExponent spreadMethod startOffset stdDeviation stitchTiles "
        "surfaceScale systemLanguage tableValues targetX targetY textLength "
        "viewBox viewTarget xChannelSelector yChannelSelector zoomAndPan"
    ).split()
}
MATHML_ATTR_ADJUST = {"definitionurl": "definitionURL"}


class _TreeBuilder(HTMLParser):
    # extend stdlib CDATA handling (script/style) to all HTML5 raw-text
    # and RCDATA elements so their content is never tokenized as markup;
    # plaintext swallows the rest of the document (no end tag exists, so
    # cdata mode simply runs to EOF, which is the spec behavior)
    CDATA_CONTENT_ELEMENTS = tuple(RAW_TEXT | RCDATA | {"plaintext"})

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.doc = Node(DOCUMENT)
        self.html = create_element("html")
        self.head = create_element("head")
        self.body = create_element("body")
        self.doc.append_child(self.html)
        self.html.append_child(self.head)
        self.html.append_child(self.body)
        self.mode = "initial"  # initial | in_head | after_head | in_body
        self.stack: list[Node] = []  # open elements below body (or head)
        self.afe: list = []  # active formatting elements (+ _MARKER entries)
        self.form_open = False
        self.strip_leading_newline = False
        self.frameset_mode = False
        self.frameset_stack: list[Node] = []
        self.quirks = True  # no doctype -> quirks, per spec
        # sticky "a <select> start tag was ever seen": gates the
        # per-tag in-select scope scans (profiling: _find_in_scope ran
        # once per start AND end tag, almost entirely for this check)
        self._seen_select = False

    def updatepos(self, i, j):
        """no-op override of _markupbase position tracking: we never
        report line/col (error recovery is structural, not diagnostic),
        and str.count('\\n') per chunk was ~4% of tokenize time."""
        return j

    # ------------------------------------------------------------ insertion

    def _current(self) -> Node:
        if self.stack:
            return self.stack[-1]
        if self.mode == "in_head":
            return self.head
        return self.body

    def _append_text(self, target: Node, data: str) -> None:
        last = target.last_child
        if last is not None and last.type == TEXT:
            last.data += data
        else:
            target.append_child(Node(TEXT, "", data))

    def _in_table_context(self) -> bool:
        cur = self._current()
        return cur.type == ELEMENT and cur.tag in TABLE_CONTEXT

    def _foster_target(self):
        """Return (parent, ref) for foster-parented insertion: before the
        nearest open table."""
        for node in reversed(self.stack):
            if node.tag == "table":
                if node.parent is not None:
                    return node.parent, node
                return node, None
        return self.body, None

    def _insert_node(self, node: Node, foster: bool) -> None:
        if foster:
            parent, ref = self._foster_target()
            parent.insert_before(node, ref)
        else:
            self._current().append_child(node)

    # ------------------------------------------------------------ scope utils

    # Blink caps element-tree depth at 512; beyond it, new elements attach
    # to the deepest allowed node WITHOUT opening (content preserved, stack
    # bounded). Without the cap, scope scans (_find_in_scope walks the open
    # stack per start tag) turn pathological markup like "<div><p>" x 10^4
    # quadratic — measured minutes on hostile crawl input.
    MAX_TREE_DEPTH = 512

    def _push(self, el) -> None:
        if len(self.stack) < self.MAX_TREE_DEPTH:
            self.stack.append(el)

    def _find_in_scope(self, tag, boundary) -> int:
        for i in range(len(self.stack) - 1, -1, -1):
            t = self.stack[i].tag
            if t == tag:
                return i
            if t in boundary:
                return -1
        return -1

    def _pop_through(self, index: int) -> None:
        popped = self.stack[index:]
        del self.stack[index:]
        # closing a cell/caption/object/... clears the active formatting
        # list back to its marker, whichever code path popped it
        for node in popped:
            if node.tag in AFE_MARKER_TAGS:
                self._clear_afe_to_marker()

    # ------------------------------------------------- active formatting list

    # Bound the list against hostile pages (10^4 <b>s with distinct attrs
    # would otherwise make every later text token reconstruct 10^4 clones
    # — the spec and x/net/html leave it unbounded). 64 live entries is
    # far past anything real markup nests.
    MAX_AFE = 64

    def _clear_afe_to_marker(self) -> None:
        afe = self.afe
        while afe:
            if afe.pop() is _MARKER:
                break

    def _afe_push(self, el: Node) -> None:
        """Push with the Noah's Ark clause: if three entries after the
        last marker share tag + attribute set, drop the earliest."""
        afe = self.afe
        key = sorted((a[0], a[1]) for a in el.attrs) if el.attrs else []
        count = 0
        for i in range(len(afe) - 1, -1, -1):
            e = afe[i]
            if e is _MARKER:
                break
            if e.tag == el.tag and (
                (sorted((a[0], a[1]) for a in e.attrs) if e.attrs else []) == key
            ):
                count += 1
                if count == 3:
                    afe.pop(i)
                    break
        if len(afe) >= self.MAX_AFE:
            for i, e in enumerate(afe):
                if e is not _MARKER:
                    afe.pop(i)
                    break
        afe.append(el)

    def _reconstruct_afe(self) -> None:
        """WHATWG 'reconstruct the active formatting elements': re-open
        (as clones) every entry after the last marker that is no longer
        on the open-elements stack."""
        afe = self.afe
        if not afe:
            return
        # at the tree-depth cap, clones can't join the stack — every
        # subsequent token would re-clone the whole list (quadratic on
        # hostile pages); skip reconstruction in that degraded mode
        if len(self.stack) >= self.MAX_TREE_DEPTH:
            return
        last = afe[-1]
        if last is _MARKER:
            return
        stack = self.stack
        # O(1) hot path: inside an open formatting element the entry IS
        # the current node — the full membership scan runs only when
        # deeper content is open above it
        if stack and (last is stack[-1] or last in stack):
            return
        i = len(afe) - 1
        while i > 0:
            e = afe[i - 1]
            if e is _MARKER or e in self.stack:
                break
            i -= 1
        for j in range(i, len(afe)):
            entry = afe[j]
            clone = Node(
                ELEMENT, entry.tag, "",
                entry.attrs if type(entry.attrs) is tuple
                else [a[:] for a in entry.attrs] if entry.attrs is not None else [],
            )
            self._insert_node(clone, self._in_table_context())
            self._push(clone)
            afe[j] = clone

    def _any_other_end_tag(self, tag: str) -> None:
        for i in range(len(self.stack) - 1, -1, -1):
            node = self.stack[i]
            if node.tag == tag:
                self._pop_through(i)
                return
            if node.tag in SPECIAL:
                return

    def _adoption_agency(self, tag: str) -> None:
        """WHATWG §13.2.6.4.7 'in body' adoption agency algorithm, on our
        stack layout (body/head/html live outside self.stack; a common
        ancestor above stack index 0 is <body>)."""
        stack, afe = self.stack, self.afe
        for _outer in range(8):
            # 1. trivial case: current node matches and isn't tracked
            if stack and stack[-1].tag == tag and stack[-1] not in afe:
                stack.pop()
                return
            # 2. find the formatting element (last matching entry after
            # the last marker)
            fmt = None
            fmt_afe_idx = -1
            for i in range(len(afe) - 1, -1, -1):
                e = afe[i]
                if e is _MARKER:
                    break
                if e.tag == tag:
                    fmt = e
                    fmt_afe_idx = i
                    break
            if fmt is None:
                self._any_other_end_tag(tag)
                return
            # fast path for the properly-nested close (the overwhelming
            # majority): fmt is the current node — in scope trivially, no
            # furthest block can exist below it → pop + drop from the list
            # (identical outcome to the full algorithm)
            if stack and stack[-1] is fmt:
                stack.pop()
                afe.pop(fmt_afe_idx)
                return
            if fmt not in stack:
                afe.pop(fmt_afe_idx)
                return
            si = stack.index(fmt)
            # in-scope check (default scope)
            in_scope = False
            for k in range(len(stack) - 1, -1, -1):
                if stack[k] is fmt:
                    in_scope = True
                    break
                if stack[k].tag in SCOPE_BOUNDARY:
                    break
            if not in_scope:
                return
            # 3. furthest block: lowest special element below fmt
            fb = None
            fb_idx = -1
            for j in range(si + 1, len(stack)):
                if stack[j].tag in SPECIAL:
                    fb = stack[j]
                    fb_idx = j
                    break
            if fb is None:
                self._pop_through(si)
                if fmt in afe:
                    afe.remove(fmt)
                return
            common = stack[si - 1] if si > 0 else None  # None -> <body>
            bookmark = fmt_afe_idx
            node = fb
            last_node = fb
            node_idx = fb_idx
            inner = 0
            while True:
                inner += 1
                node_idx -= 1
                node = stack[node_idx] if node_idx >= 0 else fmt
                if node is fmt:
                    break
                if inner > 3 and node in afe:
                    ni = afe.index(node)
                    afe.pop(ni)
                    if ni < bookmark:
                        bookmark -= 1
                if node not in afe:
                    del stack[node_idx]
                    continue
                clone = Node(
                    ELEMENT, node.tag, "",
                    node.attrs if type(node.attrs) is tuple
                    else [a[:] for a in node.attrs] if node.attrs is not None else [],
                )
                afe[afe.index(node)] = clone
                stack[node_idx] = clone
                node = clone
                if last_node is fb:
                    bookmark = afe.index(clone) + 1
                node.append_child(last_node)
                last_node = node
            # insert last_node at the appropriate place for common ancestor
            if last_node.parent is not None:
                last_node.parent.remove_child(last_node)
            if common is None:
                self.body.append_child(last_node)
            elif common.tag in TABLE_CONTEXT:
                parent, ref = self._foster_target()
                parent.insert_before(last_node, ref)
            else:
                common.append_child(last_node)
            # clone fmt; move furthest block's children into the clone
            fclone = Node(
                ELEMENT, fmt.tag, "",
                fmt.attrs if type(fmt.attrs) is tuple
                else [a[:] for a in fmt.attrs] if fmt.attrs is not None else [],
            )
            while fb.first_child is not None:
                fclone.append_child(fb.first_child)
            fb.append_child(fclone)
            fi = afe.index(fmt)
            afe.pop(fi)
            if fi < bookmark:
                bookmark -= 1
            afe.insert(bookmark, fclone)
            stack.remove(fmt)
            stack.insert(stack.index(fb) + 1, fclone)

    def _close_p(self) -> None:
        i = self._find_in_scope("p", BUTTON_SCOPE_BOUNDARY)
        if i != -1:
            self._pop_through(i)

    def _close_list_item(self, tags) -> None:
        for i in range(len(self.stack) - 1, -1, -1):
            t = self.stack[i].tag
            if t in tags:
                self._pop_through(i)
                return
            if t in SPECIAL and t not in ("address", "div", "p"):
                return

    # ------------------------------------------------------------ tokenizer cb

    def parse_comment(self, i, report=1):
        """HTML5 comment tokenization. stdlib's close regex `--\\s*>`
        accepts "-- >" (spec says the comment continues), rejects the
        spec's "--!>" close, and turns the abrupt "<!-->"/"<!--->"
        (empty comments) into literal text."""
        rawdata = self.rawdata
        if rawdata.startswith("<!-->", i):
            if report:
                self.handle_comment("")
            return i + 5
        if rawdata.startswith("<!--->", i):
            if report:
                self.handle_comment("")
            return i + 6
        pos = i + 4
        while True:
            j = rawdata.find("--", pos)
            if j < 0:
                return -1  # incomplete: wait for more data
            k = j + 2
            if rawdata.startswith(">", k):
                if report:
                    self.handle_comment(rawdata[i + 4:j])
                return k + 1
            if rawdata.startswith("!>", k):
                if report:
                    self.handle_comment(rawdata[i + 4:j])
                return k + 2
            if k >= len(rawdata):
                return -1
            pos = j + 1

    def parse_marked_section(self, i, report=1):
        """'<![...' — real CDATA only in foreign content (ends at ']]>');
        in HTML content it is a bogus comment ending at the FIRST '>'
        (stdlib's `]\\s*]\\s*>` close diverges on both counts)."""
        rawdata = self.rawdata
        if self._foreign_state() == "foreign" and rawdata.startswith("<![CDATA[", i):
            j = rawdata.find("]]>", i + 9)
            if j < 0:
                return -1
            if report:
                self.handle_data(rawdata[i + 9:j])
            return j + 3
        j = rawdata.find(">", i + 2)
        if j < 0:
            return -1
        if report:
            self.handle_comment(rawdata[i + 2:j])
        return j + 1

    def feed(self, data):
        """Tokenizer drive loop replacing stdlib goahead for the common
        constructs (text run, start/end tag, raw-text scan) — measured at
        ~2x the stdlib loop on real pages, mostly by skipping updatepos,
        per-token `interesting` regex scans, and the convert_charrefs
        machinery for '&'-free text. Anything it cannot finish locally
        (incomplete construct at buffer end, declarations, bogus markup)
        is left in rawdata for the stdlib scanners: parse_* helpers are
        reused as-is, and close() runs goahead(1) on whatever remains, so
        multi-feed streaming and EOF semantics stay stdlib-identical."""
        self.rawdata = rawdata = self.rawdata + data
        n = len(rawdata)
        i = 0
        find = rawdata.find
        unescape = _htmlmod.unescape
        handle_data = self.handle_data
        while i < n:
            if self.cdata_elem is not None:
                # raw-text/RCDATA: emit up to the matching close tag
                m = self.interesting.search(rawdata, i)
                if m is None:
                    break  # buffered; close() flushes as element text
                j = m.start()
                if j > i:
                    handle_data(rawdata[i:j])
                k = self.parse_endtag(j)
                if k < 0:
                    i = j
                    break
                i = k
                continue
            lt = find("<", i)
            if lt < 0:
                break  # trailing text buffered (split-entity safety)
            if lt > i:
                text = rawdata[i:lt]
                handle_data(unescape(text) if "&" in text else text)
            c = rawdata[lt + 1:lt + 2]
            if not c:
                i = lt
                break
            if "a" <= c <= "z" or "A" <= c <= "Z":
                k = self.parse_starttag(lt)
            elif c == "/":
                k = self.parse_endtag(lt)
            elif c == "!":
                k = self.parse_html_declaration(lt)
            elif c == "?":
                k = self.parse_pi(lt)
            else:
                handle_data("<")
                k = lt + 1
            if k < 0:
                i = lt
                break
            i = k
        self.rawdata = rawdata[i:]

    def close(self):
        # stdlib goahead BREAKS (emitting nothing) when a raw-text/RCDATA
        # element is unterminated at EOF; HTML5 emits the remaining input
        # as the element's text (Chrome: '<script>x' EOF -> script
        # containing 'x'; likewise plaintext, which never terminates)
        if self.cdata_elem is not None and self.rawdata:
            data = self.rawdata
            self.rawdata = ""
            self.handle_data(data)
            self.clear_cdata_mode()
        super().close()

    def parse_starttag(self, i):
        """Attribute values unescape via the attribute-state rule
        (_unescape_attr); data-state text still goes through goahead's
        full html.unescape, which IS the data-state spec. This is the
        stdlib HTMLParser.parse_starttag loop verbatim with that single
        call-site changed — reimplemented here (r2 ADVICE) instead of
        temporarily swapping the module-global html.parser.unescape,
        which leaked attribute-state semantics to any other HTMLParser
        running concurrently in the process."""
        rawdata = self.rawdata
        # fast path: a complete well-formed start tag in one regex match
        # (see _FULL_TAG). Covers the vast majority of real-page tags;
        # anything else falls through to the stdlib-tolerant loop below.
        m = _FULL_TAG.match(rawdata, i + 1)
        if m:
            # r7: get_starttag_text() is NOT kept truthful on this fast
            # path — nothing in this package (or the stdlib goahead
            # machinery we reuse) reads it, and the per-tag slice of the
            # raw tag text was a measured allocation cost across a
            # corpus.  A subclass relying on get_starttag_text() must
            # use the tolerant path below (or restore the slice).
            self.lasttag = tag = m.group(1).lower()
            attrspan = m.group(2)
            if attrspan:
                # attribute-span interning: identical raw spans (every
                # list item of a page carries the same class="...") skip
                # the findall/lower/unescape/dedupe work. The cache holds
                # IMMUTABLE (name, value) pairs; each use rebuilds the
                # [[name, value], ...] lists because set_attribute mutates
                # them in place — sharing list objects across nodes would
                # alias attribute edits. Size-capped clear, same policy as
                # the readability string memos.
                attrs = _ATTR_SPAN_CACHE.get(attrspan)
                if attrs is None:
                    # build the final deduped form once; the tuple wrapper
                    # tells _dedupe_attrs it is already done
                    out = []
                    append = out.append
                    seen = set()
                    add = seen.add
                    for name, val in _ATTR_ITER.findall(attrspan):
                        name = name.lower()
                        if name in seen:
                            continue
                        add(name)
                        if val:
                            c0 = val[0]
                            if c0 == '"' or c0 == "'":
                                val = val[1:-1]
                            if "&" in val:
                                val = _unescape_attr(val)
                        append((name, val))
                    if len(_ATTR_SPAN_CACHE) >= 50_000:
                        _ATTR_SPAN_CACHE.clear()
                    attrs = _ATTR_SPAN_CACHE[attrspan] = tuple(out)
            else:
                attrs = ()
            if m.group(3):
                self.handle_startendtag(tag, attrs)
            else:
                self._start_tag(tag, attrs, False)
                if tag in self.CDATA_CONTENT_ELEMENTS:
                    self.set_cdata_mode(tag)
            return m.end()

        self._HTMLParser__starttag_text = None
        endpos = self.check_for_whole_start_tag(i)
        if endpos < 0:
            return endpos
        rawdata = self.rawdata
        self._HTMLParser__starttag_text = rawdata[i:endpos]

        attrs = []
        match = _hp.tagfind_tolerant.match(rawdata, i + 1)
        assert match, "unexpected call to parse_starttag()"
        k = match.end()
        self.lasttag = tag = match.group(1).lower()
        while k < endpos:
            m = _hp.attrfind_tolerant.match(rawdata, k)
            if not m:
                break
            attrname, rest, attrvalue = m.group(1, 2, 3)
            if not rest:
                attrvalue = None
            elif (
                attrvalue[:1] == "'" == attrvalue[-1:]
                or attrvalue[:1] == '"' == attrvalue[-1:]
            ):
                attrvalue = attrvalue[1:-1]
            if attrvalue:
                attrvalue = _unescape_attr(attrvalue)
            attrs.append((attrname.lower(), attrvalue))
            k = m.end()

        end = rawdata[k:endpos].strip()
        if end not in (">", "/>"):
            self.handle_data(rawdata[i:endpos])
            return endpos
        if end.endswith("/>"):
            self.handle_startendtag(tag, attrs)
        else:
            self.handle_starttag(tag, attrs)
            if tag in self.CDATA_CONTENT_ELEMENTS:
                self.set_cdata_mode(tag)
        return endpos

    def parse_endtag(self, i):
        """HTML5 end-tag-open: '</' must be followed by an ASCII letter.
        stdlib HTMLParser accepts '</ p>' as an end tag (its endtagfind
        allows whitespace); the spec makes it a BOGUS COMMENT in data
        state and plain TEXT inside script/rawtext — so '</ script>'
        must not close a script. Both matter on crawl markup."""
        rawdata = self.rawdata
        c = rawdata[i + 2:i + 3]
        if c and not ("a" <= c <= "z" or "A" <= c <= "Z"):
            if c == ">":
                return i + 3  # '</>' is ignored entirely
            j = rawdata.find(">", i + 2)
            if j < 0:
                return -1  # incomplete: wait for more data
            if self.cdata_elem is not None:
                self.handle_data(rawdata[i:j + 1])  # stays script text
            else:
                self.handle_comment(rawdata[i + 2:j])
            return j + 1
        # fast path for plain `</tag>` / `</tag >` (mirrors the stdlib
        # endtagfind-match branch, without its two extra regex scans)
        m = _FAST_ENDTAG.match(rawdata, i + 2)
        if m:
            elem = m.group(1).lower()
            gtpos = m.end()
            if self.cdata_elem is not None and elem != self.cdata_elem:
                self.handle_data(rawdata[i:gtpos])
                return gtpos
            self.handle_endtag(elem)
            self.clear_cdata_mode()
            return gtpos
        return super().parse_endtag(i)

    def handle_starttag(self, tag, attrs):
        self._start_tag(tag, attrs, explicit_self_closing=False)

    def handle_startendtag(self, tag, attrs):
        # HTML5: the "/" in <tag/> is only honored in foreign content or
        # for void elements; otherwise the tag stays open. For raw-text
        # elements the reference tokenizer (x/net/html, like the spec)
        # enters script-data/rawtext state regardless of the flag — so
        # '<script src=x/>' swallows everything to the next </script>;
        # without this, following article markup was parsed as real
        # elements INSIDE <script> and deleted by removeScripts.
        if self._foreign_state() != "foreign" and tag in ("script", "style"):
            self.handle_starttag(tag, attrs)
            self.set_cdata_mode(tag)
            return
        self._start_tag(tag, attrs, explicit_self_closing=True)

    def _dedupe_attrs(self, attrs):
        if type(attrs) is tuple:
            # pre-deduped immutable ((name, value), ...) from the
            # parse_starttag fast path's intern cache — shared as-is;
            # node-level mutators copy-on-write (dom/node.py)
            return attrs
        if not attrs:
            return []
        if len(attrs) == 1:
            k, v = attrs[0]
            return [[k, v if v is not None else ""]]
        out = []
        seen = set()
        for k, v in attrs:
            if k in seen:
                continue
            seen.add(k)
            out.append([k, v if v is not None else ""])
        return out

    def _foreign_state(self) -> str:
        """Namespace context of the current node: 'html', 'foreign',
        'html_ip' (HTML integration point: svg foreignObject/desc/title,
        math annotation-xml with an HTML encoding), or 'mathml_text'
        (mi/mo/mn/ms/mtext — children parse as HTML except mglyph/
        malignmark)."""
        stack = self.stack
        if not stack:
            return "html"
        cur = stack[-1]
        ns = cur.ns
        if ns is None:
            return "html"
        if ns == "svg" and cur.tag in ("foreignObject", "desc", "title"):
            return "html_ip"
        if ns == "math":
            if cur.tag in ("mi", "mo", "mn", "ms", "mtext"):
                return "mathml_text"
            if cur.tag == "annotation-xml":
                for k, v in cur.attrs or ():
                    if k == "encoding" and v.lower() in (
                        "text/html", "application/xhtml+xml",
                    ):
                        return "html_ip"
        return "foreign"

    def _insert_foreign(self, tag, attrs, explicit_self_closing):
        adj = [
            [SVG_ATTR_ADJUST.get(k, MATHML_ATTR_ADJUST.get(k, k)), v]
            for k, v in self._dedupe_attrs(attrs)
        ]
        if tag in FOREIGN_ROOTS:
            ns = tag
        else:
            ns = self.stack[-1].ns if self.stack else "svg"
        el = Node(ELEMENT, SVG_TAG_ADJUST.get(tag, tag), "", adj, ns=ns)
        self._current().append_child(el)
        # foreign content acknowledges the self-closing flag for EVERY
        # element (HTML5 §13.2.6.5) — a nested <svg/> left open would
        # deepen foreign mode for the rest of the document
        if explicit_self_closing:
            return
        self._push(el)

    def _start_tag(self, tag, attrs, explicit_self_closing):
        # fast path: ordinary in-body element with no tag-specific
        # insertion rule and no special mode active. The branch bodies
        # are copies of the corresponding slow-path steps (close-p,
        # heading pop, AFE reconstruct, foster check, tail) with the
        # dead branches for _SPECIAL_START tags removed — ~half the
        # per-tag dispatch cost for the common div/span/p stream.
        if (
            tag not in _SPECIAL_START
            and self.mode == "in_body"
            and not self.frameset_mode
            and (not self.stack or self.stack[-1].ns is None)
            and (
                not self._seen_select
                or self._find_in_scope("select", SCOPE_BOUNDARY) == -1
            )
        ):
            if tag in CLOSE_P:
                self._close_p()
            if tag in HEADINGS and self.stack and self.stack[-1].tag in HEADINGS:
                self.stack.pop()
            # r7: _reconstruct_afe is a no-op on an empty AFE list — skip
            # the call (the list is empty for the vast majority of tags)
            if self.afe and tag not in NO_RECONSTRUCT:
                self._reconstruct_afe()
            stack = self.stack
            cur = stack[-1] if stack else self.body
            el = Node(ELEMENT, tag, "", self._dedupe_attrs(attrs))
            if (
                cur.tag in TABLE_CONTEXT
                and cur.type == ELEMENT
                and tag not in TABLE_ALLOWED
            ):
                self._insert_node(el, True)
            else:
                # inline non-foster _insert_node + _current (r7): the fast
                # path guarantees mode == "in_body", so _current() is
                # exactly `cur`
                cur.append_child(el)
            if tag in VOID_ELEMENTS:
                return
            if tag in FORMATTING:
                self._afe_push(el)
            elif tag in AFE_MARKER_TAGS:
                self.afe.append(_MARKER)
            if len(stack) < self.MAX_TREE_DEPTH:
                stack.append(el)
            return

        state = self._foreign_state()
        if state != "html":
            if state == "foreign":
                if tag in FOREIGN_BREAKOUT or (
                    tag == "font"
                    and any(k in ("color", "face", "size") for k, _v in attrs)
                ):
                    # break out of foreign content: pop foreign elements,
                    # then reprocess the tag with the HTML rules below
                    while self.stack and self._foreign_state() == "foreign":
                        self.stack.pop()
                else:
                    self._insert_foreign(tag, attrs, explicit_self_closing)
                    return
            elif state == "mathml_text" and tag in ("mglyph", "malignmark"):
                self._insert_foreign(tag, attrs, explicit_self_closing)
                return
            # html_ip / mathml_text(other tags) / post-breakout: HTML rules

        # ---- frameset pages (WHATWG in-frameset/after-frameset modes):
        # a <frameset> arriving while the body is still empty REPLACES the
        # body (x/net/html trees for frameset pages have no body at all,
        # which is what makes the reference yield empty content for them);
        # inside frameset mode only frameset/frame/noframes exist
        if self.frameset_mode:
            if tag == "frameset":
                el = Node(ELEMENT, "frameset", "", self._dedupe_attrs(attrs))
                self.frameset_stack[-1].append_child(el)
                self.frameset_stack.append(el)
            elif tag == "frame":
                self.frameset_stack[-1].append_child(
                    Node(ELEMENT, "frame", "", self._dedupe_attrs(attrs))
                )
            elif tag == "noframes":
                el = Node(ELEMENT, "noframes", "", self._dedupe_attrs(attrs))
                self.frameset_stack[-1].append_child(el)
                self.stack.append(el)
            return
        if tag == "frameset":
            if self.mode in ("initial", "in_head", "after_head"):
                self.mode = "in_body"
            if self._body_is_empty():
                self.html.remove_child(self.body)
                el = Node(ELEMENT, "frameset", "", self._dedupe_attrs(attrs))
                self.html.append_child(el)
                self.frameset_mode = True
                self.frameset_stack = [el]
                self.stack.clear()
            # frameset-ok false (body has content): parse error, ignore
            return

        if tag == "image":
            tag = "img"

        # ---- document structure states
        if tag == "html":
            for k, v in self._dedupe_attrs(attrs):
                if not any(a[0] == k for a in self.html.attrs):
                    self.html.attrs.append([k, v])
            return
        if tag == "head":
            if self.mode == "initial":
                self.mode = "in_head"
                for k, v in self._dedupe_attrs(attrs):
                    if not any(a[0] == k for a in self.head.attrs):
                        self.head.attrs.append([k, v])
            return
        if tag == "body":
            if self.mode != "in_body":
                self.mode = "in_body"
            for k, v in self._dedupe_attrs(attrs):
                if not any(a[0] == k for a in self.body.attrs):
                    self.body.attrs.append([k, v])
            return
        if self.mode in ("initial", "in_head", "after_head"):
            if tag in HEAD_ELEMENTS:
                if self.mode == "initial":
                    self.mode = "in_head"
                el = Node(ELEMENT, tag, "", self._dedupe_attrs(attrs))
                (self.head if self.mode != "in_body" else self._current()).append_child(el)
                if tag in RAW_TEXT or tag in RCDATA:
                    self.stack.append(el)
                    self.strip_leading_newline = tag == "textarea"
                elif tag == "template":
                    self.stack.append(el)
                return
            # anything else implies <body>
            self.mode = "in_body"

        # ---- in body
        if tag == "form" and self.form_open:
            return

        # in-body table-structure tags with no open table are parse
        # errors the spec IGNORES (their content flows to the parent)
        if tag in (
            "caption", "col", "colgroup", "tbody", "td", "tfoot", "th",
            "thead", "tr", "frame",
        ) and not any(n.tag == "table" for n in self.stack):
            return

        # ---- "in select" insertion mode (WHATWG 13.2.6.4.16): with an
        # open <select>, only option/optgroup/hr/script/template content
        # is allowed; input/keygen/textarea (and, when the select sits
        # inside a table, table-structure tags) close the select and
        # reprocess; a nested <select> start acts as </select>; anything
        # else is IGNORED. stdlib-naive nesting diverged from x/net/html.
        if tag == "select":
            self._seen_select = True
        sel_i = (
            self._find_in_scope("select", SCOPE_BOUNDARY)
            if self._seen_select else -1
        )
        if sel_i != -1:
            if tag == "select":
                self._pop_through(sel_i)
                return
            if tag in ("input", "keygen", "textarea"):
                self._pop_through(sel_i)  # close select, reprocess below
            elif tag in (
                "caption", "table", "tbody", "tfoot", "thead", "tr", "td", "th",
            ):
                if any(n.tag == "table" for n in self.stack[:sel_i]):
                    self._pop_through(sel_i)  # "in select in table"
                else:
                    return  # plain in-select: ignored
            elif tag == "hr":
                # spec hr-in-select: pop option/optgroup, insert inside
                # the select (the generic CLOSE_P path would close an
                # outer <p> straight through the select)
                while self.stack and self.stack[-1].tag in ("option", "optgroup"):
                    self.stack.pop()
                self._current().append_child(
                    Node(ELEMENT, "hr", "", self._dedupe_attrs(attrs))
                )
                return
            elif tag not in ("option", "optgroup", "script", "template"):
                return  # ignored in select

        if tag in CLOSE_P:
            # quirks mode: <table> does NOT close an open <p> (the one
            # in-body rule x/net/html gates on the doctype-derived
            # quirks flag — old web pages rely on tables inside p)
            if tag != "table" or not self.quirks:
                self._close_p()
        if tag in HEADINGS and self.stack and self.stack[-1].tag in HEADINGS:
            self.stack.pop()
        if tag == "li":
            self._close_list_item(("li",))
        elif tag in ("dd", "dt"):
            self._close_list_item(("dd", "dt"))
        elif tag == "a":
            # a start tag while an <a> is in the active formatting list:
            # run the adoption agency for "a", then drop the stale element
            for i in range(len(self.afe) - 1, -1, -1):
                e = self.afe[i]
                if e is _MARKER:
                    break
                if e.tag == "a":
                    self._adoption_agency("a")
                    if e in self.afe:
                        self.afe.remove(e)
                    if e in self.stack:
                        self.stack.remove(e)
                    break
        elif tag == "nobr":
            self._reconstruct_afe()
            if self._find_in_scope("nobr", SCOPE_BOUNDARY) != -1:
                self._adoption_agency("nobr")
                self._reconstruct_afe()
        elif tag == "button":
            i = self._find_in_scope("button", SCOPE_BOUNDARY)
            if i != -1:
                self._pop_through(i)
        elif tag == "option":
            if self.stack and self.stack[-1].tag == "option":
                self.stack.pop()
        elif tag == "optgroup":
            while self.stack and self.stack[-1].tag in ("option", "optgroup"):
                self.stack.pop()
        elif tag == "select":
            i = self._find_in_scope("select", SCOPE_BOUNDARY)
            if i != -1:
                self._pop_through(i)
        elif tag in ("td", "th"):
            self._clear_to_table_context()
            i = self._find_in_scope_any(("td", "th"), ("table",))
            if i != -1:
                self._pop_through(i)
            self._ensure_row()
        elif tag == "tr":
            self._clear_to_table_context()
            i = self._find_in_scope("tr", ("table", "html"))
            if i != -1:
                self._pop_through(i)
            self._ensure_section()
        elif tag in TABLE_SECTION:
            self._clear_to_table_context()
            i = self._find_in_scope_any(TABLE_SECTION, ("table", "html"))
            if i != -1:
                self._pop_through(i)
        elif tag == "caption" or tag == "colgroup":
            # caption/colgroup sit directly under the table: close any
            # open cell/row/section first
            self._clear_to_table_root()
        elif tag == "col":
            # a <col> directly in a table implies <colgroup>; consecutive
            # cols share the implied one
            if self._current().tag != "colgroup":
                self._clear_to_table_root()
                if self._current().tag == "table":
                    cg = create_element("colgroup")
                    self._current().append_child(cg)
                    self.stack.append(cg)
        elif tag == "table":
            # <table> while already directly in table context -> close it
            if self._in_table_context():
                i = self._find_in_scope("table", ("html",))
                if i != -1:
                    self._pop_through(i)

        if tag not in NO_RECONSTRUCT:
            self._reconstruct_afe()

        foster = False
        if self._in_table_context():
            if tag not in TABLE_ALLOWED and tag != "table":
                foster = True
                # spec "in table" input special case: type=hidden inputs
                # stay INSIDE the table (old-web form plumbing relies on
                # it); every other input fosters like any other content
                if tag == "input" and any(
                    k == "type" and (v or "").lower() == "hidden"
                    for k, v in attrs
                ):
                    foster = False

        el_attrs = self._dedupe_attrs(attrs)
        if tag in FOREIGN_ROOTS:
            el_attrs = [
                [SVG_ATTR_ADJUST.get(k, MATHML_ATTR_ADJUST.get(k, k)), v]
                for k, v in el_attrs
            ]
        el = Node(ELEMENT, tag, "", el_attrs)
        self._insert_node(el, foster)

        if tag == "form":
            self.form_open = True
        if tag in VOID_ELEMENTS:
            return
        if tag in FORMATTING:
            self._afe_push(el)
        elif tag in AFE_MARKER_TAGS:
            self.afe.append(_MARKER)
        if tag in FOREIGN_ROOTS:
            # <svg/> / <math/>: the self-closing flag is acknowledged for
            # foreign roots — leaving it open swallowed the whole rest of
            # the document into the svg subtree
            el.ns = tag
            if not explicit_self_closing:
                self.stack.append(el)
            return
        self._push(el)
        if tag in ("pre", "listing", "textarea"):
            self.strip_leading_newline = True

    def _find_in_scope_any(self, tags, boundary) -> int:
        for i in range(len(self.stack) - 1, -1, -1):
            t = self.stack[i].tag
            if t in tags:
                return i
            if t in boundary:
                return -1
        return -1

    def _clear_to_table_context(self):
        """WHATWG 'clear the stack back to a table (body/row) context':
        when a table-structure tag arrives, pop anything that is not
        table structure (e.g. formatting elements fostered out of the
        table) — but only while a table is actually open."""
        stack = self.stack
        if not any(n.tag == "table" for n in stack):
            return
        # caption is NOT in the keep set: every table-structure tag ends
        # an open caption and reprocesses ("in caption" mode rules)
        i = len(stack)
        while i > 0 and stack[i - 1].tag not in (
            "table", "tbody", "thead", "tfoot", "tr", "td", "th",
        ):
            i -= 1
        if i < len(stack):
            self._pop_through(i)

    def _body_is_empty(self) -> bool:
        """frameset-ok approximation: no element children and only
        whitespace text so far."""
        c = self.body.first_child
        while c is not None:
            if c.type == ELEMENT:
                return False
            if c.type == TEXT and c.data.strip("\t\n\f\r ") != "":
                return False
            c = c.next
        return True

    def _clear_to_table_root(self):
        """Pop back to the nearest open <table> itself (caption/colgroup/
        col belong directly under it, closing any open cell or row)."""
        stack = self.stack
        for i in range(len(stack) - 1, -1, -1):
            if stack[i].tag == "table":
                if i + 1 < len(stack):
                    self._pop_through(i + 1)
                return

    def _ensure_section(self):
        """Imply <tbody> for a <tr> appearing directly inside <table>."""
        cur = self._current()
        if cur.tag == "table":
            tbody = create_element("tbody")
            cur.append_child(tbody)
            self.stack.append(tbody)

    def _ensure_row(self):
        cur = self._current()
        if cur.tag == "table":
            self._ensure_section()
            cur = self._current()
        if cur.tag in TABLE_SECTION:
            tr = create_element("tr")
            cur.append_child(tr)
            self.stack.append(tr)

    # ------------------------------------------------------------ end tags

    def handle_endtag(self, tag):
        if self.stack and self.stack[-1].ns is not None:
            # foreign end tag: walk down the foreign run for a (case-
            # insensitive) match; an HTML-namespace element below means
            # the tag is processed with the HTML rules instead
            fell_to_html = False
            for i in range(len(self.stack) - 1, -1, -1):
                node = self.stack[i]
                if node.ns is None:
                    fell_to_html = True
                    break
                if node.tag.lower() == tag:
                    self._pop_through(i)
                    return
            if not fell_to_html:
                return

        if self.frameset_mode:
            if tag == "frameset" and len(self.frameset_stack) > 1:
                self.frameset_stack.pop()
            elif tag == "noframes" and self.stack and self.stack[-1].tag == "noframes":
                self.stack.pop()
            return

        # in-select mode processes only its own end tags; everything else
        # (including formatting end tags, which would otherwise run the
        # adoption agency across the select) is ignored — EXCEPT the
        # "in select in table" rule: table-structure end tags close the
        # select and are reprocessed (mirrors the start-tag branch above;
        # r2 ADVICE: '<table><tr><td><select></table>' must close both)
        if self._seen_select and tag not in (
            "option", "optgroup", "select", "template",
        ):
            sel_i = self._find_in_scope("select", SCOPE_BOUNDARY)
            if sel_i != -1:
                if tag in (
                    "caption", "table", "tbody", "tfoot", "thead", "tr", "td", "th",
                ) and any(n.tag == "table" for n in self.stack[:sel_i]):
                    self._pop_through(sel_i)  # fall through: reprocess tag
                else:
                    return

        if tag == "br":
            # spec: </br> acts like <br>
            self._start_tag("br", [], False)
            return
        if tag in ("html",):
            return
        if tag == "body":
            return
        if tag == "head":
            # only meaningful while still in head (HTML5 'in head' mode);
            # a stray </head> in body is ignored — clearing the open stack
            # unconditionally reparented everything after it to <body>
            if self.mode == "in_head":
                self.mode = "after_head"
                self.stack.clear()
            return
        if tag in VOID_ELEMENTS:
            return
        if tag == "p":
            i = self._find_in_scope("p", BUTTON_SCOPE_BOUNDARY)
            if i == -1:
                # </p> with no open <p>: insert an empty one
                el = create_element("p")
                self._insert_node(el, self._in_table_context())
                return
            self._pop_through(i)
            return
        if tag == "form":
            self.form_open = False

        if tag in HEADINGS:
            i = self._find_in_scope_any(HEADINGS, SCOPE_BOUNDARY)
            if i != -1:
                self._pop_through(i)
            return

        if tag in FORMATTING:
            self._adoption_agency(tag)
            return

        if tag in SPECIAL:
            boundary = SCOPE_BOUNDARY if tag not in SCOPE_BOUNDARY else ("html",)
            i = self._find_in_scope(tag, boundary)
            if i != -1:
                self._pop_through(i)
            return

        # "any other end tag": pop if found before a special element
        self._any_other_end_tag(tag)

    # ------------------------------------------------------------ text & misc

    def handle_data(self, data):
        if not data:
            return
        if self.cdata_elem is not None and self.cdata_elem in RCDATA:
            data = _htmlmod.unescape(data)
        if self.frameset_mode and self.cdata_elem is None:
            # in-frameset keeps only whitespace characters
            ws = "".join(c for c in data if c in "\t\n\f\r ")
            if ws and not self.stack:
                self._append_text(self.frameset_stack[-1], ws)
            elif ws and self.stack:
                self._append_text(self.stack[-1], ws)
            return
        if self.strip_leading_newline:
            self.strip_leading_newline = False
            if data.startswith("\n"):
                data = data[1:]
                if not data:
                    return
        if self.mode != "in_body" and not self.stack:
            if data.strip() == "":
                if self.mode == "in_head":
                    self._append_text(self.head, data)
                return
            self.mode = "in_body"
        self.strip_leading_newline = False
        # character tokens in body reconstruct the active formatting
        # elements (raw-text/RCDATA content and foreign content do not;
        # HTML integration points DO — their children are HTML).
        # r7: the common case (HTML namespace, empty AFE list, non-table
        # parent) is inlined — _foreign_state/_reconstruct_afe/
        # _in_table_context/_current are the hottest per-text-token call
        # chain in the tokenizer profile; the slow spellings below are
        # byte-identical for the uncommon cases.
        stack = self.stack
        cur = stack[-1] if stack else None
        if self.cdata_elem is None and (
            (cur is None or cur.ns is None) or self._foreign_state() != "foreign"
        ):
            if self.afe:
                self._reconstruct_afe()
                stack = self.stack
                cur = stack[-1] if stack else None
        if (
            cur is not None
            and cur.type == ELEMENT
            and cur.tag in TABLE_CONTEXT
            and data.strip() != ""
        ):
            parent, ref = self._foster_target()
            if ref is not None and ref.prev is not None and ref.prev.type == TEXT:
                ref.prev.data += data
            else:
                node = Node(TEXT, "", data)
                parent.insert_before(node, ref)
            return
        self._append_text(cur if cur is not None else self._current(), data)

    def handle_comment(self, data):
        node = Node(COMMENT, "", data)
        if self.mode == "initial" and not self.stack:
            self.doc.insert_before(node, self.html)
        else:
            self._current().append_child(node)

    def handle_decl(self, decl):
        # <!DOCTYPE ...> — not kept in the tree, but it decides quirks
        # mode (only the one arriving before any content counts; later
        # doctypes are ignored per the spec)
        if self.mode == "initial" and not self.stack:
            if decl.lower().lstrip().startswith("doctype"):
                self.quirks = _doctype_is_quirky(decl)

    def unknown_decl(self, data):
        # bogus <![ ... ]> markup becomes a comment per HTML5 (except in
        # foreign content, where CDATA sections are text)
        if self._foreign_state() == "foreign" and data.startswith("CDATA["):
            self.handle_data(data[6:])
        else:
            self.handle_comment("[" + data + "]")

    def handle_pi(self, data):
        # <? ... > is a bogus comment per HTML5
        self.handle_comment("?" + data)


_META_CHARSET_RX = None


def _sniff_decode(raw: bytes) -> str:
    """Decode page bytes like the reference stack does (go-shiori/dom pulls
    gogs/chardet for sniffing — SURVEY.md §1): UTF-8 wins whenever the bytes
    are valid UTF-8 (every reference fixture is, including `qq` whose meta
    tag *claims* gb2312); otherwise honor a declared <meta charset>/
    content-type charset if Python knows the codec; fall back to UTF-8 with
    replacement."""
    global _META_CHARSET_RX
    if raw.startswith(b"\xff\xfe") or raw.startswith(b"\xfe\xff"):
        return raw.decode("utf-16", errors="replace")
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        pass
    if _META_CHARSET_RX is None:
        import re as _re

        _META_CHARSET_RX = _re.compile(
            rb"""charset\s*=\s*["']?\s*([a-zA-Z0-9._-]+)""", _re.I
        )
    m = _META_CHARSET_RX.search(raw[:4096])
    if m:
        try:
            return raw.decode(m.group(1).decode("ascii"), errors="replace")
        except (LookupError, UnicodeDecodeError):
            pass
    guessed = _statistical_decode(raw)
    if guessed is not None:
        return guessed
    return raw.decode("utf-8", errors="replace")


# candidate legacy encodings for undeclared non-UTF-8 pages. With the
# frequency/coherence scorer below, order only breaks exact ties.
_STAT_CODECS = (
    "shift_jis", "euc-jp", "euc-kr", "gb18030", "big5", "cp1252", "cp1251",
)

# ~230 highest-frequency Han characters, simplified + traditional forms
# combined. This is the tiny frequency prior that separates the CJK
# multi-byte codecs from each other: they all happily strict-decode each
# other's byte streams into *coherent but rare* Han garbage, while the
# correct decode is dense in these.
_COMMON_HAN = frozenset(
    "的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得就那"
    "要下以生会自着去之过家学对可她里后小么心多天而能好都然没日于起还发"
    "成事只作当想看文无开手十用主行方又如前所本见经头面公同三已老从动两"
    "长知民样现分将外但身些与高意进把法此实回二理美点月明其种声全工己话"
    "儿者向情部正名定女问力机给等几很业最间新什打便位因重被走电四第门相"
    "次东政海口使教西再平真听世气信北少关并内加化由却代军产入先山五太水"
    "万市眼体别处总才场师书比住员九笑性通目华报立马命张活难神数件安表原"
    "這中大來國個到說們為時會自著過學對她裡後麼還發成當無開見經頭動兩長"
    "知民樣現分將們條與高進點聲全話兒問機給幾業最間甚打電門相東們聽氣關"
    "內場師書員歷難數點錢讓護車馬"
)


def _score_decoded(s: str) -> float:
    """Plausibility of a decoded sample. Three signals, multiplied:
    per-character weights (common Han / kana / hangul score high, C1
    controls and replacement chars score hard-negative), script
    coherence (real text concentrates in one script family; wrong
    EUC-grid decodes produce hangul/han salads), and a density damp on
    bare Latin-1 letters (Russian-as-cp1252 is 'coherent latin' at 90%
    non-ASCII density; real French is coherent at 5%)."""
    han = common = kana = hkana = hangul = cyr = latin = oth = punct = bad = unk = 0
    total = len(s)
    if not total:
        return -1.0
    for ch in s:
        o = ord(ch)
        if o < 0x80:
            continue
        if 0x4E00 <= o <= 0x9FFF:
            han += 1
            if ch in _COMMON_HAN:
                common += 1
        elif 0x3040 <= o <= 0x30FF:
            kana += 1
        elif 0xFF61 <= o <= 0xFF9F:
            hkana += 1  # halfwidth kana: a classic wrong-decode artifact
        elif 0xAC00 <= o <= 0xD7A3:
            hangul += 1
        elif 0x0400 <= o <= 0x04FF:
            cyr += 1
        elif 0x00C0 <= o <= 0x024F:
            latin += 1
        elif (
            0x0370 <= o <= 0x03FF or 0x0590 <= o <= 0x06FF
            or 0x0E00 <= o <= 0x0E7F
        ):
            oth += 1
        elif 0x3000 <= o <= 0x303F or 0xFF00 <= o <= 0xFF60 or o in (
            0x2018, 0x2019, 0x201C, 0x201D, 0x2013, 0x2014, 0x2026,
            0x00B7, 0x00A0,
        ):
            punct += 1
        elif 0x80 <= o <= 0x9F or o == 0xFFFD:
            bad += 1
        else:
            unk += 1
    n = han + kana + hkana + hangul + cyr + latin + oth + punct + bad + unk
    if n < 4:  # too little signal to call — let utf-8-replace stand
        return -1.0
    letters = han + kana + hkana + hangul + cyr + latin + oth
    if letters == 0:
        return -1.0
    coherence = max(
        han + kana + hkana,  # CJK-Japanese family (kanji+kana coexist)
        hangul, cyr, latin, oth,
    ) / letters
    density = n / total
    latin_w = 2.0 if density < 0.4 else 1.0
    weighted = (
        han * 1.3 + common * 1.2  # common-Han bonus on top of base
        + kana * 3.0 + hkana * 0.5 + hangul * 2.5 + cyr * 2.0
        + latin * latin_w + oth * 2.0 + punct * 1.0
        - bad * 8.0 - unk * 2.0
    )
    return (weighted / n) * coherence


def _statistical_decode(raw: bytes, sample_bytes: int = 65536):
    """Byte-distribution charset detection for pages that are neither
    valid UTF-8 nor carry a usable declared charset (r2 VERDICT #6: the
    reference's dom dependency ships gogs/chardet for exactly this
    case). Strict-decodes a prefix under each candidate codec — a hard
    failure disqualifies — and ranks survivors by script-block
    plausibility. Returns the full decode under the winner, or None if
    nothing is convincingly better than mojibake."""
    sample = raw[:sample_bytes]
    best = None
    best_score = 1.0  # wrong decodes cap around coherence-damped ~1.0
    for codec in _STAT_CODECS:
        try:
            decoded = sample.decode(codec)
        except UnicodeDecodeError as exc:
            # a multibyte char split at the sample boundary is not a
            # real failure — score the clean prefix instead
            if len(raw) > len(sample) and exc.start >= len(sample) - 4:
                decoded = sample[:exc.start].decode(codec, errors="ignore")
            else:
                continue
        except LookupError:
            continue
        score = _score_decoded(decoded)
        if score > best_score:
            best, best_score = codec, score
    if best is None:
        return None
    return raw.decode(best, errors="replace")


def parse_html(source) -> Node:
    """Parse HTML text/bytes into a Document node.

    Bytes are charset-sniffed (UTF-8-first, then declared charset — see
    _sniff_decode). Newlines are normalized to \\n as the HTML5 tokenizer
    requires.
    """
    if isinstance(source, (bytes, bytearray, memoryview)):
        source = _sniff_decode(bytes(source))
    # HTML5 §13.2.3.5 / x/net/html: a leading U+FEFF BOM is dropped before
    # tokenizing. Left in, it is NOT Python-whitespace, so it flipped the
    # builder to in_body before <head> and misplaced title/meta into body.
    if source[:1] == "﻿":
        source = source[1:]
    if "\r" in source:
        source = source.replace("\r\n", "\n").replace("\r", "\n")
    if "\x00" in source:
        source = source.replace("\x00", "�")
    # The reference parse chain (dom.Parse in generate-test.go and
    # FromReader alike) drops RAW soft hyphens: every fixture whose
    # source bytes contain U+00AD (breitbart, videos-2, wapo-2) has it
    # absent from expected.html while surrounding bytes match exactly.
    # Mirrored here at the same pre-tokenizer stage; entity-encoded
    # &shy; (none in the corpus) would survive either way.
    if "\xad" in source:
        source = source.replace("\xad", "")
    builder = _TreeBuilder()
    try:
        builder.feed(source)
        builder.close()
    except Exception:
        # tolerate tokenizer blowups on hostile input: return what we built
        pass
    return builder.doc
