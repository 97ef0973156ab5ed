"""HTML5-ish tree builder on top of the stdlib ``html.parser`` tokenizer.

The reference parses documents with golang.org/x/net/html, a WHATWG-HTML5
tree builder (`/root/reference/parser-parse.go:18` via go-shiori/dom). No
third-party HTML library is available in this environment, so this module
implements the subset of the HTML5 tree-construction rules that the
readability corpus exercises:

* implied <html>/<head>/<body> structure
* raw-text elements (script/style/iframe/noscript/xmp/noembed/noframes)
  and RCDATA (title/textarea) with entity decoding
* auto-closing: <p> before blocks, li/dd/dt, td/th/tr/table sections,
  option/optgroup, nested <a>
* void elements; ``<tag/>`` self-closing honored only in foreign content
* table foster-parenting of misplaced content
* </p> with no open p inserts an empty <p>; </br> acts as <br>
* \r\n -> \n normalization and leading-newline stripping after <pre>

Deliberately omitted (acceptable divergence, tracked by fixture tests):
the adoption agency algorithm and active-formatting reconstruction.
"""

from __future__ import annotations

import html as _htmlmod
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
    # and RCDATA elements so their content is never tokenized as markup
    CDATA_CONTENT_ELEMENTS = tuple(RAW_TEXT | RCDATA)

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
        self.foreign_depth = 0
        self.form_open = False
        self.strip_leading_newline = False
        self.frameset_mode = False

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
        del self.stack[index:]

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
        if self.foreign_depth == 0 and tag in ("script", "style"):
            self.handle_starttag(tag, attrs)
            self.set_cdata_mode(tag)
            return
        self._start_tag(tag, attrs, explicit_self_closing=True)

    def _dedupe_attrs(self, attrs):
        out = []
        seen = set()
        for k, v in attrs:
            if k in seen:
                continue
            seen.add(k)
            out.append([k, v if v is not None else ""])
        return out

    def _start_tag(self, tag, attrs, explicit_self_closing):
        if self.foreign_depth > 0:
            adj = [
                [SVG_ATTR_ADJUST.get(k, MATHML_ATTR_ADJUST.get(k, k)), v]
                for k, v in self._dedupe_attrs(attrs)
            ]
            el = Node(ELEMENT, SVG_TAG_ADJUST.get(tag, tag), "", adj)
            self._current().append_child(el)
            # foreign content acknowledges the self-closing flag for EVERY
            # element (HTML5 §13.2.6.5) — a nested <svg/> left open would
            # deepen foreign mode for the rest of the document
            if explicit_self_closing:
                return
            if tag in FOREIGN_ROOTS:
                self.foreign_depth += 1
                self.stack.append(el)
            else:
                self._push(el)
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

        if tag in CLOSE_P:
            self._close_p()
        if tag in HEADINGS and self.stack and self.stack[-1].tag in HEADINGS:
            self.stack.pop()
        if tag == "li":
            self._close_list_item(("li",))
        elif tag in ("dd", "dt"):
            self._close_list_item(("dd", "dt"))
        elif tag == "a":
            i = self._find_in_scope("a", SCOPE_BOUNDARY)
            if i != -1:
                # adoption-agency-lite: if only phrasing content is open
                # above the stale <a>, close it (simple case); if a special
                # element (e.g. a <div> inside the <a>) intervenes, the spec
                # keeps those elements open and just drops the stale <a>
                # from the stack — the new <a> nests inside the div.
                if any(self.stack[j].tag in SPECIAL for j in range(i + 1, len(self.stack))):
                    del self.stack[i]
                else:
                    self._pop_through(i)
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
            i = self._find_in_scope_any(("td", "th"), ("table",))
            if i != -1:
                self._pop_through(i)
            self._ensure_row()
        elif tag == "tr":
            i = self._find_in_scope("tr", ("table", "html"))
            if i != -1:
                self._pop_through(i)
            self._ensure_section()
        elif tag in TABLE_SECTION:
            i = self._find_in_scope_any(TABLE_SECTION, ("table", "html"))
            if i != -1:
                self._pop_through(i)
        elif tag == "caption" or tag == "colgroup":
            pass
        elif tag == "table":
            # <table> while already directly in table context -> close it
            if self._in_table_context():
                i = self._find_in_scope("table", ("html",))
                if i != -1:
                    self._pop_through(i)

        foster = False
        if self._in_table_context():
            if tag not in TABLE_ALLOWED and tag != "table":
                foster = True

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
        if tag in FOREIGN_ROOTS:
            # <svg/> / <math/>: the self-closing flag is acknowledged for
            # foreign roots — leaving it open swallowed the whole rest of
            # the document into the svg subtree
            if not explicit_self_closing:
                self.foreign_depth += 1
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
        if self.foreign_depth > 0:
            for i in range(len(self.stack) - 1, -1, -1):
                node = self.stack[i]
                if node.tag.lower() == tag:
                    for j in range(len(self.stack) - 1, i - 1, -1):
                        if self.stack[j].tag in FOREIGN_ROOTS:
                            self.foreign_depth -= 1
                    self._pop_through(i)
                    return
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

        if tag in SPECIAL:
            boundary = SCOPE_BOUNDARY if tag not in SCOPE_BOUNDARY else ("html",)
            i = self._find_in_scope(tag, boundary)
            if i != -1:
                self._pop_through(i)
            return

        # "any other end tag": pop if found before a special element
        for i in range(len(self.stack) - 1, -1, -1):
            node = self.stack[i]
            if node.tag == tag:
                self._pop_through(i)
                return
            if node.tag in SPECIAL:
                return

    # ------------------------------------------------------------ text & misc

    def handle_data(self, data):
        if not data:
            return
        if self.cdata_elem is not None and self.cdata_elem in RCDATA:
            data = _htmlmod.unescape(data)
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
        if self._in_table_context() and data.strip() != "":
            parent, ref = self._foster_target()
            if ref is not None and ref.prev is not None and ref.prev.type == TEXT:
                ref.prev.data += data
            else:
                node = Node(TEXT, "", data)
                parent.insert_before(node, ref)
            return
        self._append_text(self._current(), data)

    def handle_comment(self, data):
        node = Node(COMMENT, "", data)
        if self.mode == "initial" and not self.stack:
            self.doc.insert_before(node, self.html)
        else:
            self._current().append_child(node)

    def handle_decl(self, decl):
        # <!DOCTYPE ...> — recorded nowhere; readability ignores doctype
        pass

    def unknown_decl(self, data):
        # bogus <![ ... ]> markup becomes a comment per HTML5 (except in
        # foreign content, where CDATA sections are text)
        if self.foreign_depth > 0 and data.startswith("CDATA["):
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
    return raw.decode("utf-8", errors="replace")


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
    builder = _TreeBuilder()
    try:
        builder.feed(source)
        builder.close()
    except Exception:
        # tolerate tokenizer blowups on hostile input: return what we built
        pass
    return builder.doc
