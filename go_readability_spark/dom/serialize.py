"""HTML serialization matching golang.org/x/net/html Render semantics,
which produced the reference's golden ``expected.html`` files
(`/root/reference/scripts/generate-test.go:80-130`).

Escaping set: & ' < > " and \\r (x/net/html escape.go); void elements are
rendered ``<br/>``; raw-text element children are rendered literally.
"""

from __future__ import annotations

from .builder import VOID_ELEMENTS
from .node import COMMENT, DOCUMENT, ELEMENT, TEXT, Node

_ESCAPES = {
    "&": "&amp;",
    "'": "&#39;",
    "<": "&lt;",
    ">": "&gt;",
    '"': "&#34;",
    "\r": "&#13;",
}

_LITERAL_TEXT_PARENTS = frozenset(
    ("iframe", "noembed", "noframes", "noscript", "plaintext", "script", "style", "xmp")
)


def escape_text(s: str) -> str:
    if not any(c in s for c in "&'<>\"\r"):
        return s
    return "".join(_ESCAPES.get(c, c) for c in s)


def render(node: Node, parts: list | None = None) -> str:
    own = parts is None
    if own:
        parts = []
    # iterative serializer (hostile pages nest thousands deep)
    stack = [(node, False)]
    while stack:
        nd, closing = stack.pop()
        if closing:
            parts.append("</")
            parts.append(nd.tag)
            parts.append(">")
            continue
        t = nd.type
        if t == TEXT:
            p = nd.parent
            if p is not None and p.type == ELEMENT and p.tag in _LITERAL_TEXT_PARENTS:
                parts.append(nd.data)
            else:
                parts.append(escape_text(nd.data))
        elif t == COMMENT:
            parts.append("<!--")
            parts.append(nd.data)
            parts.append("-->")
        elif t == ELEMENT:
            parts.append("<")
            parts.append(nd.tag)
            for k, v in nd.attrs or ():
                parts.append(" ")
                parts.append(k)
                parts.append('="')
                parts.append(escape_text(v))
                parts.append('"')
            if nd.tag in VOID_ELEMENTS:
                parts.append("/>")
            else:
                parts.append(">")
                # x/net/html render.go: pre/listing/textarea re-emit the
                # leading newline the parser stripped, so parse->render
                # round-trips (the golden expected.html files have it)
                if nd.tag in ("pre", "listing", "textarea"):
                    fc = nd.first_child
                    if fc is not None and fc.type == TEXT and fc.data.startswith("\n"):
                        parts.append("\n")
                stack.append((nd, True))
                c = nd.last_child
                while c is not None:
                    stack.append((c, False))
                    c = c.prev
        elif t == DOCUMENT:
            c = nd.last_child
            while c is not None:
                stack.append((c, False))
                c = c.prev
    return "".join(parts) if own else ""


def inner_html(node: Node) -> str:
    parts: list = []
    c = node.first_child
    while c is not None:
        render(c, parts)
        c = c.next
    return "".join(parts)


def outer_html(node: Node) -> str:
    return render(node)
