"""Minimal mutable DOM for the readability engine.

Mirrors the node surface the reference uses from golang.org/x/net/html
(`/root/reference/parser.go:18`) and the go-shiori/dom helpers: linked
parent/sibling/child pointers, element/text/comment node kinds, and the
handful of accessors (TextContent, Children, GetElementsByTagName, ...).

This is a fresh stdlib-only implementation; it is *not* a port of the Go
code. Nodes are plain Python objects with __slots__ for speed (this runs
inside Arrow-batched pandas UDFs on every document).
"""

from __future__ import annotations

ELEMENT = 1
TEXT = 3
COMMENT = 8
DOCUMENT = 9
DOCTYPE = 10


class Node:
    __slots__ = (
        "type",
        "tag",
        "data",
        "attrs",
        "parent",
        "prev",
        "next",
        "first_child",
        "last_child",
        "ns",
    )

    def __init__(self, type_: int, tag: str = "", data: str = "", attrs=None,
                 ns=None):
        self.type = type_
        self.tag = tag          # element tag name (lowercase) or "" for non-elements
        self.data = data        # text/comment payload
        self.attrs = attrs      # list[[name, value]] for elements, else None
        self.ns = ns            # None = HTML namespace; "svg"/"math" = foreign
        self.parent = None
        self.prev = None
        self.next = None
        self.first_child = None
        self.last_child = None

    # ------------------------------------------------------------------ tree ops

    def append_child(self, child: "Node") -> None:
        if child.parent is not None:
            child.parent.remove_child(child)
        child.parent = self
        last = self.last_child
        if last is None:
            self.first_child = child
            self.last_child = child
            child.prev = None
            child.next = None
        else:
            last.next = child
            child.prev = last
            child.next = None
            self.last_child = child

    def insert_before(self, child: "Node", ref: "Node | None") -> None:
        if ref is None:
            self.append_child(child)
            return
        if child.parent is not None:
            child.parent.remove_child(child)
        child.parent = self
        prev = ref.prev
        child.prev = prev
        child.next = ref
        ref.prev = child
        if prev is None:
            self.first_child = child
        else:
            prev.next = child

    def remove_child(self, child: "Node") -> None:
        prev, nxt = child.prev, child.next
        if prev is None:
            self.first_child = nxt
        else:
            prev.next = nxt
        if nxt is None:
            self.last_child = prev
        else:
            nxt.prev = prev
        child.parent = None
        child.prev = None
        child.next = None

    def replace_child(self, new: "Node", old: "Node") -> None:
        self.insert_before(new, old)
        self.remove_child(old)

    def detach(self) -> None:
        if self.parent is not None:
            self.parent.remove_child(self)

    # ------------------------------------------------------------------ queries

    def child_nodes(self):
        out = []
        c = self.first_child
        while c is not None:
            out.append(c)
            c = c.next
        return out

    def children(self):
        out = []
        c = self.first_child
        while c is not None:
            if c.type == ELEMENT:
                out.append(c)
            c = c.next
        return out

    def first_element_child(self):
        c = self.first_child
        while c is not None:
            if c.type == ELEMENT:
                return c
            c = c.next
        return None

    def next_element_sibling(self):
        c = self.next
        while c is not None:
            if c.type == ELEMENT:
                return c
            c = c.next
        return None

    def prev_element_sibling(self):
        c = self.prev
        while c is not None:
            if c.type == ELEMENT:
                return c
            c = c.prev
        return None

    def clone(self, deep: bool = True) -> "Node":
        # __new__ + direct slot stores and inline sibling linking: the
        # retry-sieve clones the whole document per grab attempt, so this
        # runs for every tree node of every extracted page
        new = Node.__new__

        def fresh(src):
            m = new(Node)
            m.type = src.type
            m.tag = src.tag
            m.data = src.data
            a = src.attrs
            # shared tuples are immutable — the clone can alias them
            m.attrs = a if a is None or type(a) is tuple else [x[:] for x in a]
            m.ns = src.ns
            m.parent = None
            m.prev = None
            m.next = None
            m.first_child = None
            m.last_child = None
            return m

        n = fresh(self)
        if not deep:
            return n
        # iterative deep copy (hostile web pages nest thousands deep);
        # loop body inlines fresh() — one call per node is measurable at
        # ~250k nodes per corpus pass
        dst = n
        c = self.first_child
        stack = []
        while c is not None or stack:
            if c is None:
                c, dst = stack.pop()
                c = c.next
                continue
            cc = new(Node)
            cc.type = c.type
            cc.tag = c.tag
            cc.data = c.data
            a = c.attrs
            cc.attrs = a if a is None or type(a) is tuple else [x[:] for x in a]
            cc.ns = c.ns
            cc.prev = None
            cc.next = None
            cc.first_child = None
            cc.last_child = None
            cc.parent = dst
            last = dst.last_child
            if last is None:
                dst.first_child = cc
            else:
                last.next = cc
                cc.prev = last
            dst.last_child = cc
            if c.first_child is not None:
                stack.append((c, dst))
                dst = cc
                c = c.first_child
            else:
                c = c.next
        return n

    def __repr__(self):  # pragma: no cover - debug aid
        if self.type == ELEMENT:
            return f"<Element {self.tag} attrs={self.attrs}>"
        if self.type == TEXT:
            return f"<Text {self.data[:30]!r}>"
        if self.type == COMMENT:
            return f"<Comment {self.data[:30]!r}>"
        return f"<Node type={self.type}>"


# ---------------------------------------------------------------------- helpers
# Free functions mirroring the go-shiori/dom helper surface used by the
# reference (GetAttribute / SetAttribute / TextContent / GetElementsByTagName).

def get_attribute(node: Node, name: str) -> str:
    attrs = node.attrs
    if not attrs:
        return ""
    for k, v in attrs:
        if k == name:
            return v
    return ""


def has_attribute(node: Node, name: str) -> bool:
    attrs = node.attrs
    if not attrs:
        return False
    for k, _ in attrs:
        if k == name:
            return True
    return False


def set_attribute(node: Node, name: str, value: str) -> None:
    attrs = node.attrs
    if attrs is None:
        attrs = node.attrs = []
    elif type(attrs) is tuple:
        # copy-on-write: a tuple means the attrs are SHARED with the
        # builder's attr-span intern cache (and possibly other nodes) —
        # privatize to list-of-lists before the first mutation
        attrs = node.attrs = [[k, v] for k, v in attrs]
    for item in attrs:
        if item[0] == name:
            item[1] = value
            return
    attrs.append([name, value])


def remove_attribute(node: Node, name: str) -> None:
    attrs = node.attrs
    if not attrs:
        return
    # always rebuild as list-of-LISTS: filtering a shared tuple with
    # `[a for a in ...]` would leak immutable inner tuples into a
    # private list, and a later set_attribute would crash on item[1]=
    node.attrs = [[k, v] for k, v in attrs if k != name]


def class_name(node: Node) -> str:
    return get_attribute(node, "class")


def class_and_id(node: Node) -> tuple:
    """(class, id) in ONE attribute-list pass (r7): the grab-article scan
    and the class-weight scorer read both per node per attempt, and the
    two separate scans were a top attribute-lookup consumer in the
    extraction profile. First-occurrence semantics match get_attribute."""
    cls = nid = None
    attrs = node.attrs
    if attrs:
        for item in attrs:
            k = item[0]
            if k == "class":
                if cls is None:
                    cls = item[1]
            elif k == "id":
                if nid is None:
                    nid = item[1]
    return (cls or "", nid or "")


def node_id(node: Node) -> str:
    return get_attribute(node, "id")


def text_content(node: Node) -> str:
    """Concatenation of all text-node payloads in tree order
    (go-shiori/dom TextContent semantics used at
    /root/reference/parser-parse.go:92).

    Parent-pointer climb instead of an explicit stack: these walkers are
    the hottest functions in the whole extraction profile (called for
    every score/clean decision), and dropping the per-node list
    append/pop is a measurable win across a corpus."""
    if node.type == TEXT:
        return node.data
    c = node.first_child
    if c is None:
        return ""
    if c.next is None and c.first_child is None:
        # single-leaf-child element (<p>text</p>, <a>label</a> — the
        # dominant shape in scoring walks): skip the list machinery
        return c.data if c.type == TEXT else ""
    parts = []
    append = parts.append
    while c is not None:
        if c.type == TEXT:
            append(c.data)
        elif c.first_child is not None:
            c = c.first_child
            continue
        while c.next is None:
            c = c.parent
            if c is node or c is None:
                return "".join(parts)
        c = c.next
    return "".join(parts)


def get_elements_by_tag_name(node: Node, tag: str):
    """All descendant elements with the given tag, document order.
    tag='*' matches every element. Does not include `node` itself."""
    out = []
    append = out.append
    any_tag = tag == "*"
    c = node.first_child
    while c is not None:
        if c.type == ELEMENT:
            if any_tag or c.tag == tag:
                append(c)
            if c.first_child is not None:
                c = c.first_child
                continue
        while c.next is None:
            c = c.parent
            if c is node or c is None:
                return out
        c = c.next
    return out


def iter_elements(node: Node):
    """Yield descendant elements in document order (no self)."""
    c = node.first_child
    while c is not None:
        if c.type == ELEMENT:
            yield c
            if c.first_child is not None:
                c = c.first_child
                continue
        while c.next is None:
            c = c.parent
            if c is node or c is None:
                return
        c = c.next


def create_element(tag: str) -> Node:
    return Node(ELEMENT, tag, "", [])


def create_text(data: str) -> Node:
    return Node(TEXT, "", data)


def document_element(doc: Node):
    c = doc.first_child
    while c is not None:
        if c.type == ELEMENT and c.tag == "html":
            return c
        c = c.next
    return None


def body_element(doc: Node):
    html = document_element(doc)
    if html is None:
        return None
    c = html.first_child
    while c is not None:
        if c.type == ELEMENT and c.tag == "body":
            return c
        c = c.next
    return None


def unlink_tree(node: Node) -> None:
    """Break every parent/sibling/child link in the subtree so plain
    reference counting reclaims it immediately.

    The DOM is cyclic (parent <-> child, prev <-> next), so dropped trees
    otherwise wait for the cyclic GC — and at extraction throughput the
    allocation rate triggers repeated full gen-2 collections that scan
    every live node (measured: a single 740 ms pause attributed to one
    document clone). The extract pipeline tears trees down explicitly and
    runs with the cyclic collector damped (plans/extract.py)."""
    stack = [node]
    pop = stack.pop
    append = stack.append
    while stack:
        n = pop()
        c = n.first_child
        while c is not None:
            append(c)
            c = c.next
        n.parent = None
        n.prev = None
        n.next = None
        n.first_child = None
        n.last_child = None
