"""Adoption agency + active-formatting-element reconstruction (WHATWG
§13.2.6.4.7 / x/net/html parity). Expected trees verified against the
spec's own worked examples and Chrome/x-net-html output shapes."""

import time

from go_readability_spark.dom.builder import parse_html
from go_readability_spark.dom.serialize import render


def body_of(src: str) -> str:
    out = render(parse_html(src))
    return out.split("<body>")[1].split("</body>")[0]


def test_misnested_formatting_classic():
    assert body_of("<p><b><i>bi</b>i only</i></p>") == (
        "<p><b><i>bi</i></b><i>i only</i></p>"
    )


def test_formatting_across_block():
    assert body_of("<b>1<p>2</b>3</p>") == "<b>1</b><p><b>2</b>3</p>"


def test_reconstruction_after_block_pop():
    # </div> pops <b> from the stack but not the formatting list; the
    # following text re-opens a clone
    assert body_of("<div><b>x</div>y") == "<div><b>x</b></div><b>y</b>"


def test_spec_worked_example_b_i_p():
    # the WHATWG spec's own misnesting example
    assert body_of("<b>1<i>2<p>3</b>4") == (
        "<b>1<i>2</i></b><i><p><b>3</b>4</p></i>"
    )


def test_stale_a_is_adopted():
    assert body_of("<a href=1>1<a href=2>2</a>") == (
        '<a href="1">1</a><a href="2">2</a>'
    )


def test_a_spanning_div_nests_new_anchor_inside():
    # <div> inside <a>, then a new <a>: the stale <a> is segmented
    out = body_of("<a href=1>1<div>2<a href=2>3</a></div>")
    assert out == '<a href="1">1</a><div><a href="1">2</a><a href="2">3</a></div>'


def test_cell_boundary_clears_formatting():
    # <b> left open in one cell must NOT leak into the next (AFE marker)
    assert body_of("<table><tr><td><b>x</td><td>y</td></tr></table>") == (
        "<table><tbody><tr><td><b>x</b></td><td>y</td></tr></tbody></table>"
    )


def test_fostered_formatting_before_table():
    assert body_of("<table><b>f<tr><td>x</td></tr></table>after") == (
        "<b>f</b><table><tbody><tr><td>x</td></tr></tbody></table><b>after</b>"
    )


def test_marquee_is_a_formatting_boundary():
    assert body_of("<p><b>a<marquee>b</marquee>c") == (
        "<p><b>a<marquee>b</marquee>c</b></p>"
    )


def test_loose_table_structure_tags_ignored():
    # in-body td/tr/tbody with no open table: spec says ignore the token
    assert body_of("<td>loose</td>") == "loose"
    assert body_of("<tr><td>a</td></tr>text") == "atext"
    assert body_of("x<tbody>y") == "xy"


def test_noahs_ark_caps_identical_entries():
    # 10 identical <b>s, all popped by a div-close; reconstruction
    # re-opens at most 3 (the Noah's Ark clause)
    src = "<div>" + "<b>" * 10 + "x</div>y"
    out = body_of(src)
    tail = out.split("</div>")[1]
    assert tail.count("<b>") == 3 and tail.endswith("y" + "</b>" * 3)


def test_nobr_self_closes_via_adoption():
    out = body_of("<nobr>1<nobr>2")
    assert out == "<nobr>1</nobr><nobr>2</nobr>"


def test_hostile_formatting_floods_stay_linear():
    flood = "".join(f'<b class="c{i}">x' for i in range(8000))
    t0 = time.time()
    parse_html(flood)
    assert time.time() - t0 < 5.0
    flood2 = "<b><i>" * 2000 + "x" + "</b>" * 2000
    t0 = time.time()
    parse_html(flood2)
    assert time.time() - t0 < 5.0


def test_formatting_inside_raw_text_untouched():
    # rawtext content must not trigger reconstruction
    out = body_of("<div><b>x</div><script>a < b</script>t")
    assert "<script>a < b</script>" in out
    assert out.endswith("<b>t</b>")


def test_end_tag_open_requires_alpha():
    """HTML5: '</' not followed by an ASCII letter is a bogus comment in
    data state ('</ p>' does NOT close the p), '</>' is ignored."""
    assert body_of("<p>a</ p>b") == "<p>a<!-- p-->b</p>"
    assert body_of("<p>a</>b") == "<p>ab</p>"
    assert body_of("<p>a</ b c>d") == "<p>a<!-- b c-->d</p>"


def test_whitespace_end_tag_inside_script_stays_text():
    """'</ script>' in script data is TEXT per the spec — stdlib's
    tokenizer would have closed the script there and spilled the rest of
    the source into the DOM."""
    from go_readability_spark.dom.builder import parse_html
    from go_readability_spark.dom.serialize import render

    out = render(parse_html("<p>z</p><script>a='</ script>';b</script><p>t</p>"))
    assert "<script>a='</ script>';b</script>" in out
    assert out.endswith("<p>t</p></body></html>")


def test_attribute_charref_legacy_rule():
    """Named refs without ';' followed by alnum/'=' must NOT expand in
    ATTRIBUTE values (x/net/html implements this; html.unescape would
    turn '?a=1&ampb=2' into '?a=1&b=2' and '&copy=2020' into '©=2020'),
    while data-state text keeps full expansion."""
    out = body_of('<a href="?a=1&ampb=2&amp;c=3">t</a><p>&copy=1 &amp;x</p>')
    assert 'href="?a=1&amp;ampb=2&amp;c=3"' in out
    assert "<p>©=1 &amp;x</p>" in out


def test_plaintext_swallows_rest():
    out = body_of("<p>a</p><plaintext><p>not markup</p> raw")
    assert out == "<p>a</p><plaintext><p>not markup</p> raw</plaintext>"


def test_unterminated_rawtext_emitted_at_eof():
    """HTML5 emits unterminated script/rcdata content as text; stdlib's
    goahead silently dropped it."""
    assert body_of("<p>a</p><script>unterminated = 1") == (
        "<p>a</p><script>unterminated = 1</script>"
    )
    assert body_of("<p>a</p><textarea>tail") == "<p>a</p><textarea>tail</textarea>"


def test_comment_tokenization_spec_cases():
    assert body_of("<p>a<!-->b</p>") == "<p>a<!---->b</p>"
    assert body_of("<p>a<!--->b</p>") == "<p>a<!---->b</p>"
    assert body_of("<p>a<!-- x --!>b</p>") == "<p>a<!-- x -->b</p>"
    # '-- >' does NOT close a comment (stdlib's --\\s*> regex did)
    assert body_of("<p>a<!-- x -- >in -->b</p>") == "<p>a<!-- x -- >in -->b</p>"


def test_cdata_section_is_bogus_comment_in_html():
    # ends at the FIRST '>' in HTML content; real CDATA only in foreign
    assert body_of("<p>a<![CDATA[x]]>b</p>") == "<p>a<!--[CDATA[x]]-->b</p>"
    assert body_of("<p>a<![CDATA[a>b]]>c</p>") == "<p>a<!--[CDATA[a-->b]]&gt;c</p>"
    assert body_of("<svg><![CDATA[a>b]]></svg>t") == "<svg>a&gt;b</svg>t"


def test_quirks_mode_table_in_p():
    """Quirks mode (no or legacy doctype): <table> does NOT close an
    open <p> — the one tree-construction rule the doctype controls."""
    q = body_of("<p>a<table><tr><td>x</td></tr></table>b")
    assert q == "<p>a<table><tbody><tr><td>x</td></tr></tbody></table>b</p>"
    s = body_of("<!DOCTYPE html><p>a<table><tr><td>x</td></tr></table>b")
    assert s == "<p>a</p><table><tbody><tr><td>x</td></tr></tbody></table>b"


def test_doctype_quirks_classification():
    from go_readability_spark.dom.builder import _doctype_is_quirky

    assert not _doctype_is_quirky("DOCTYPE html")
    assert not _doctype_is_quirky('DOCTYPE html SYSTEM "about:legacy-compat"')
    assert not _doctype_is_quirky(
        'DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN" '
        '"http://www.w3.org/TR/html4/loose.dtd"'
    )
    # 4.01 Transitional WITHOUT a system id IS quirky
    assert _doctype_is_quirky('DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN"')
    assert _doctype_is_quirky('DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 3.2 Final//EN"')
    assert _doctype_is_quirky('DOCTYPE HTML PUBLIC "HTML"')
    assert _doctype_is_quirky("DOCTYPE svg")
    assert _doctype_is_quirky("DOCTYPE")


def test_in_select_mode():
    """WHATWG in-select: disallowed start tags are IGNORED, a nested
    <select> acts as </select>, input/keygen/textarea close the select
    and reprocess, hr inserts inside it, stray end tags are ignored."""
    assert body_of("<select><div>x</div></select>after") == "<select>x</select>after"
    assert body_of("<select><option>a<div>b</select>c") == (
        "<select><option>ab</option></select>c"
    )
    assert body_of("<select><select>x") == "<select></select>x"
    assert body_of("<select><option>a<input>b") == (
        "<select><option>a</option></select><input/>b"
    )
    assert body_of("<p>t<select><hr><option>o</select>u") == (
        "<p>t<select><hr/><option>o</option></select>u</p>"
    )
    assert body_of("<select><option>a</p>b</select>") == (
        "<select><option>ab</option></select>"
    )


def test_in_select_in_table():
    # a select opened inside a table: table-structure tags close it
    out = body_of("<table><tr><td><select><td>x")
    assert out == (
        "<table><tbody><tr><td><select></select></td><td>x</td></tr></tbody></table>"
    )


def test_formatting_end_tag_ignored_in_select():
    # </b> inside a select must not run the adoption agency across it
    assert body_of("<b>x<select></b>y</select>z") == (
        "<b>x<select>y</select>z</b>"
    )


def _check_tree_integrity(node, seen=None):
    """Every child's parent/prev/next/last_child pointer is consistent
    and the structure is acyclic — the adoption agency does manual
    surgery on all of these."""
    if seen is None:
        seen = set()
    assert id(node) not in seen, "cycle"
    seen.add(id(node))
    c = node.first_child
    prev = None
    while c is not None:
        assert c.parent is node
        assert c.prev is prev
        if prev is not None:
            assert prev.next is c
        _check_tree_integrity(c, seen)
        prev = c
        c = c.next
    assert node.last_child is prev


def test_tree_integrity_under_fuzz():
    import random

    from go_readability_spark.dom.builder import parse_html

    tags = ["p", "div", "b", "i", "a", "em", "table", "tr", "td", "th",
            "ul", "li", "select", "option", "marquee", "nobr", "span",
            "object", "caption", "col", "colgroup", "form", "input",
            "tbody", "thead", "template", "hr", "button"]
    for trial in range(800):
        rng = random.Random(77_000 + trial)
        parts = []
        for _ in range(rng.randint(2, 28)):
            r = rng.random()
            if r < 0.4:
                parts.append(f"<{rng.choice(tags)}>")
            elif r < 0.75:
                parts.append(f"</{rng.choice(tags)}>")
            else:
                parts.append(rng.choice(["x", " ", "a b", "1"]))
        doc = parse_html("".join(parts))
        _check_tree_integrity(doc)


def test_hidden_input_stays_inside_table():
    """Spec 'in table' special case: type=hidden inputs are inserted
    inside the table; any other input foster-parents like other content."""
    assert body_of('<table><input type=hidden name=x><tr><td>a</td></tr></table>') == (
        '<table><input type="hidden" name="x"/><tbody><tr><td>a</td></tr></tbody></table>'
    )
    assert body_of('<table><input type=text><tr><td>a</td></tr></table>') == (
        '<input type="text"/><table><tbody><tr><td>a</td></tr></tbody></table>'
    )


def test_caption_and_colgroup_structure():
    assert body_of('<table><caption>cap<td>x</td></table>') == (
        '<table><caption>cap</caption><tbody><tr><td>x</td></tr></tbody></table>'
    )
    # <col> implies a shared <colgroup>
    assert body_of('<table><col span=2><col><tr><td>x</td></tr></table>') == (
        '<table><colgroup><col span="2"/><col/></colgroup>'
        '<tbody><tr><td>x</td></tr></tbody></table>'
    )
    # a caption inside a cell closes the cell; the next td starts a new row
    assert body_of('<table><tr><td>a<caption>c</caption><td>b</table>') == (
        '<table><tbody><tr><td>a</td></tr></tbody><caption>c</caption>'
        '<tbody><tr><td>b</td></tr></tbody></table>'
    )


def test_frameset_replaces_empty_body():
    """Frameset pages parse like x/net/html: NO body element (so
    extraction yields empty content, as the reference does), nested
    framesets and noframes rawtext intact, metadata still available."""
    from go_readability_spark.dom import body_element
    from go_readability_spark.dom.builder import parse_html
    from go_readability_spark.dom.serialize import render

    src = (
        "<html><head><title>F</title></head><frameset cols='50%,50%'>"
        "<frame src=a.html><frameset rows='1,2'><frame src=b.html></frameset>"
        "<noframes><p>no frames</p></noframes></frameset></html>"
    )
    doc = parse_html(src)
    assert body_element(doc) is None
    out = render(doc)
    assert '<frameset cols="50%,50%"><frame src="a.html"/>' in out
    assert "<noframes><p>no frames</p></noframes>" in out
    from go_readability_spark.readability.parser import Parser

    art = Parser().parse(src, page_url="http://x/f.html")
    assert art.title == "F" and art.content == "" and art.text_content == ""


def test_frameset_ignored_when_body_has_content():
    assert body_of("<p>real</p><frameset><frame></frameset>") == "<p>real</p>"


def test_foreign_breakout():
    """HTML start tags inside foreign content break out (pop the foreign
    run) — an unclosed <svg> icon must not swallow the page."""
    assert body_of("<svg><circle/><p>text</p>") == (
        "<svg><circle></circle></svg><p>text</p>"
    )
    # non-breakout tags stay foreign
    assert body_of("<svg><circle><line></svg>t") == (
        "<svg><circle><line></line></circle></svg>t"
    )
    # font breaks out only with color/face/size
    assert body_of("<svg><font>f</svg>x") == "<svg><font>f</font></svg>x"
    assert body_of("<svg><font color=red>f</font>x") == (
        '<svg></svg><font color="red">f</font>x'
    )


def test_foreign_integration_points():
    """svg foreignObject/desc/title and MathML text elements parse their
    children as HTML."""
    assert body_of(
        "<svg><foreignObject><p>html here</p></foreignObject><circle/></svg>after"
    ) == (
        "<svg><foreignObject><p>html here</p></foreignObject>"
        "<circle></circle></svg>after"
    )
    assert body_of("<math><mi><b>bold</b></mi></math>done") == (
        "<math><mi><b>bold</b></mi></math>done"
    )


def test_select_in_table_end_tags_close_select():
    """WHATWG 'in select in table': table-structure END tags close the
    select and reprocess (r2 ADVICE — the start-tag side already did).
    x/net/html: </table> closes both the select and the table."""
    assert body_of("<table><tr><td><select></table><p>hi") == (
        "<table><tbody><tr><td><select></select></td></tr></tbody></table>"
        "<p>hi</p>"
    )
    # </td> closes the select, then the cell; following cell is a sibling
    assert body_of("<table><tr><td><select>a</td><td>b</td></tr></table>") == (
        "<table><tbody><tr><td><select>a</select></td><td>b</td></tr>"
        "</tbody></table>"
    )
    # NOT in a table: table end tags stay ignored in select
    assert body_of("<select><option>x</table>y") == (
        "<select><option>xy</option></select>"
    )
