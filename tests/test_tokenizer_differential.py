"""Differential guard for the r3 tokenizer fast paths: the one-shot feed
loop, _FULL_TAG single-regex start-tag parse, and the fast end-tag path
must produce byte-identical trees to the stdlib-scanner route they
replaced. The slow route is recovered by (a) restoring HTMLParser.feed
(stdlib goahead) and (b) never-matching fast-path regexes, leaving only
the original tolerant scanners."""

import re
from html.parser import HTMLParser

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import go_readability_spark.dom.builder as B
from go_readability_spark.dom import outer_html, parse_html

_NEVER = re.compile(r"(?!x)x")


def _parse_slow(source):
    class SlowBuilder(B._TreeBuilder):
        feed = HTMLParser.feed

    saved = (B._FULL_TAG, B._FAST_ENDTAG)
    B._FULL_TAG = B._FAST_ENDTAG = _NEVER
    orig_builder = B._TreeBuilder
    try:
        B._TreeBuilder = SlowBuilder
        return B.parse_html(source)
    finally:
        B._TreeBuilder = orig_builder
        B._FULL_TAG, B._FAST_ENDTAG = saved


NASTY = [
    "<div class=a id='b'>x</div>",
    "<div  a = 1  b=\"2\" >t</div>",
    "<img src=x/>",
    "<img src=x//>",
    "<a href=x/ >t</a>",
    "<div a==b>t</div>",
    "<div a=>t</div>",
    "<div a>t</div>",
    "<div =oops a=1>t</div>",
    "<div a='1'b=2>t</div>",
    "<div a=don\"t>q</div>",
    "<br/><br />< notatag>",
    "<p>a<b>b<i>c</b>d</i>e",
    "<script>var a = '</div>';</script><p>after",
    "<script src=x/>swallowed</script><p>ok",
    "<SCRIPT>x</SCRIPT><P>Y",
    "<style>p { color: red }</style><p>z",
    "<textarea>\n<b>not bold</textarea>",
    "<title>t < u</title><p>v",
    "<div a=\"multi\nline\">t</div>",
    "<!-- comment --><!doctype html><p>x",
    "</ p>text</p>",
    "</>x",
    "<p attr='&amp;&lt;&notit;&notin;'>e</p>",
    "<p>&amp; &notit; &notin; &#65; &#x41;</p>",
    "<table><tr><td>a<td>b</table>",
    "<table><div>foster</div><tr><td>x</table>",
    "<select><option>a<option>b</select>",
    "<table><tr><td><select></table><p>hi",
    "<svg><circle r=1/><foreignObject><p>h</p></foreignObject></svg>t",
    "<math><mi>x</mi></math>y",
    "<ul><li>a<li>b</ul>",
    "<p><plaintext>everything<after>",
    "<div" + " a=1" * 40 + ">deep</div>",
    "<p>unterminated <b attr='x",
    "<p><!--unterminated comment",
    "<p>trailing text no tags",
    "<p>entity at end &am",
    "<p a='\x01control'>c</p>",
    "<噂>unicode tag</噂>",
    "<p weird>nbsp-after-name</p>",
    "<frameset><frame src=a><noframes>x</noframes></frameset>",
    "<xmp><p>raw</p></xmp>done",
]


@pytest.mark.parametrize("case", NASTY)
def test_fixed_nasty_cases_identical(case):
    assert outer_html(parse_html(case)) == outer_html(_parse_slow(case)), case


def test_reference_corpus_identical():
    """Every reference fixture parses to the identical serialized tree
    through both tokenizer routes."""
    import os

    TP = "/root/reference/test-pages"
    if not os.path.isdir(TP):
        pytest.skip("reference corpus not present")
    for case in sorted(os.listdir(TP)):
        src_path = os.path.join(TP, case, "source.html")
        if not os.path.isfile(src_path):
            continue
        raw = open(src_path, "rb").read()
        assert outer_html(parse_html(raw)) == outer_html(_parse_slow(raw)), case


_tagish = st.sampled_from(
    ["<div", "<p", "<a href=", "<b", "</div>", "</p>", "/>", ">", "'", '"',
     "=", " ", "x", "&amp;", "&", "<!--", "-->", "<script>", "</script>",
     "<td", "<table>", "foo bar", "<img src=a b=c", "\n", "<", "</"]
)


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_tagish, max_size=30))
def test_fuzz_token_soup_identical(parts):
    soup = "".join(parts)
    assert outer_html(parse_html(soup)) == outer_html(_parse_slow(soup))


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.text(alphabet="<>/=ab '\"&;!-\n\t", max_size=120))
def test_fuzz_markup_chars_identical(s):
    assert outer_html(parse_html(s)) == outer_html(_parse_slow(s))
