"""Link-graph operator tests: href grammar + resolution cases, host graph
aggregation, PageRank vs a pure-Python reference, plan shape (pure
codegen — no Python UDFs anywhere in the hot path)."""

import pytest
from pyspark.sql import functions as F

from go_readability_spark.operators import (
    extract_links,
    host_graph,
    host_rank,
    link_edges,
    resolve_links,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_extract_links_grammar(spark):
    html = (
        '<p><a href="https://a.example/x">d</a>'
        "<A CLASS='k' HREF='https://b.example/y'>single+caps</A>"
        '<a data-x="1" href = "z.html">spaced eq</a>'
        "<a href=bare.html>unquoted skipped</a>"
        '<a name="no-href">skipped</a></p>'
    )
    out = extract_links(_pages(spark, [("https://s.example/d/p.html", html)]))
    hrefs = [r["href"] for r in out.collect()]
    assert hrefs == ["https://a.example/x", "https://b.example/y", "z.html"]


@pytest.mark.parametrize(
    "href,expect",
    [
        ("https://other.example/a", "https://other.example/a"),
        ("http://other.example/a", "http://other.example/a"),
        ("//cdn.example/lib.js.html", "https://cdn.example/lib.js.html"),
        ("/root.html", "https://s.example/root.html"),
        ("sib.html", "https://s.example/dir/sib.html"),
        ("./sib2.html", "https://s.example/dir/sib2.html"),
        ("#frag", None),
        ("", None),
        ("javascript:void(0)", None),
        ("mailto:x@example.org", None),
        ("data:text/plain,hi", None),
        ("tel:+1555", None),
        ("ftp://files.example/a", None),  # non-http scheme dropped
    ],
)
def test_resolve_cases(spark, href, expect):
    edges = spark.createDataFrame(
        [("https://s.example/dir/page.html?q=1#top", href)], "src string, href string"
    )
    got = [r["dst"] for r in resolve_links(edges).collect()]
    assert got == ([expect] if expect else [])


@pytest.mark.parametrize(
    "src,href,expect",
    [
        # path-less homepage src: same-dir href resolves against
        # authority + "/" (not against the host-eaten "https://")
        ("https://example.org", "page.html", "https://example.org/page.html"),
        ("https://example.org?q=1", "page.html",
         "https://example.org/page.html"),
        ("https://example.org#top", "./p.html", "https://example.org/p.html"),
        ("https://example.org/", "page.html", "https://example.org/page.html"),
    ],
)
def test_resolve_pathless_src(spark, src, href, expect):
    edges = spark.createDataFrame([(src, href)], "src string, href string")
    row = resolve_links(edges).collect()[0]
    assert row["dst"] == expect
    assert row["dst_host"] == "example.org"  # no phantom 'page.html' host


def test_resolve_hosts_strip_userinfo_port(spark):
    edges = spark.createDataFrame(
        [("https://u:p@s.example:8443/d/p", "https://o.example:80/x")],
        "src string, href string",
    )
    row = resolve_links(edges).collect()[0]
    assert row["src_host"] == "s.example"
    assert row["dst_host"] == "o.example"


def test_host_graph_counts_and_self_loops(spark):
    edges = spark.createDataFrame(
        [
            ("a.ex", "b.ex"),
            ("a.ex", "b.ex"),
            ("a.ex", "a.ex"),  # self loop
            ("b.ex", "a.ex"),
        ],
        "src_host string, dst_host string",
    ).select(F.lit("s").alias("src"), F.lit("d").alias("dst"), "src_host", "dst_host")
    g = {(r["src_host"], r["dst_host"]): r["n_links"] for r in host_graph(edges).collect()}
    assert g == {("a.ex", "b.ex"): 2, ("b.ex", "a.ex"): 1}
    g2 = host_graph(edges, keep_self_loops=True)
    assert g2.where("src_host = dst_host").count() == 1


def _py_rank(counts, iters, d=0.85):
    hosts, outw = set(), {}
    for (s, t), n in counts.items():
        hosts.update((s, t))
        outw[s] = outw.get(s, 0) + n
    rank = {h: 1.0 for h in hosts}
    for _ in range(iters):
        incoming = {h: 0.0 for h in hosts}
        for (s, t), n in counts.items():
            incoming[t] += rank[s] * (n / outw[s])
        rank = {h: (1.0 - d) + d * incoming[h] for h in hosts}
    return rank


@pytest.mark.parametrize("iters", [1, 5])
def test_host_rank_matches_python_reference(spark, iters):
    counts = {
        ("a.ex", "b.ex"): 3,
        ("a.ex", "c.ex"): 1,
        ("b.ex", "c.ex"): 2,
        ("c.ex", "a.ex"): 1,
        ("d.ex", "a.ex"): 5,  # d.ex is dangling-in only via its outlink
    }
    g = spark.createDataFrame(
        [(s, t, n) for (s, t), n in counts.items()],
        "src_host string, dst_host string, n_links long",
    )
    got = {r["host"]: r["rank"] for r in host_rank(g, iterations=iters).collect()}
    want = _py_rank(counts, iters)
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(round(want[h], 6), abs=1e-6), h
    # dangling host keeps the (1-d) floor
    assert got["d.ex"] == pytest.approx(0.15, abs=1e-6)


def test_host_rank_checkpoint_path(spark):
    g = spark.createDataFrame(
        [("a.ex", "b.ex", 1), ("b.ex", "a.ex", 1)],
        "src_host string, dst_host string, n_links long",
    )
    plain = {r["host"]: r["rank"] for r in host_rank(g, iterations=4).collect()}
    ckpt = {
        r["host"]: r["rank"]
        for r in host_rank(g, iterations=4, checkpoint_every=2).collect()
    }
    assert plain == ckpt


def test_link_edges_plan_is_codegen(spark):
    """The page-scale stages (extract + resolve) must be pure JVM column
    work: no BatchEvalPython/ArrowEvalPython, scan prunes to url+html."""
    pages = _pages(spark, [("https://s.example/p", '<a href="/x">x</a>')])
    plan = link_edges(pages)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_extract_anchor_texts(spark):
    """Inner text rendered (tags stripped, whitespace collapsed),
    multi-line anchors handled, one row per anchor."""
    html = (
        '<p><a href="/a">plain</a>'
        '<a href="/b"><b>bold</b> and\n  spaced</a>'
        '<a href="/c"><img src="x.png"></a></p>'
    )
    pages = spark.createDataFrame(
        [("https://h.example.org/p", html)], "url string, html string"
    )
    from go_readability_spark.operators import extract_anchor_texts

    rows = {r.href: r.text for r in extract_anchor_texts(pages).collect()}
    assert rows == {"/a": "plain", "/b": "bold and spaced", "/c": ""}


def test_anchor_text_stats_cap_and_agg(spark):
    """Distinct texts sorted then capped; counts exact."""
    rows = [
        (f"https://h.example.org/{i}",
         f'<a href="/hot">t{i:02d}</a><a href="/hot">t00</a>')
        for i in range(5)
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    from go_readability_spark.operators import anchor_text_stats

    out = anchor_text_stats(pages, max_texts=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r.dst == "https://h.example.org/hot"
    assert r.n_anchors == 10 and r.n_srcs == 5
    assert r.texts == "t00|t01|t02"  # sorted, capped at 3


def test_anchor_stats_bounded_precap_mega_target(spark):
    """A mega-inlinked target with many distinct anchor texts: the
    two-phase pre-cap (_anchor_texts_topk) must (a) bound the rows per
    dst entering the final collect_set to text_subkeys * max_texts, and
    (b) leave the capped output IDENTICAL to the global sorted-distinct
    slice (the pre-cap is a lossless superset of the global top-k)."""
    from go_readability_spark.operators import anchor_text_stats
    from go_readability_spark.operators.linkgraph import (
        _anchor_texts_topk,
        extract_anchor_texts,
        resolve_links,
    )

    n_pages, per_page = 40, 25  # 1000 distinct texts at one target
    rows = [
        (f"https://s{i}.example.org/p",
         "".join(f'<a href="https://hot.example.org/">w{i * per_page + k:04d}</a>'
                 for k in range(per_page)))
        for i in range(n_pages)
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    max_texts, subkeys = 7, 4
    out = anchor_text_stats(pages, max_texts=max_texts,
                            text_subkeys=subkeys).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_anchors == n_pages * per_page and r.n_srcs == n_pages
    # ground truth: globally sorted distinct texts, first max_texts
    expect = "|".join(sorted(f"w{j:04d}" for j in range(n_pages * per_page))
                      [:max_texts])
    assert r.texts == expect
    # the pre-capped intermediate is bounded per dst
    resolved = resolve_links(extract_anchor_texts(pages), carry=("text",))
    topk = _anchor_texts_topk(resolved, max_texts, subkeys)
    per_dst = topk.groupBy("dst").count().collect()
    assert all(row["count"] <= subkeys * max_texts for row in per_dst)


def test_anchor_stats_planted_closed_form(spark):
    """anchor_text_stats over the planted pages equals the arithmetic
    ground truth (same closed form the driver oracle uses)."""
    from go_readability_spark.operators import anchor_text_stats
    from go_readability_spark.sources import pages_from_documents_linked

    pages = pages_from_documents_linked(spark, "/root/testdata/sf0.001")
    n = pages.count()
    got = {r.dst: r for r in anchor_text_stats(pages).collect()}
    # cdn targets aggregate across docs: n/3-ish inbound 'cdn' anchors
    for j in range(3):
        r = got[f"https://cdn.example.net/a{j}.html"]
        assert r.texts == "cdn" and r.n_anchors == r.n_srcs
        assert r.n_anchors == len([i for i in range(n) if i % 3 == j])
    # per-doc unique targets each carry exactly one text
    assert got["https://docs.example.org/0.html"].texts == "canon"
    assert got["https://host1.example.org/docs/1.html"].texts == "next"
    sib = got["https://host0.example.org/docs/p3.html"]
    assert sib.texts == "sib" and sib.n_anchors == 1


def test_base_href_resolution(spark):
    """<base href> redirects RELATIVE resolution (root-relative,
    same-dir, protocol-relative scheme) while absolute hrefs and pages
    without a base are untouched; only the FIRST base counts and
    non-absolute bases fall back to the page URL."""
    from go_readability_spark.operators import link_edges

    html_based = (
        '<head><base href="https://cdn.example.net/assets/v2/"></head>'
        '<base href="https://second.example.org/">'  # ignored: not first
        '<a href="/root.html">r</a>'
        '<a href="sib.html">s</a>'
        '<a href="//proto.example.io/x">p</a>'
        '<a href="https://abs.example.com/a">a</a>'
    )
    html_plain = '<a href="sib.html">s</a>'
    html_rel_base = '<base href="/not-absolute/"><a href="sib.html">s</a>'
    pages = spark.createDataFrame(
        [("https://host.example.org/dir/page.html", h)
         for h in (html_based, html_plain, html_rel_base)],
        "url string, html string")
    dsts = {}
    for r in link_edges(pages).collect():
        dsts.setdefault(r.src, set()).add(r.dst)
    # NOTE: all three pages share a url; group by html via dst sets
    all_dsts = set().union(*dsts.values())
    assert "https://cdn.example.net/root.html" in all_dsts          # root vs base
    assert "https://cdn.example.net/assets/v2/sib.html" in all_dsts  # dir vs base
    assert "https://proto.example.io/x" in all_dsts                  # base scheme
    assert "https://abs.example.com/a" in all_dsts                   # absolute
    # pages without an absolute base resolve against the page URL
    assert "https://host.example.org/dir/sib.html" in all_dsts
