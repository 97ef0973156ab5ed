"""Deterministic synthetic Common-Crawl-style corpus for the scale/skew
tier (FIXTURES.md §1 'skew knobs'): seeded generator, host concentration,
size tail, tiny-doc flood. Also synthesizes a `pages` table from the
driver-provided `documents` parquet so benches need no external data."""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta

_HTML_SHELL = """<!DOCTYPE html>
<html lang="{lang}">
<head>
<title>{title} | {site} | News</title>
<meta property="og:title" content="{title}"/>
<meta property="og:site_name" content="{site}"/>
<meta property="og:description" content="{excerpt}"/>
<meta property="article:published_time" content="{published}"/>
<meta name="author" content="{author}"/>
<link rel="icon" type="image/png" href="/favicon-32x32.png" sizes="32x32"/>
</head>
<body>
<div id="header" class="site-header"><a href="/">{site}</a><ul class="menu">
<li><a href="/news">News</a></li><li><a href="/sports">Sports</a></li></ul></div>
<div class="sidebar widget"><ul>{sidebar}</ul></div>
<div id="main" class="article-content">
<h1>{title}</h1>
<div class="byline">by {author}</div>
{paragraphs}
</div>
<div class="footer comments"><p>comments and junk</p><div class="share">share buttons</div></div>
</body>
</html>"""

_WORDS = (
    "spark shuffle partition executor arrow batch schema catalyst codegen "
    "broadcast skew salt bucket lineage checkpoint parquet iceberg scan "
    "filter project aggregate join window stream watermark state token "
    "document corpus crawl extract readability candidate score density"
).split()

# interleaved so language-ID and stopword-ratio features behave like real
# English prose on the synthetic corpus
_STOPWORDS = "the and of to in is it for on with that was".split()


def _rng_for(seed: int, key: str) -> random.Random:
    h = hashlib.sha256(f"{seed}:{key}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


_N_WORDS = len(_WORDS)
_K_WORDS = _N_WORDS.bit_length()
_N_STOP = len(_STOPWORDS)
_K_STOP = _N_STOP.bit_length()


def synth_page(seed: int, idx: int, host: str, n_paragraphs: int) -> dict:
    rng = _rng_for(seed, f"page:{idx}")
    # Inlined random.Random.choice (r7): `seq[rng._randbelow(len(seq))]`
    # with _randbelow_with_getrandbits unrolled against the fixed word
    # lists.  getrandbits is drawn in the IDENTICAL pattern (k = seq
    # length's bit_length, redraw while r >= n), so the random stream —
    # and therefore every generated page — is byte-identical to the
    # rng.choice spelling (locked by tests/test_spark_pipeline.py's
    # corpus goldens and the synth-equivalence test).  The two dropped
    # Python call layers were ~60% of corpus-generation CPU.
    grb = rng.getrandbits
    words_ = _WORDS
    stop_ = _STOPWORDS

    def _cw():
        r = grb(_K_WORDS)
        while r >= _N_WORDS:
            r = grb(_K_WORDS)
        return words_[r]

    def _cs():
        r = grb(_K_STOP)
        while r >= _N_STOP:
            r = grb(_K_STOP)
        return stop_[r]

    title = " ".join(_cw() for _ in range(6)).title()
    author = f"{_cw().title()} {_cw().title()}"
    paragraphs = []
    for p in range(n_paragraphs):
        n = rng.randint(40, 120)
        words = [_cs() if i % 3 == 1 else _cw() for i in range(n)]
        # commas matter to the scorer — sprinkle deterministically
        text = " ".join(words)
        text = text.replace(" ", ", ", 3) if p % 2 == 0 else text
        paragraphs.append(f"<p>{text}.</p>")
    sidebar = "".join(f"<li><a href='/t/{w}'>{w}</a></li>" for w in _WORDS[:12])
    published = (datetime(2024, 1, 1) + timedelta(hours=idx % 8760)).isoformat()
    url = f"https://{host}/{seed}/{idx}/{title.split()[0].lower()}.html"
    html = _HTML_SHELL.format(
        lang="en", title=title, site=host.split(".")[0].title(),
        excerpt=" ".join(rng.choice(_WORDS) for _ in range(12)),
        published=published, author=author, sidebar=sidebar,
        paragraphs="\n".join(paragraphs),
    )
    return {
        "url": url,
        "warc_ts": datetime(2025, 1, 1) + timedelta(seconds=idx),
        "html": html.encode("utf-8"),
        "text": None,
        "lang": "en",
    }


def synth_corpus_rows(n_docs: int, seed: int = 42, skew: bool = True):
    """Deterministic corpus with Common-Crawl-ish skew: ~30% of rows on one
    host, a long size tail, and a tiny-doc flood."""
    hosts = [f"site{i}.example.org" for i in range(32)]
    rows = []
    for idx in range(n_docs):
        rng = _rng_for(seed, f"dist:{idx}")
        if skew and rng.random() < 0.30:
            host = "megahost.example.org"  # host concentration
        else:
            host = hosts[rng.randrange(len(hosts))]
        r = rng.random()
        if skew and r < 0.10:
            n_paragraphs = 2  # tiny-doc flood
        elif skew and r > 0.97:
            n_paragraphs = rng.randint(150, 400)  # size tail
        else:
            n_paragraphs = rng.randint(8, 40)
        rows.append(synth_page(seed, idx, host, n_paragraphs))
    return rows


def synth_pages_dataframe(spark, n_docs: int, seed: int = 42, skew: bool = True):
    """Driver-side corpus (fine for tests); for sized corpora use
    synth_pages_distributed, which also controls partitioning."""
    from ..plans.schema import PAGES_SCHEMA

    rows = synth_corpus_rows(n_docs, seed=seed, skew=skew)
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)


def synth_pages_distributed(spark, n_docs: int, seed: int = 42, skew: bool = True,
                            num_partitions: int = 32,
                            size_scale: float = 1.0):
    """Generate the synthetic corpus ON THE EXECUTORS (mapInPandas over an
    index range) so bench corpora of arbitrary size never bottleneck on the
    driver. Fully deterministic given (seed, n_docs).

    ``size_scale`` multiplies the per-page paragraph count (floor 2) —
    used by the 10M volume run, where the full-size mix exceeds this
    sandbox's disk (input + shuffle + output). The default 1.0 takes the
    exact integer path, so existing corpora are byte-identical."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..plans.schema import PAGES_SCHEMA

    hosts = [f"site{i}.example.org" for i in range(32)]

    def gen(batches):
        for pdf in batches:
            rows = []
            for idx in pdf["id"]:
                idx = int(idx)
                rng = _rng_for(seed, f"dist:{idx}")
                if skew and rng.random() < 0.30:
                    host = "megahost.example.org"
                else:
                    host = hosts[rng.randrange(len(hosts))]
                r = rng.random()
                if skew and r < 0.10:
                    n_paragraphs = 2
                elif skew and r > 0.97:
                    n_paragraphs = rng.randint(150, 400)
                else:
                    n_paragraphs = rng.randint(8, 40)
                if size_scale != 1.0:
                    n_paragraphs = max(2, int(n_paragraphs * size_scale))
                rows.append(synth_page(seed, idx, host, n_paragraphs))
            yield pd.DataFrame(rows)

    idx_df = spark.range(0, n_docs, 1, num_partitions)
    return idx_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def pages_from_documents_linked(spark, sf_dir: str):
    """pages_from_documents variant with a deterministic PLANTED anchor
    block, used by the link-graph driver queries: the DuckDB oracle
    recomputes the planted edges arithmetically from `documents`, so the
    hash compare verifies that extraction + resolution recovered exactly
    the ground truth (kept: absolute, quoted-single, root-relative,
    protocol-relative, same-dir relative; dropped: fragment, javascript:,
    mailto:).  Kept separate from pages_from_documents so the pinned
    extract_articles goldens stay byte-stable."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id").cast("long")
    i_s = i.cast("string")
    src_host = F.concat(F.lit("host"), (i % 5).cast("string"),
                        F.lit(".example.org"))
    url = F.concat(F.lit("https://"), src_host, F.lit("/docs/"), i_s,
                   F.lit(".html"))
    anchors = F.concat(
        F.lit('<p>links: <a href="https://host'), ((i + 1) % 5).cast("string"),
        F.lit(".example.org/docs/"), (i + 1).cast("string"),
        F.lit('.html">next</a> <a href=\'https://docs.example.org/'), i_s,
        F.lit('.html\'>canon</a> <a href="/rel/'), (i * 2).cast("string"),
        F.lit('.html">rel</a> <a href="//cdn.example.net/a'),
        (i % 3).cast("string"),
        F.lit('.html">cdn</a> <a href="p'), (i + 3).cast("string"),
        F.lit('.html">sib</a> <a href="#top">top</a>'),
        F.lit('<a href="javascript:void(0)">js</a>'),
        F.lit('<a href="mailto:x@example.org">mail</a></p>'),
    )
    html = F.concat(
        F.lit("<html><body><h1>Doc "), i_s, F.lit("</h1><p>"),
        F.col("text"), F.lit("</p>"), anchors, F.lit("</body></html>"),
    )
    return docs.select(
        url.alias("url"),
        F.to_timestamp(F.lit("2025-01-01")).alias("warc_ts"),
        html.cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def pages_from_documents(spark, sf_dir: str):
    """Wrap the driver-provided `documents` table text into the `pages`
    shape deterministically (BASELINE 'input_hint': synthesize the input
    table at small scale; no external data)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    html = F.concat(
        F.lit("<html><head><title>doc "), F.col("doc_id").cast("string"),
        F.lit(" | "), F.coalesce(F.col("source"), F.lit("src")),
        F.lit('</title></head><body><div class="article-content"><h1>Document '),
        F.col("doc_id").cast("string"), F.lit("</h1><p>"),
        F.regexp_replace(F.col("text"), F.lit("\\. "), F.lit(".</p><p>")),
        F.lit("</p></div></body></html>"),
    )
    return docs.select(
        F.concat(F.lit("https://docs.example.org/"), F.col("doc_id").cast("string"),
                 F.lit(".html")).alias("url"),
        F.to_timestamp(F.lit("2025-01-01")).alias("warc_ts"),
        html.cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def robots_for_hosts(spark, n_hosts: int = 5):
    """(host, robots_txt) — a deterministic PLANTED robots.txt per
    host{h}.example.org (the hosts pages_from_documents_linked emits),
    exercising the full RFC 9309 grammar the parser supports: comments,
    blank lines, a `*` group with wildcard + `$`-anchored rules, a
    multi-User-agent specific group, an empty Disallow, an unknown field
    (Crawl-delay) and a Sitemap line.  Driver oracles recompute the
    expected verdicts arithmetically from doc_id (closed form — see
    __spark_entry__._robots_gate_sql), so a hash match proves the
    relational parse + longest-match gate recovered the planted policy."""
    from pyspark.sql import functions as F

    h = F.col("id").cast("string")
    txt = F.concat(
        F.lit("# planted policy for host"), h, F.lit("\n"),
        F.lit("User-agent: *\n"),
        F.lit("Disallow: /rel/\n"),
        F.lit("Allow: /\n"),
        F.lit("Crawl-delay: 10\n"),
        F.lit("Disallow: /docs/*7.html$\n"),
        F.lit("\n"),
        F.lit("User-agent: graftbot\n"),
        F.lit("User-agent: otherbot\n"),
        F.lit("Disallow: /docs/\n"),
        F.lit("Allow: /docs/"), h, F.lit("\n"),
        F.lit("Disallow:\n"),
        F.lit("Sitemap: https://host"), h, F.lit(".example.org/sitemap.xml\n"),
    )
    return spark.range(n_hosts).select(
        F.concat(F.lit("host"), h, F.lit(".example.org")).alias("host"),
        txt.alias("robots_txt"),
    )


def cdxj_from_documents(spark, sf_dir: str):
    """(line) — two PLANTED CDXJ capture lines per document: an older
    always-good capture and a newer one that is good HTML only when
    doc_id % 3 == 0 (else a 404 or a PDF).  The urlkey is computed by
    sources/cdx.py surt_key over a deliberately messy url (upper-case
    www host, default port, unsorted query), so the driver oracle's
    closed-form urlkey verifies SURT + parse + selection end-to-end
    (see __spark_entry__ `cdx_fetch_plan`)."""
    from pyspark.sql import functions as F

    from .cdx import surt_key

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id").cast("long")
    i_s = i.cast("string")
    url = F.concat(F.lit("https://WWW.Docs.Example.org:443/"), i_s,
                   F.lit(".html?b=2&a=1"))
    key = surt_key(url)

    def line(ts, status, mime, digest, length, offset, filename):
        return F.concat(
            key, F.lit(" "), ts,
            F.lit(' {"url": "'), url,
            F.lit('", "mime": "'), mime,
            F.lit('", "status": "'), status,
            F.lit('", "digest": "'), digest,
            F.lit('", "length": "'), length.cast("string"),
            F.lit('", "offset": "'), offset.cast("string"),
            F.lit('", "filename": "'), filename, F.lit('"}'),
        )

    old = docs.select(line(
        (F.lit(20250101000000) + i).cast("string"),
        F.lit("200"), F.lit("text/html"),
        F.concat(F.lit("sha1:A"), i_s),
        F.lit(900) + i % 100, i * 1000,
        F.concat(F.lit("crawl-0"), (i % 4).cast("string"), F.lit(".warc.gz")),
    ).alias("line"))
    new = docs.select(line(
        (F.lit(20250201000000) + i).cast("string"),
        F.when(i % 3 == 1, "404").otherwise("200"),
        F.when(i % 3 == 2, "application/pdf").otherwise("text/html"),
        F.concat(F.lit("sha1:B"), i_s),
        F.lit(400) + i % 50, i * 1000 + 500,
        F.concat(F.lit("crawl-0"), ((i + 1) % 4).cast("string"),
                 F.lit(".warc.gz")),
    ).alias("line"))
    return old.unionByName(new)


def sitemaps_for_hosts(spark, sf_dir: str):
    """(host, sitemap_xml) — one PLANTED urlset per host{h}.example.org
    containing a <url> entry for every doc with doc_id % 5 == h:
    loc with an &amp; entity, lastmod, changefreq cycling the 7 spec
    values, priority 0.{d}.  Odd hosts use a namespace prefix (<sm:url>)
    to exercise prefix handling.  The driver oracle recomputes every
    field as a closed form in doc_id (see __spark_entry__
    `sitemap_entries`), so a hash match proves element extraction,
    entity unescaping, and field picking."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id").cast("long")
    i_s = i.cast("string")
    h = (i % 5).cast("string")
    pfx = F.when(i % 5 % 2 == 1, "sm:").otherwise("")
    cf = F.element_at(
        F.array(*[F.lit(x) for x in (
            "always", "hourly", "daily", "weekly", "monthly", "yearly",
            "never")]),
        (i % 7 + 1).cast("int"),
    )

    def tag(name, body):
        return F.concat(F.lit("<"), pfx, F.lit(name), F.lit(">"), body,
                        F.lit("</"), pfx, F.lit(name), F.lit(">"))

    entry = tag("url", F.concat(
        tag("loc", F.concat(
            F.lit("https://host"), h, F.lit(".example.org/docs/"), i_s,
            F.lit(".html?a=1&amp;b=2"))),
        tag("lastmod", F.concat(
            F.lit("2025-01-"), F.lpad((i % 28 + 1).cast("string"), 2, "0"))),
        tag("changefreq", cf),
        tag("priority", F.concat(F.lit("0."), (i % 10).cast("string"))),
    ))
    per_host = (
        docs.select(
            F.concat(F.lit("host"), h, F.lit(".example.org")).alias("host"),
            F.struct(i.alias("i"), entry.alias("e")).alias("se"),
        )
        .groupBy("host")
        .agg(F.array_sort(F.collect_list("se")).alias("ses"))
    )
    xml = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>\n'
              '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'),
        F.array_join(F.transform("ses", lambda s: s["e"]), "\n"),
        F.lit("\n</urlset>"),
    )
    return per_host.select("host", xml.alias("sitemap_xml"))


def warc_archives_from_documents(spark, sf_dir: str, out_dir: str,
                                 n_archives: int = 4) -> str:
    """Write REAL .warc.gz archives + a CDXJ index with REAL byte offsets
    for the `documents` table, deterministically (BASELINE input_hint: no
    external data — synthesize at small scale).  Archive j holds docs
    with doc_id % n_archives == j in doc_id order, one gzip member per
    record (the Common Crawl layout), and every index line's
    offset/length is measured while writing — so a ranged fetch of the
    plan (sources/warc.py pages_from_fetch_plan) must reproduce the
    whole-archive read byte-for-byte.

    Driver-side generation is test scaffolding (500 docs at contract
    scale), NOT the fetch path — the ranged reader itself is a
    distributed mapInPandas.  Idempotent: generation goes to a tmp dir
    that is atomically renamed into place, so concurrent callers race
    safely and an existing out_dir is reused as-is.  Returns out_dir."""
    import gzip
    import os
    import shutil
    import tempfile
    from datetime import datetime

    from .warc import write_warc

    done = os.path.join(out_dir, "index.cdxj")
    if os.path.exists(done):
        return out_dir
    docs = sorted(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").collect(),
        key=lambda r: int(r.doc_id),
    )
    tmp = tempfile.mkdtemp(prefix="grs_warc_gen_",
                           dir=os.path.dirname(out_dir) or ".")
    try:
        offsets = {}
        handles = {}
        lines = []
        ts = datetime(2025, 1, 1)
        for r in docs:
            i = int(r.doc_id)
            fname = f"crawl-{i % n_archives:02d}.warc.gz"
            if fname not in handles:
                handles[fname] = open(os.path.join(tmp, fname), "wb")
                offsets[fname] = 0
            url = f"https://docs.example.org/{i}.html"
            html = (f"<html><body><h1>Doc {i}</h1><p>{r.text}</p>"
                    f"</body></html>").encode()
            member = write_warc([(url, ts, html)], gz=True)
            off = offsets[fname]
            handles[fname].write(member)
            offsets[fname] = off + len(member)
            lines.append(
                f'org,example,docs)/{i}.html 20250101000000 '
                f'{{"url": "{url}", "mime": "text/html", "status": "200", '
                f'"digest": "sha1:{i}", "length": "{len(member)}", '
                f'"offset": "{off}", "filename": "{fname}"}}'
            )
        for fh in handles.values():
            fh.close()
        with open(os.path.join(tmp, "index.cdxj"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
        try:
            os.rename(tmp, out_dir)
        except OSError:
            # usually a concurrent winner already renamed — but verify
            # before discarding: out_dir could also pre-exist WITHOUT an
            # index (created externally or by a non-atomic path), and
            # silently returning it would fail every downstream read
            if not os.path.exists(os.path.join(out_dir, "index.cdxj")):
                shutil.rmtree(tmp, ignore_errors=True)
                raise RuntimeError(
                    f"{out_dir} exists but has no index.cdxj — not a "
                    f"completed archive dir; remove it and retry")
            shutil.rmtree(tmp)  # concurrent winner confirmed
    finally:
        if os.path.isdir(tmp) and not os.path.exists(done):
            shutil.rmtree(tmp, ignore_errors=True)
    return out_dir
