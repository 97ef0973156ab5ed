"""Differential fuzz of the CDX leg: the column-expression SURT key and
the newest-good-capture selection are compared against independent
pure-Python references over seeded-random messy URLs and capture sets.
All inputs travel in one DataFrame per case — two Spark actions total."""

import random
from urllib.parse import urlsplit

from pyspark.sql import functions as F

from go_readability_spark.sources import cdx_fetch_plan, surt_key


def _ref_surt(url):
    """Independent SURT twin (module docstring of sources/cdx.py):
    urlsplit-based, vs the engine's regex implementation."""
    parts = urlsplit(url.strip())
    host = (parts.hostname or "").lower()
    if host.startswith("www."):
        host = host[4:]
    rev = ",".join(reversed(host.split(".")))
    path = (parts.path or "/").lower() or "/"
    q = "&".join(sorted(p for p in parts.query.lower().split("&") if p))
    return rev + ")" + path + (("?" + q) if q else "")


def _rand_url(rng):
    scheme = rng.choice(["http", "https"])
    host = rng.choice([
        "Docs.Example.org", "WWW.example.COM", "a.b.c.example.net",
        "example.org",
    ])
    port = rng.choice(["", ":443", ":8080", ""])
    userinfo = "user:p@" if rng.random() < 0.15 else ""
    segs = rng.randint(0, 3)
    path = "".join(f"/S{rng.randint(0, 9)}x" for _ in range(segs))
    params = [f"{k}={rng.randint(0, 9)}"
              for k in rng.sample(["b", "a", "utm_source", "z"],
                                  rng.randint(0, 3))]
    q = ("?" + "&".join(params)) if params else ""
    frag = "#Frag" if rng.random() < 0.3 else ""
    return f"{scheme}://{userinfo}{host}{port}{path}{q}{frag}"


def test_differential_surt_random_urls(spark):
    rng = random.Random(20260817)
    urls = list({_rand_url(rng) for _ in range(400)})
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r.url: r.k
           for r in df.select("url", surt_key(F.col("url")).alias("k"))
           .collect()}
    for u in urls:
        assert got[u] == _ref_surt(u), u


def _ref_plan(captures, mime="text/html", status=200):
    """Pure-Python newest-good selection with the engine's tiebreak:
    per urlkey, max by (ts, then MIN url/filename/offset) — i.e. newest
    ts wins; equal ts resolves by ascending (url, filename, offset)."""
    best = {}
    for cap in captures:
        if cap["status"] != status or cap["mime"] != mime:
            continue
        k = cap["urlkey"]
        # row_number orders by ts DESC, url ASC, filename ASC, offset ASC
        key = (cap["ts"], )
        inv = (cap["url"], cap["filename"], cap["offset"])
        cur = best.get(k)
        if cur is None or (cap["ts"], ) > (cur["ts"], ) or (
                cap["ts"] == cur["ts"]
                and inv < (cur["url"], cur["filename"], cur["offset"])):
            best[k] = cap
    return best


def test_differential_fetch_plan_selection(spark):
    rng = random.Random(7)
    captures = []
    for j in range(150):
        k = f"org,example)/k{j % 60}"  # keys with 1-5 captures each
        captures.append({
            "urlkey": k,
            "ts": f"2024{rng.randint(1, 12):02d}01{rng.randint(0, 23):02d}0000",
            "url": f"https://example.org/k{j % 60}",
            "mime": rng.choice(["text/html", "text/html", "application/pdf"]),
            "status": rng.choice([200, 200, 200, 404, 301]),
            "digest": f"sha1:{j}",
            "length": rng.randint(100, 9999),
            "offset": rng.randint(0, 10**6),
            "filename": f"c{rng.randint(0, 3)}.warc.gz",
        })
    df = spark.createDataFrame(
        [(c["urlkey"], c["ts"], c["url"], c["mime"], c["status"],
          c["digest"], c["length"], c["offset"], c["filename"])
         for c in captures],
        "urlkey string, ts string, url string, mime string, status int, "
        "digest string, length long, offset long, filename string",
    )
    got = {r.urlkey: (r.ts, r.digest) for r in cdx_fetch_plan(df).collect()}
    exp = {k: (c["ts"], c["digest"]) for k, c in _ref_plan(captures).items()}
    assert got == exp
