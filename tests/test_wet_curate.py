"""WET-input curation: curate_corpus(extract=False) and
`curate --input-format wet` (plans/curate.py articles_from_texts).

Common Crawl ships the extracted text sidecar (WET) alongside WARC; a
user starting from WET must get the whole curation gate chain — quality,
language, Gopher, exact + near dedup, PII — without the extraction UDF
ever running. The host-rank gate is refused (WET carries no anchors).
"""

import subprocess
import sys
from datetime import datetime

import pytest


def _doc(i, words=120):
    return (f"Document number {i} opens with a readable sentence. "
            + f"It continues with plain factual prose about topic {i}. "
            * (words // 10))


def _docs_df(spark):
    rows = []
    for i in range(10):
        rows.append((f"https://w{i % 3}.example.org/d/{i}.html",
                     datetime(2024, 3, 1, 0, 0, i), _doc(i)))
    # exact duplicate of doc 0 under a different url: must collapse
    rows.append(("https://dup.example.org/copy.html",
                 datetime(2024, 3, 2), _doc(0)))
    # too short: gated by min_length
    rows.append(("https://short.example.org/s.html",
                 datetime(2024, 3, 2), "tiny."))
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string")


def test_curate_wet_library(spark):
    from go_readability_spark.plans.curate import (
        articles_from_texts,
        curate_corpus,
    )

    pre = articles_from_texts(_docs_df(spark))
    curated = curate_corpus(pre, extract=False, min_length=100,
                            min_quality=0.0, languages=("en", "und"),
                            num_partitions=4).cache()
    urls = [r.url for r in curated.select("url").collect()]
    assert len(urls) == len(set(urls))
    assert "https://short.example.org/s.html" not in urls
    # doc 0 + its duplicate collapsed to exactly one survivor
    survivors_of_0 = {u for u in urls
                      if u in ("https://w0.example.org/d/0.html",
                               "https://dup.example.org/copy.html")}
    assert len(survivors_of_0) == 1
    # WET carries no article metadata: title is NULL, text flows through
    row = curated.where(
        curated.url == "https://w1.example.org/d/1.html").collect()[0]
    assert row.title is None and row.text_content.startswith(
        "Document number 1")

    with pytest.raises(ValueError, match="WAT sidecar"):
        curate_corpus(pre, extract=False, host_rank_floor=0.5)


def _wat_dir(tmp_path):
    """WAT sidecar planting a host-authority asymmetry: a.example.org
    links to b.example.org, so after PageRank b ≈ 0.2775 and a keeps the
    dangling floor 0.15; z.example.org is absent from the graph."""
    from go_readability_spark.sources.wat import write_wat

    d = tmp_path / "wat"
    d.mkdir()
    (d / "seg.wat.gz").write_bytes(write_wat([
        ("https://a.example.org/x.html", datetime(2024, 3, 1),
         [("A@/href", "https://b.example.org/1.html", "b1"),
          ("A@/href", "https://b.example.org/2.html", "b2")], None),
    ]))
    return str(d)


def test_wet_curation_with_wat_host_rank(spark, tmp_path):
    """WET text + WAT graph: the host-rank gate runs from the sidecar's
    link metadata with the WARC never read. Floor 0.2 keeps the inlinked
    host (0.2775), drops the dangling one (0.15), keeps absent hosts
    (no signal)."""
    from go_readability_spark.operators import (
        edges_from_wat,
        host_graph,
        host_rank,
    )
    from go_readability_spark.plans.curate import (
        articles_from_texts,
        curate_corpus,
    )
    from go_readability_spark.sources import links_from_wat

    docs = spark.createDataFrame(
        [("https://a.example.org/d.html", datetime(2024, 3, 1), _doc(1)),
         ("https://b.example.org/d.html", datetime(2024, 3, 1), _doc(2)),
         ("https://z.example.org/d.html", datetime(2024, 3, 1), _doc(3))],
        "url string, warc_ts timestamp, text string")
    ranks = host_rank(host_graph(edges_from_wat(
        links_from_wat(spark, _wat_dir(tmp_path)))))
    curated = curate_corpus(
        articles_from_texts(docs), extract=False, min_length=100,
        min_quality=0.0, languages=("en", "und"),
        host_rank_floor=0.2, host_ranks=ranks, num_partitions=2)
    urls = {r.url for r in curated.select("url").collect()}
    assert urls == {"https://b.example.org/d.html",
                    "https://z.example.org/d.html"}


def test_cli_curate_wet_with_wat_host_rank(spark, tmp_path):
    from go_readability_spark.sources import write_wet

    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "seg.wet.gz").write_bytes(write_wet([
        ("https://a.example.org/d.html", datetime(2024, 3, 1), _doc(1)),
        ("https://b.example.org/d.html", datetime(2024, 3, 1), _doc(2))]))
    out = tmp_path / "curated"
    r = subprocess.run(
        [sys.executable, "-m", "go_readability_spark", "curate",
         "--input", str(tmp_path / "in"), "--input-format", "wet",
         "--output", str(out), "--min-length", "100",
         "--min-quality", "0.0", "--languages", "en,und",
         "--host-rank-floor", "0.2", "--wat-host-rank",
         _wat_dir(tmp_path), "--partitions", "2", "--master", "local[2]"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-4000:]
    urls = {r_.url for r_ in spark.read.parquet(str(out)).collect()}
    assert urls == {"https://b.example.org/d.html"}


def test_cli_wat_host_rank_without_floor_refused(tmp_path):
    """--wat-host-rank without --host-rank-floor would be a silent no-op
    (review finding): the CLI refuses instead of shipping an ungated
    corpus the user believes was authority-gated."""
    r = subprocess.run(
        [sys.executable, "-m", "go_readability_spark", "curate",
         "--input", str(tmp_path), "--input-format", "wet",
         "--output", str(tmp_path / "o"),
         "--wat-host-rank", str(tmp_path), "--master", "local[2]"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo")
    assert r.returncode != 0
    assert "host-rank-floor" in r.stderr


def test_cli_curate_from_wet(spark, tmp_path):
    from go_readability_spark.sources import write_wet

    records = [(f"https://w{i}.example.org/d.html",
                datetime(2024, 3, 1), _doc(i) + " contact: a@b.example")
               for i in range(8)]
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "seg.wet.gz").write_bytes(write_wet(records))
    out = tmp_path / "curated"
    r = subprocess.run(
        [sys.executable, "-m", "go_readability_spark", "curate",
         "--input", str(tmp_path / "in"), "--input-format", "wet",
         "--output", str(out), "--min-length", "100",
         "--min-quality", "0.0", "--languages", "en,und", "--redact-pii",
         "--partitions", "4", "--master", "local[2]"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-4000:]
    got = spark.read.parquet(str(out))
    assert got.count() == 8
    sample = got.limit(1).collect()[0]
    assert "a@b.example" not in sample.text_content  # PII gate still ran
    assert {"url", "text_content", "lang_id", "quality",
            "fingerprint"} <= set(got.columns)