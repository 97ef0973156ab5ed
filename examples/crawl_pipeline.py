#!/usr/bin/env python
"""Crawl-to-corpus example: WARC archives in, curated + redacted training
text out — the continuous-crawl composition of the round-2 surfaces.

  .warc.gz archives ──pages_from_warc──▶ pages table
      ──curate_corpus──▶ extract → quality/lang gates → exact+near dedup
                         → LM-perplexity gate → PII redaction
      ──remove_duplicated_spans──▶ span-level exact-substring cleaning
"""

import os
import sys
import tempfile
from datetime import datetime

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from go_readability_spark.operators.substring_dedup import remove_duplicated_spans
from go_readability_spark.plans import build_session, curate_corpus
from go_readability_spark.plans.session import ship_package
from go_readability_spark.sources import synth_corpus_rows, write_warc
from go_readability_spark.sources.warc import pages_from_warc

spark = build_session(master="local[8]")
ship_package(spark)
tmp = tempfile.mkdtemp(prefix="crawl_")

# stand-in for a crawl drop: 4 archives x 50 pages
rows = synth_corpus_rows(200, seed=3, skew=True)
for a in range(4):
    recs = [(r["url"], datetime(2024, 4, 1, a), r["html"]) for r in rows[a * 50:(a + 1) * 50]]
    with open(os.path.join(tmp, f"crawl-{a:05d}.warc.gz"), "wb") as f:
        f.write(write_warc(recs))

pages = pages_from_warc(spark, tmp)
curated = curate_corpus(
    pages,
    min_length=200,
    min_quality=0.2,
    languages=("en",),
    num_partitions=8,
    redact_pii=True,
    max_lm_nll_per_bigram=20.0,
)
print("curated:", curated.count())

docs = curated.select("url", "text_content")
cleaned = remove_duplicated_spans(docs, "url", "text_content", length=12)
cleaned.select("url", "n_tokens_kept", "n_tokens_dropped").show(5, truncate=40)
spark.stop()
