"""Scale/skew tier corpus (SURVEY.md §5 tier 3): deterministic expansion of
the reference's 118 real fixture pages into an arbitrarily large `pages`
table — real-world HTML structure (nav junk, tables, lazy images, JSON-LD)
instead of templated markup, with host/size skew.

Fixture bytes are broadcast once; expansion happens on executors."""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timedelta

from .fixtures import TEST_PAGES, fixture_case_ids


def load_fixture_blobs(test_pages: str = TEST_PAGES):
    blobs = []
    for case in fixture_case_ids(test_pages):
        with open(os.path.join(test_pages, case, "source.html"), "rb") as f:
            blobs.append((case, f.read()))
    return blobs


def fixture_mix_pages(spark, n_docs: int, seed: int = 42, test_pages: str = TEST_PAGES,
                      num_partitions: int = 32):
    """n_docs pages sampled (deterministically) from the real fixture set,
    urls perturbed per replica; ~30% land on one megahost (skew knob)."""
    import pandas as pd

    from ..plans.schema import PAGES_SCHEMA

    blobs = load_fixture_blobs(test_pages)
    if not blobs:
        raise FileNotFoundError(f"no fixtures under {test_pages}")
    sc = spark.sparkContext
    b_blobs = sc.broadcast(blobs)

    def gen(batches):
        cases = b_blobs.value
        n_cases = len(cases)
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for idx in pdf["id"]:
                idx = int(idx)
                h = hashlib.sha256(f"{seed}:{idx}".encode()).digest()
                case, html = cases[int.from_bytes(h[:4], "big") % n_cases]
                host = (
                    "megahost.example.org"
                    if h[4] < 77  # ~30%
                    else f"site{h[5] % 32}.example.org"
                )
                rows["url"].append(f"https://{host}/{case}/{idx}.html")
                rows["warc_ts"].append(datetime(2025, 1, 1) + timedelta(seconds=idx))
                rows["html"].append(html)
                rows["text"].append(None)
                rows["lang"].append(None)
            yield pd.DataFrame(rows)

    return spark.range(0, n_docs, 1, num_partitions).mapInPandas(
        gen, schema=PAGES_SCHEMA
    )
