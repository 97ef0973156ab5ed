"""Custom stateful streaming operator: cross-micro-batch exact dedup.

A live crawl feed re-sees the same page endlessly (recrawls, mirrors,
redirect aliases). This operator keeps the set of seen content
fingerprints *per salt bucket* in Spark state (applyInPandasWithState) and
emits only first-seen pages. State is bounded per group and survives
restarts via the streaming checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.text import fingerprint

OUTPUT_SCHEMA = "url string, fingerprint string"
STATE_SCHEMA = "seen array<string>"


def _dedup_group(key, pdfs, state: GroupState):
    import pandas as pd

    seen = set(state.get[0]) if state.exists else set()
    out_urls, out_fps = [], []
    for pdf in pdfs:
        for url, fp in zip(pdf["url"], pdf["fingerprint"]):
            if fp not in seen:
                seen.add(fp)
                out_urls.append(url)
                out_fps.append(fp)
    state.update((list(seen),))
    yield pd.DataFrame({"url": out_urls, "fingerprint": out_fps})


def streaming_exact_dedup(pages_stream: DataFrame, n_buckets: int = 64) -> DataFrame:
    """First-seen (url, fingerprint) stream: fingerprint the text, group by
    salt bucket (bounds each state partition), drop repeats across ALL
    micro-batches."""
    fp = fingerprint(F.col("text"))
    keyed = pages_stream.select(
        "url",
        fp.alias("fingerprint"),
        F.pmod(F.xxhash64(fp), F.lit(n_buckets)).alias("bucket"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
