"""Custom stateful streaming operator: cross-micro-batch exact dedup.

A live crawl feed re-sees the same page endlessly (recrawls, mirrors,
redirect aliases). This operator keeps the set of seen content
fingerprints *per salt bucket* in Spark state (applyInPandasWithState) and
emits only first-seen pages. State survives restarts via the streaming
checkpoint.

State is bounded two ways: bucketing bounds the NUMBER of groups, and
`max_state_per_group` caps each group's fingerprint set (oldest-evicted,
insertion order) — without the cap a mostly-unique feed grows every
group's array forever, the per-batch state rewrite grows with it, and the
state store eventually OOMs. Eviction trades a bounded false-negative
rate (a page re-seen after `n_buckets * max_state_per_group` distinct
newer pages is re-emitted) for bounded state — the same trade a
production TTL (GroupStateTimeout) makes on the time axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.text import fingerprint

OUTPUT_SCHEMA = "url string, fingerprint string"
STATE_SCHEMA = "seen array<string>"


def _make_dedup_group(max_state: int):
    def dedup_group(key, pdfs, state: GroupState):
        import pandas as pd

        # list (insertion-ordered) + set (membership): eviction drops the
        # OLDEST fingerprints when the cap is exceeded
        seen_list = list(state.get[0]) if state.exists else []
        seen = set(seen_list)
        out_urls, out_fps = [], []
        for pdf in pdfs:
            for url, fp in zip(pdf["url"], pdf["fingerprint"]):
                if fp not in seen:
                    seen.add(fp)
                    seen_list.append(fp)
                    out_urls.append(url)
                    out_fps.append(fp)
        if len(seen_list) > max_state:
            seen_list = seen_list[-max_state:]
        state.update((seen_list,))
        yield pd.DataFrame({"url": out_urls, "fingerprint": out_fps})

    return dedup_group


def streaming_exact_dedup(
    pages_stream: DataFrame,
    n_buckets: int = 64,
    max_state_per_group: int = 100_000,
) -> DataFrame:
    """First-seen (url, fingerprint) stream: fingerprint the text, group by
    salt bucket (bounds the number of state partitions), drop repeats
    across ALL micro-batches; per-group state capped at
    `max_state_per_group` fingerprints (oldest evicted)."""
    fp = fingerprint(F.col("text"))
    keyed = pages_stream.select(
        "url",
        fp.alias("fingerprint"),
        F.pmod(F.xxhash64(fp), F.lit(n_buckets)).alias("bucket"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _make_dedup_group(max_state_per_group),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
