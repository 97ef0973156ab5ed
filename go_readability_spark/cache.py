"""Deterministic cache ownership for operators that persist() internal
relations.

Several operators (minhash_index/minhash_probe, and historically the
batch dedup paths) persist an intermediate DataFrame because two
downstream branches consume it — without the persist the expensive
shingling/tokenisation recomputes per branch.  In a one-shot job the
cached blocks die with the session; in a LONG-LIVED pipeline (a crawl
scheduler probing segment after segment) they accumulate until executor
storage memory pressure evicts them unpredictably (VERDICT r5 hygiene
item).

CacheScope makes the lifecycle explicit: an operator registers every
internal persist() on the caller-supplied scope, and the caller releases
the scope once the operator's OUTPUT has been materialised (written,
collected, or itself persisted).  Releasing before materialisation is
safe for correctness — Spark just recomputes — it only forfeits the
dedup of work the persist existed for.

    with CacheScope() as scope:
        pairs = minhash_probe(seg, buckets, shingles, scope=scope, ...)
        pairs.write.parquet(out)        # materialise INSIDE the scope
    # all internal caches released here

Operators keep their historical behaviour when no scope is passed
(plain persist(), caller may clearCache()), so one-shot callers and the
driver contract are unaffected.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


class CacheScope:
    """Collects DataFrames persisted inside operator internals so the
    caller can release the executor memory deterministically."""

    def __init__(self) -> None:
        self._dfs: list[DataFrame] = []

    def add(self, df: DataFrame,
            storage_level: StorageLevel | None = None) -> DataFrame:
        """persist() df, remember the handle, return it."""
        self._dfs.append(df.persist(storage_level)
                         if storage_level is not None else df.persist())
        return df

    def release(self, blocking: bool = False) -> None:
        """unpersist() everything registered, newest first."""
        while self._dfs:
            self._dfs.pop().unpersist(blocking)

    def __len__(self) -> int:
        return len(self._dfs)

    def __enter__(self) -> "CacheScope":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def persist_scoped(df: DataFrame, scope: CacheScope | None,
                   storage_level: StorageLevel | None = None) -> DataFrame:
    """persist df on the scope when one is supplied, else bare persist()
    (the historical operator behaviour).

    storage_level overrides the DataFrame default (heap-deserialized
    MEMORY_AND_DISK). Pass StorageLevel.DISK_ONLY for WIDE boundaries —
    a full-text corpus cached deserialized on-heap inflates 2-4x and
    OOMed the 8g local JVM at the 1M-doc curation volume run; disk-only
    blocks are bounded and a local re-read is cheap next to re-running
    the extraction UDF the persist exists to avoid."""
    if scope is not None:
        return scope.add(df, storage_level)
    return (df.persist(storage_level) if storage_level is not None
            else df.persist())
