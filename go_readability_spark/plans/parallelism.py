"""Scan-parallelism restoration for compute-heavy operators (r7).

The round-7 audit found that every driver-provided contract table is a
single-row-group parquet file: Spark cannot split inside a row group, so
the scan is ONE task and every compute-heavy projection above it
(shingling + 32-seed MinHash, SimHash bit math, the repetition-filter
regex gauntlet, interpreted array dot products) runs single-core while 31
cores idle — measured 30 s wall for `embedding_near_pairs` at sf0.1
whose total CPU is ~2 s of parallel work.

``ensure_scan_parallelism`` round-robin repartitions an input only when
its current partitioning offers less parallelism than the session
(min(shuffle.partitions, defaultParallelism)).  Properties:

* value-neutral: the row set is unchanged, and every contract query is
  hash-verified against a single-threaded DuckDB oracle, so no declared
  result can depend on partitioning;
* retry-safe: keyless repartition sorts before exchanging
  (spark.sql.execution.sortBeforeRepartition, on by default since
  SPARK-23207) and the guarded inputs are deterministic scans/plans;
* scale-neutral: real crawl-scale inputs arrive in thousands of
  row-group splits, so the guard is a no-op there — no extra shuffle is
  ever added to a table that already parallelizes (guide §2.4: do not
  add exchanges; §2.5: fix input skew/under-split at the source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def session_parallelism(spark) -> int:
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(1, min(shuffle, spark.sparkContext.defaultParallelism))


def ensure_scan_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition `df` round-robin iff it currently has fewer partitions
    than the session could use (no-op for streaming frames and for
    already-parallel inputs)."""
    if df.isStreaming:
        return df
    target = min_parts or session_parallelism(df.sparkSession)
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= target:
        return df
    return df.repartition(target)
