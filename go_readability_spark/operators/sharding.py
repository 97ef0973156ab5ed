"""Balanced output sharding: assign every document to a ~target-byte
output shard, deterministically, without a global single-task sort.

Writing a 100 TB curated corpus means producing tens of thousands of
output files whose sizes cluster around a target (too-small files choke
downstream listing/open costs; too-large files break streaming loaders).
`coalesce`/`repartition(n)` give row-count balance, not byte balance —
a partition of 1.6 MB pages and a partition of 2 KB pages differ 800x.

This operator reuses the two-phase exact prefix-sum from sequence
packing (operators/packing.py — per-block totals, driver-side running
offsets over tiny block rows, broadcast back): each document's global
starting byte offset in ascending id order is exact, and its shard is
`start_offset div target_bytes`. Documents never split, so a shard
overshoots the target by at most one document. Everything is integer
arithmetic — bit-exact, order-independent, and reproducible in the
DuckDB oracle with a plain window cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .packing import with_token_offsets


def shard_assignments(
    df: DataFrame,
    bytes_col: str = "n_bytes",
    id_col: str = "doc_id",
    target_bytes: int = 256 * 1024 * 1024,
    block_size: int = 100_000,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Adds `shard_id`: the ~target_bytes output shard of each document
    when the corpus is laid out in ascending `id_col` order. Pass
    `tiebreak_col` when `id_col` can collide (hash-derived keys over
    duplicate crawl URLs) so assignment stays deterministic."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    staged = with_token_offsets(
        df, tokens_col=bytes_col, id_col=id_col, block_size=block_size,
        tiebreak_col=tiebreak_col,
    )
    return staged.withColumn(
        "shard_id", F.expr(f"start_offset div {int(target_bytes)}")
    )


def shard_stats(
    df: DataFrame,
    bytes_col: str = "n_bytes",
    id_col: str = "doc_id",
    target_bytes: int = 256 * 1024 * 1024,
    block_size: int = 100_000,
) -> DataFrame:
    """Per-shard manifest: document count, total bytes, id span. One
    map-side-combined aggregation over the assignments."""
    return (
        shard_assignments(df, bytes_col, id_col, target_bytes, block_size)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(bytes_col).alias("shard_bytes"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
    )


def write_sharded(
    df: DataFrame,
    path: str,
    bytes_col: str = "n_bytes",
    id_col: str = "doc_id",
    target_bytes: int = 256 * 1024 * 1024,
    block_size: int = 100_000,
    format: str = "parquet",
    tiebreak_col: str | None = None,
    drop_cols: tuple = (),
) -> None:
    """Write one directory per shard (shard_id=N/...), one file each:
    repartition on shard_id so each output task owns exactly one shard's
    rows. At 10^12 docs the shard count is input_bytes/target — the
    shuffle is by a dense integer key with bounded per-key volume
    (~target_bytes), so no skew mitigation is needed.

    The working columns (start/end_offset, plus any caller-synthesized
    key/size columns named in `drop_cols`) are dropped before the write
    so the sharded output schema is the input schema + shard_id."""
    assigned = shard_assignments(
        df, bytes_col, id_col, target_bytes, block_size, tiebreak_col=tiebreak_col
    )
    assigned = assigned.drop("start_offset", "end_offset", *drop_cols)
    (
        assigned.repartition(F.col("shard_id"))
        .write.partitionBy("shard_id")
        .format(format)
        .mode("overwrite")
        .save(path)
    )
