"""Custom stateful streaming operator: cross-micro-batch NEAR-duplicate
suppression by SimHash hamming distance.

A crawl feed re-sees boilerplate-shifted copies of the same article
(trackers swapped, dates updated) that exact fingerprints miss. This
operator bands each document's 64-bit SimHash into max_hamming+1 chunks
(pigeonhole: any earlier document within hamming <= k shares at least one
chunk) and keeps, per (chunk_no, chunk_value) group, the SimHashes seen so
far in Spark state (applyInPandasWithState). Each incoming document gets a
per-group verdict; a document is new iff NO group matched.

The verdicts of one document all land in the micro-batch that carried it,
so the final AND is a plain batch aggregation inside foreachBatch — no
second stateful stage, no watermark coupling. State per group is capped
(newest-kept) so a hot chunk value cannot grow without bound; production
would add a GroupStateTimeout TTL on top.

Dedup semantics: "near-duplicate of ANYTHING previously seen" — a
suppressed document's hash also enters state, so a near-dup of a
suppressed doc is itself suppressed (deterministic under any chunk
geometry, at the cost of transitive-chain suppression, which is what a
crawl dedup wants anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import simhash_chunks, simhash_table

VOTE_SCHEMA = "url string, simhash long, matched int"
STATE_SCHEMA = "seen array<long>"


def _make_group_fn(max_hamming: int, max_state: int):
    def near_group(key, pdfs, state: GroupState):
        import pandas as pd

        seen = list(state.get[0]) if state.exists else []
        # CRITICAL #1: process the batch's rows in a GLOBAL deterministic
        # order (url). A near-dup pair arriving in the same micro-batch
        # shares several chunk groups; if group 0 processed A first while
        # group 1 processed B first, BOTH would get a matched vote and the
        # batch-side AND would suppress both copies — silent loss of every
        # copy of the article. With a consistent order, the first-by-url
        # doc is never matched by the other in ANY group.
        # CRITICAL #2: collapse exact (url, simhash) copies to ONE row —
        # a crawler re-emitting the same url twice in one batch would
        # otherwise have its second copy vote matched=1, and the
        # batch-side groupBy(url, simhash) would merge the two copies and
        # suppress BOTH (every copy of the article lost).
        rows = sorted({
            (str(url), int(sh))
            for pdf in pdfs
            for url, sh in zip(pdf["url"], pdf["simhash"])
        })
        urls, hashes, matched = [], [], []
        for url, sh in rows:
            hit = any(
                bin((sh ^ int(old)) & ((1 << 64) - 1)).count("1") <= max_hamming
                for old in seen
            )
            urls.append(url)
            hashes.append(sh)
            matched.append(1 if hit else 0)
            # append UNCONDITIONALLY: the semantics are "near-dup of
            # ANYTHING previously seen" (survivor or suppressed). Adding
            # only non-matching docs made later verdicts depend on which
            # chunk groups a suppressed doc happened to match in — the
            # same logical input could dedup differently depending on
            # WHERE its bits differed (chunk-geometry-dependent state).
            seen.append(sh)
        if len(seen) > max_state:
            seen = seen[-max_state:]
        state.update((seen,))
        yield pd.DataFrame({"url": urls, "simhash": hashes, "matched": matched})

    return near_group


def streaming_simhash_votes(
    pages_stream: DataFrame,
    max_hamming: int = 3,
    url_col: str = "url",
    text_col: str = "text",
    max_state_per_group: int = 10_000,
) -> DataFrame:
    """Per-(chunk_no, chunk) verdict stream: (url, simhash, matched).
    A document is a near-duplicate iff max(matched) over its chunk rows
    is 1 (see finalize_near_dedup_batch)."""
    n_chunks = max_hamming + 1
    sims = simhash_table(pages_stream, url_col, text_col).withColumnRenamed("id", "url")
    chunks = simhash_chunks(F.col("simhash"), n_chunks)
    keyed = sims.select(
        "url", "simhash", F.posexplode(chunks).alias("chunk_no", "chunk")
    )
    return keyed.groupBy("chunk_no", "chunk").applyInPandasWithState(
        _make_group_fn(max_hamming, max_state_per_group),
        outputStructType=VOTE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_near_dedup_batch(batch_df: DataFrame) -> DataFrame:
    """Batch-side AND over a document's chunk votes: survivors only."""
    return (
        batch_df.groupBy("url", "simhash")
        .agg(F.max("matched").alias("is_dup"))
        .where(F.col("is_dup") == 0)
        .select("url", "simhash")
    )


def run_near_dedup_stream(
    pages_stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    url_col: str = "url",
    text_col: str = "text",
):
    """End-to-end runner: stateful votes → per-batch finalize → parquet.
    Returns the started StreamingQuery (availableNow trigger)."""
    votes = streaming_simhash_votes(
        pages_stream, max_hamming, url_col=url_col, text_col=text_col
    )

    def sink(batch_df, batch_id):
        # one overwritten subdirectory per batch id: a replay after a
        # crash between write and checkpoint commit rewrites the same
        # directory instead of appending duplicate survivor rows
        finalize_near_dedup_batch(batch_df).write.mode("overwrite").parquet(
            f"{output_dir}/batch={batch_id}"
        )

    return (
        votes.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
