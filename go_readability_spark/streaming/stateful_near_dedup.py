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
second stateful stage, no watermark coupling. State is bounded on BOTH
axes: per group the SimHash list is capped (newest-kept) so a hot chunk
value cannot grow without bound, and idle (chunk_no, chunk) groups are
evicted by a processing-time GroupStateTimeout TTL so the NUMBER of
groups plateaus on an endless stream (an evicted group simply means a
near-dup re-seen after `state_ttl_ms` of group inactivity is treated as
new — the standard crawl-dedup recency trade).

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


def _make_group_fn(max_hamming: int, max_state: int, state_ttl_ms: int):
    def near_group(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            # idle group: evict and emit nothing (no document rode in)
            state.remove()
            yield pd.DataFrame({
                "url": pd.Series([], dtype=object),
                "simhash": pd.Series([], dtype="int64"),
                "matched": pd.Series([], dtype="int64"),
            })
            return
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
        # TTL restarts on every batch that touches the group: only IDLE
        # groups are evicted, a hot chunk value stays resident
        state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame({"url": urls, "simhash": hashes, "matched": matched})

    return near_group


def streaming_simhash_votes(
    pages_stream: DataFrame,
    max_hamming: int = 3,
    url_col: str = "url",
    text_col: str = "text",
    max_state_per_group: int = 10_000,
    state_ttl_ms: int = 6 * 3600 * 1000,
) -> DataFrame:
    """Per-(chunk_no, chunk) verdict stream: (url, simhash, matched).
    A document is a near-duplicate iff max(matched) over its chunk rows
    is 1 (see finalize_near_dedup_batch).

    `state_ttl_ms` (default 6h) evicts (chunk_no, chunk) groups idle for
    that long, so state row count plateaus at the working set of recently
    active chunk values instead of growing with every distinct value ever
    seen; the duration resets whenever a batch touches the group."""
    if state_ttl_ms <= 0:
        raise ValueError(f"state_ttl_ms must be positive, got {state_ttl_ms}")
    n_chunks = max_hamming + 1
    sims = simhash_table(pages_stream, url_col, text_col).withColumnRenamed("id", "url")
    chunks = simhash_chunks(F.col("simhash"), n_chunks)
    keyed = sims.select(
        "url", "simhash", F.posexplode(chunks).alias("chunk_no", "chunk")
    )
    return keyed.groupBy("chunk_no", "chunk").applyInPandasWithState(
        _make_group_fn(max_hamming, max_state_per_group, state_ttl_ms),
        outputStructType=VOTE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
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
    state_ttl_ms: int = 6 * 3600 * 1000,
    max_run_seconds: float = 600.0,
):
    """End-to-end runner: stateful votes → per-batch finalize → parquet.

    Under ProcessingTimeTimeout an availableNow query never terminates on
    its own — after the data is drained Spark keeps scheduling empty
    micro-batches forever in case future timeouts fire — so the runner
    owns termination: it blocks until the first committed batch with zero
    input rows (the run's timeout sweep, right after the last data
    batch), stops the query, and returns it already terminated.  A
    scheduled pipeline re-invokes the runner on its cadence; idle groups
    past `state_ttl_ms` are evicted by each run's data batches and final
    sweep.  `max_run_seconds` bounds the wait if the source misbehaves;
    hitting it stops BETWEEN micro-batches, so nothing is lost — the next
    run resumes from the streaming checkpoint (foreachBatch is keyed by
    batch id).  Raise it for backlogs that legitimately need longer."""
    import time as _time

    votes = streaming_simhash_votes(
        pages_stream, max_hamming, url_col=url_col, text_col=text_col,
        state_ttl_ms=state_ttl_ms,
    )

    def sink(batch_df, batch_id):
        # one overwritten subdirectory per batch id: a replay after a
        # crash between write and checkpoint commit rewrites the same
        # directory instead of appending duplicate survivor rows
        finalize_near_dedup_batch(batch_df).write.mode("overwrite").parquet(
            f"{output_dir}/batch={batch_id}"
        )

    q = (
        votes.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    deadline = _time.monotonic() + max_run_seconds
    while _time.monotonic() < deadline and q.isActive:
        prog = q.recentProgress
        # a zero-input batch alone is not "drained": a restart first
        # re-executes the WAL-planned batch from the previous run (often
        # empty) BEFORE reading newly arrived files, so also require the
        # source to report no pending data
        if (prog and prog[-1]["numInputRows"] == 0
                and not q.status.get("isDataAvailable", False)):
            break
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    return q
