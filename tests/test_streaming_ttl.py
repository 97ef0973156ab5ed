"""Streaming near-dedup state TTL (VERDICT r5 #4): idle (chunk_no,
chunk) groups are evicted by the processing-time timeout so state row
count plateaus on an endless stream, while suppression of RECENT
near-dups keeps working (a group receiving data in a batch always beats
its pending timeout).

Mechanics under availableNow: each run ends with a trailing empty
micro-batch in which pending timeouts fire — with a tiny TTL the groups
the run created are evicted before the query terminates, so state
returns to zero between runs instead of accumulating across an endless
schedule of runs."""

import time

import pandas as pd
import pytest

from go_readability_spark.streaming import run_near_dedup_stream

TTL_MS = 100  # far below the >=1s micro-batch latency, so the run's
# trailing sweep batch always finds the data batch's timeouts expired

X = ("the quick brown fox jumps over the lazy dog near the old river "
     "bank while birds sing softly in the morning light today")
Y = ("completely different article text about spark physical plans "
     "and shuffle boundaries with adaptive execution at scale")


def _near(text, word="tonight"):
    words = text.split()
    return " ".join(words[:-1] + [word])


def _run(spark, src, out, ckpt, ttl_ms=TTL_MS):
    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = run_near_dedup_stream(stream, out, ckpt, max_hamming=8,
                              state_ttl_ms=ttl_ms)
    assert not q.isActive  # the runner owns termination now
    ops = [p["stateOperators"][0] for p in q.recentProgress
           if p.get("stateOperators")]
    return {
        "final_total": ops[-1]["numRowsTotal"] if ops else 0,
        "max_total": max((o["numRowsTotal"] for o in ops), default=0),
        "removed": sum(o["numRowsRemoved"] for o in ops),
    }


def _write(spark, src, name, rows):
    pdf = pd.DataFrame(rows, columns=["url", "text"])
    spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{src}/{name}")


def test_state_plateaus_across_runs_and_recent_dups_suppressed(
        spark, tmp_path):
    src = str(tmp_path / "stream")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: two distinct docs.  Their chunk groups enter state during
    # the data batch; the trailing sweep MAY already evict them (it does
    # when the sweep starts > TTL after the data batch).
    _write(spark, src, "f1", [("u1", X), ("u2", Y)])
    m1 = _run(spark, src, out, ckpt)
    assert m1["max_total"] > 0

    # run 1b: no new data, started well past the TTL — its no-data batch
    # services every still-pending expired timeout, so between scheduled
    # runs the state store is EMPTY (the plateau: groups do not
    # accumulate run over run).
    time.sleep(3 * TTL_MS / 1000)
    m1b = _run(spark, src, out, ckpt)
    assert m1b["final_total"] == 0, (m1, m1b)
    assert m1["removed"] + m1b["removed"] >= m1["max_total"]

    # run 2: a near-dup of the EXPIRED u1 is treated as new — the
    # recency trade — while a second near-dup of u1 in the SAME batch is
    # still suppressed (recent state always wins; u3 < u5 in the
    # deterministic url order).
    _write(spark, src, "f2",
           [("u3", _near(X)), ("u5", _near(X, "thisnight"))])
    m2 = _run(spark, src, out, ckpt)
    # plateau: run 1's groups are gone, so run 2's peak state is just
    # its own working set — not run 1's groups stacked on top
    assert m2["max_total"] <= m1["max_total"], (m1, m2)

    got = {r["url"] for r in spark.read.parquet(out).collect()}
    assert {"u1", "u2"} <= got
    assert "u3" in got, f"expired near-dup u3 should survive: {got}"
    assert "u5" not in got, f"recent near-dup u5 not suppressed: {got}"


def test_within_ttl_cross_run_suppression_intact(spark, tmp_path):
    """With a TTL longer than the gap between runs, nothing evicts and
    cross-run near-dup suppression behaves exactly as before the TTL
    existed."""
    src = str(tmp_path / "stream")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # two files -> two data batches; the second batch re-sends a near-dup
    # of X while Y's groups idle out in between
    _write(spark, src, "f1", [("a1", X), ("a2", Y)])
    m1 = _run(spark, src, out, ckpt, ttl_ms=3600 * 1000)
    assert m1["final_total"] == m1["max_total"] > 0  # nothing evicted
    _write(spark, src, "f2", [("a3", _near(X))])
    m2 = _run(spark, src, out, ckpt, ttl_ms=3600 * 1000)
    got = {r["url"] for r in spark.read.parquet(out).collect()}
    assert "a3" not in got, got  # suppressed: X's groups still resident
    assert m2["removed"] == 0


def test_no_timeout_conf_gone():
    """The operator must not use GroupStateTimeout.NoTimeout anywhere."""
    import inspect

    from go_readability_spark.streaming import stateful_near_dedup as mod

    src = inspect.getsource(mod)
    assert "NoTimeout" not in src
    assert "ProcessingTimeTimeout" in src


def test_invalid_ttl_rejected(spark):
    from go_readability_spark.streaming.stateful_near_dedup import (
        streaming_simhash_votes,
    )

    stream = (
        spark.readStream.schema("url string, text string")
        .parquet("/nonexistent/never-read/*")
    )
    with pytest.raises(ValueError):
        streaming_simhash_votes(stream, state_ttl_ms=0)
