"""Streaming ingest metrics: windowed per-host page counts with a
watermark for late data — the event-time aggregation pattern for
monitoring a live crawl feed (Structured Streaming surface of SURVEY §2h)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def host_of(url_col):
    # no trailing '/' requirement and case-insensitive scheme: bare-host
    # URLs ('https://example.org') and 'HTTP://...' otherwise extracted an
    # empty host, collapsing them into one phantom host="" metrics group
    return F.regexp_extract(url_col, r"^(?i)[a-z][a-z0-9+.-]*://([^/?#]+)", 1)


def pages_ingest_metrics(
    pages_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Tumbling-window page counts + bytes per host; late rows beyond the
    watermark are dropped (state is bounded — mandatory at crawl scale)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("win"),
            host_of(F.col("url")).alias("host"),
        )
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("html")).alias("bytes_in"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "host",
            "n_pages",
            "bytes_in",
        )
    )
