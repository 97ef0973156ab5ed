"""Crawl-snapshot deduplication: keep the newest capture of every page.

Common-Crawl-style tables hold the SAME page many times — one row per
crawl snapshot, plus scheme/case/tracking-param URL variants of the same
resource (reference context: go-readability extracts one article per
fetched page and has no corpus-level notion of re-crawls; a 10^12-row
pages table needs this step before extraction so each article is parsed
once, from its freshest capture).

`latest_snapshot` canonicalizes the URL (functions/urls.py — the same
normalization the `url_canonical` driver query verifies bit-for-bit) and
keeps, per canonical URL, the row with the greatest timestamp; ties break
on the smallest raw URL, then optional extra columns, so output is a pure
function of the input set (resumable / retry-stable).

Scale shape: ONE hash shuffle on canonical_url, then a per-group
row_number. Group width is bounded by re-crawl frequency (a page is
captured at most a few thousand times), so there is no skew cliff — the
heaviest group is ~10^3 rows regardless of corpus size, and AQE's
partition coalescing handles the overall distribution. A groupBy+max_by
formulation would gain map-side combine but cannot express the
descending-then-ascending composite tiebreak on a string column; the
window is the idiomatic and correct plan here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.urls import with_canonical_url


def latest_snapshot(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    extra_tiebreak: list[str] | None = None,
    keep_canonical: bool = True,
) -> DataFrame:
    """One row per canonical URL: the newest capture.

    Deterministic winner: ts DESC, raw url ASC, then `extra_tiebreak`
    columns ASC (pass e.g. a content digest when the same (url, ts) can
    legitimately carry different bytes — duplicate WARC records)."""
    order: list[Column] = [F.col(ts_col).desc(), F.col(url_col).asc()]
    for c in extra_tiebreak or []:
        order.append(F.col(c).asc())
    staged = with_canonical_url(df, url_col)
    w = Window.partitionBy("canonical_url").orderBy(*order)
    out = (
        staged.withColumn("_sn_rn", F.row_number().over(w))
        .where(F.col("_sn_rn") == 1)
        .drop("_sn_rn")
    )
    return out if keep_canonical else out.drop("canonical_url")


def snapshot_history(
    df: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """Per-canonical-URL capture stats: (canonical_url, n_snapshots,
    n_url_variants, first_ts, last_ts). One shuffle, full map-side
    combine (plain groupBy aggregates) — the cheap audit twin of
    `latest_snapshot` for crawl-freshness dashboards."""
    staged = with_canonical_url(df, url_col)
    return staged.groupBy("canonical_url").agg(
        F.count("*").alias("n_snapshots"),
        F.countDistinct(url_col).alias("n_url_variants"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    )
