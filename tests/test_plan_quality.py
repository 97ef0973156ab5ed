"""Physical-plan assertions (SURVEY.md §4): these lock in the properties
that make the pipeline survive a 100x scale-up — column pruning into the
scan, broadcast resume-join, a single exchange, predicate pushdown."""

import re

import pytest


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    from go_readability_spark.sources import synth_pages_distributed

    path = str(tmp_path_factory.mktemp("plans") / "pages")
    synth_pages_distributed(spark, 64, seed=4, skew=False, num_partitions=4).write.parquet(path)
    return path


def test_scan_column_pruning(spark, pages_parquet):
    """The extract plan must read only (url, warc_ts, html) — never `text`
    or `lang` — so the 100 TB scan skips unused columns."""
    from go_readability_spark.plans import extract_pages

    df = extract_pages(spark.read.parquet(pages_parquet), num_partitions=4)
    plan = _plan(df)
    m = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert m, plan
    read_schema = m.group(1)
    assert "url" in read_schema and "html" in read_schema
    assert "text" not in read_schema.replace("text_content", "")
    assert "lang" not in read_schema


def test_resume_antijoin_is_broadcast(spark, pages_parquet, tmp_path):
    """The checkpoint anti-join must broadcast the (tiny) bucket list, not
    shuffle the 10^12-row pages table."""
    from go_readability_spark.plans import extract_pages

    ckpt = str(tmp_path / "ckpt")
    pages = spark.read.parquet(pages_parquet)
    extract_pages(pages, n_buckets=16, num_partitions=4, checkpoint_dir=ckpt).count()
    df = extract_pages(pages, n_buckets=16, num_partitions=4,
                       checkpoint_dir=ckpt, resume=True)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_single_exchange_in_extract(spark, pages_parquet):
    """Exactly one shuffle: the salted repartition. (AQE may add a read
    node, but there must be a single Exchange operator.)"""
    from go_readability_spark.plans import extract_pages

    df = extract_pages(spark.read.parquet(pages_parquet), num_partitions=4)
    plan = _plan(df)
    assert plan.count("Exchange") == 1, plan


def test_extract_exchange_key_follows_resume_semantics(spark, pages_parquet, tmp_path):
    """The one extraction exchange is keyed by the coarse salt ONLY when
    bucket-level resume is in play (checkpoint marks whole buckets done, so
    each bucket must live in one task); without a checkpoint_dir the same
    exchange uses the full-width url hash — n_buckets values hashed into P
    partitions leave measured ~±40% per-task row-count imbalance at
    n_buckets/P = 8 (guide §2.5 wants 20-100x more keys than partitions)."""
    from go_readability_spark.plans import extract_pages

    pages = spark.read.parquet(pages_parquet)
    no_resume = _plan(extract_pages(pages, n_buckets=16, num_partitions=4))
    m = re.search(r"hashpartitioning\(([^)]*)", no_resume)
    assert m and "xxhash64(url" in m.group(1), no_resume
    assert no_resume.count("Exchange") == 1, no_resume

    ckpt = str(tmp_path / "ckpt_key")
    resumable = _plan(extract_pages(pages, n_buckets=16, num_partitions=4,
                                    checkpoint_dir=ckpt))
    m = re.search(r"hashpartitioning\(salt", resumable)
    assert m, resumable


def test_filter_pushdown_to_scan(spark, pages_parquet):
    """A pre-filter (e.g. warc_ts window or url prefix) must reach the
    parquet scan as PushedFilters, not run post-scan only."""
    from pyspark.sql import functions as F

    pages = spark.read.parquet(pages_parquet).where(F.col("url").startswith("https://site1"))
    plan = _plan(pages)
    assert re.search(r"PushedFilters: \[.*StringStartsWith\(url", plan), plan


def test_extract_has_no_python_row_udf(spark, pages_parquet):
    """The extraction stage must be Arrow-batched (MapInPandas/ArrowEvalPython),
    never row-at-a-time BatchEvalPython."""
    from go_readability_spark.plans import extract_pages

    plan = _plan(extract_pages(spark.read.parquet(pages_parquet), num_partitions=4))
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_ann_broadcasts_queries(spark):
    from pyspark.sql import functions as F

    from go_readability_spark.operators import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = brute_force_topk(emb, emb.where(F.col("vec_id") < 3), k=5)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_ngram_jaccard_no_per_document_broadcast(spark):
    """The per-document sizes table must NOT be broadcast (it grows with
    the corpus — broadcasting it is impossible at 10^12 docs). Shingle
    counts ride through the explode instead, so the only joins left are
    the max-df semi-join and the shingle self-join."""
    from go_readability_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(ngram_jaccard_pairs(docs, "doc_id", "text"))
    # every join must be keyed on the shingle (max-df semi-join + the
    # self-join); a join keyed on document id would mean the sizes table
    # is back. (AQE may choose broadcast for the small shingle joins at
    # this scale — that's statistics-driven and fine; a HINTED broadcast
    # of a per-document table is not, and can't appear if the join itself
    # is gone.)
    for m in re.finditer(r"(?:HashJoin|SortMergeJoin)\w* \[([a-z_]+)#", plan):
        assert m.group(1) == "shingle", plan
    assert re.search(r"(?:HashJoin|SortMergeJoin)", plan), plan


def test_pii_redaction_stays_jvm_side(spark):
    """PII masking must be whole-stage-codegen column expressions — no
    Python evaluation nodes, no Exchange (it's map-only)."""
    from go_readability_spark.functions.pii import with_pii_redacted

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(with_pii_redacted(docs, "text"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "*(1)" in plan, plan  # whole-stage codegen marker


def test_lm_scoring_broadcasts_vocab_not_corpus(spark):
    """The <unk> vocab-mapping join must broadcast the vocab side (bounded
    by language, not corpus size). The per-token table must never be the
    build side of a broadcast."""
    from go_readability_spark.operators.lm_score import bigram_lm_scores

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(bigram_lm_scores(docs))
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_warc_scan_ships_paths_not_bytes(spark, tmp_path):
    """Archive bytes must never enter the JVM plan: the reader ships a
    PATH list into MapInPandas and each Python task opens its own files
    (binaryFile materialized every concurrent archive on the shared
    local heap and OOMed the 1M WET volume run)."""
    from datetime import datetime

    from go_readability_spark.sources.warc import pages_from_warc, write_warc

    p = tmp_path / "a.warc.gz"
    p.write_bytes(write_warc([("http://x/1", datetime(2024, 1, 1), b"<html>x</html>")]))
    plan = _plan(pages_from_warc(spark, str(tmp_path)))
    assert "MapInPandas" in plan, plan
    assert "binaryFile" not in plan, plan  # no JVM-side archive bytes
    assert "content" not in plan, plan


def test_quality_classifier_is_pure_codegen(spark):
    """Frozen-weight scoring must stay JVM-side: no Python UDF, no
    exchange — a map-only projection over the scan."""
    import json
    import os

    from go_readability_spark.operators import score_with_weights

    pins = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "go_readability_spark", "sources", "quality_lr_sf001.json")
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = _plan(score_with_weights(docs, json.load(open(pins))))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # map-only: no shuffle at any scale


def test_semantic_dedup_pair_join_is_bucket_equi(spark):
    """The within-cluster prune must be an equi-join on the cluster id
    (SortMergeJoin/ShuffledHashJoin keyed on bucket), never a cartesian
    across clusters; the only nested-loop join allowed is against the
    single-row centroid relation."""
    import json
    import os

    from go_readability_spark.operators import semantic_dedup

    pins = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "go_readability_spark", "sources", "ivf_index_sf001.json")
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = json.load(open(pins))["centroids"]
    plan = _plan(semantic_dedup(emb, cents, threshold=0.35))
    assert "CartesianProduct" not in plan
    joins = [l for l in plan.splitlines()
             if "SortMergeJoin" in l or "ShuffledHashJoin" in l]
    assert joins and any("bucket" in j for j in joins), joins


def test_host_graph_single_exchange_partial_agg(spark):
    """host_graph over the planted-link corpus must be one shuffle (the
    (src_host, dst_host) groupBy) with a map-side partial aggregate
    collapsing per-page fan-out before the exchange, and no Python in
    the plan — link extraction is regexp_extract_all/explode, JVM-side."""
    from go_readability_spark.operators import host_graph, link_edges
    from go_readability_spark.sources import pages_from_documents_linked

    pages = pages_from_documents_linked(spark, "/root/testdata/sf0.001")
    plan = _plan(host_graph(link_edges(pages)))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1, plan
    # partial_count before the exchange, final count after it
    assert "partial_count" in plan or plan.count("HashAggregate") >= 2, plan


def test_minhash_flood_cap_single_aggregation(spark):
    """The max_bucket_size cap must ride the ONE band-bucket aggregation
    (sorted-id collect + streamed pair generators), not a separate
    count + semi-join pass (the round-4 +50% regression): exactly one
    ObjectHashAggregate exchange for the bucket collect, pair
    enumeration as Generate nodes, and no join before the verify stage's
    shingle joins."""
    from go_readability_spark.operators.dedup import (
        _band_bucket_md5,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sigs = minhash_signatures(docs.limit(50), num_hashes=16)
    plan = _plan(minhash_lsh_candidates(
        sigs, num_bands=4, rows_per_band=4,
        bucket_fn=_band_bucket_md5, max_bucket_size=100))
    assert "Join" not in plan, plan  # candidates need NO join at all now
    assert plan.count("Generate") >= 2, plan  # streamed pair explode
    # two aggregations total: the bucket collect + the pair distinct
    assert plan.count("Exchange") <= 2, plan


def test_frontier_schedule_no_host_window(spark):
    """frontier_schedule must never sort a whole host in one window
    partition: every window/sort key set includes the block column, and
    the offsets side is a tiny per-(host, block) count aggregation."""
    import re as _re

    from go_readability_spark.operators import frontier_schedule

    plan_df = spark.createDataFrame(
        [(f"https://m.example.net/{i}",) for i in range(50)], "url string")
    delays = spark.createDataFrame([], "host string, delay_sec double")
    plan = _plan(frontier_schedule(plan_df, delays, 1.0, n_blocks=8))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for spec in _re.findall(r"partitionBy=\[([^\]]*)\]", plan):
        cols = [c.split("#")[0].strip() for c in spec.split(",")]
        assert cols != ["host"], plan


def test_anchor_stats_bounded_topk_shape(spark):
    """anchor_text_stats must pre-cap texts with the two-phase rank: a
    row_number window over (dst, sub-key) feeding the final collect_set,
    and the count stats must come from an expand-rewritten
    count-distinct (constant-size agg state), never a collected set of
    srcs."""
    from go_readability_spark.operators import anchor_text_stats
    from go_readability_spark.sources import pages_from_documents_linked

    pages = pages_from_documents_linked(spark, "/root/testdata/sf0.001")
    plan = _plan(anchor_text_stats(pages))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "row_number" in plan, plan          # the pre-cap rank
    assert plan.count("collect_set") <= 2, plan  # only the capped texts agg
    assert "collect_set(src" not in plan, plan
    # count(DISTINCT src) rewritten to constant-state aggregation: either
    # an Expand (multi-distinct) or a two-level group-by-(dst, src) pass
    assert "Expand" in plan or "keys=[dst" in plan and "src" in plan, plan
    assert "partial_count(distinct" in plan or "Expand" in plan, plan


def test_ranged_fetch_partitions_by_archive(spark):
    """pages_from_fetch_plan must repartition by filename (archive
    locality) and sort within partitions by (filename, offset) — the
    monotone sweep — with the parse as MapInPandas, never a row UDF."""
    from go_readability_spark.sources import pages_from_fetch_plan

    plan_df = spark.createDataFrame(
        [("u1", "a.warc.gz", 0, 10), ("u2", "a.warc.gz", 10, 10)],
        "url string, filename string, offset long, length long")
    plan = _plan(pages_from_fetch_plan(plan_df, "/tmp"))
    assert "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "hashpartitioning(filename" in plan, plan
    assert "Sort [filename" in plan, plan


def test_revisit_resolution_join_is_digest_equi(spark):
    """resolve_revisits must join revisits to the canonical-payload
    table on digest (equi-join, broadcast or shuffled) — never a
    cartesian — and the canon pick must be an aggregation with partial
    combine (min_by), not a window over all responses."""
    from go_readability_spark.operators import resolve_revisits

    records = spark.createDataFrame(
        [("u1", None, "response", "d1", None, bytearray(b"<html>1</html>")),
         ("u2", None, "revisit", "d1", "u1", None)],
        "url string, warc_ts timestamp, record_type string, digest string, "
        "refers_to string, html binary")
    plan = _plan(resolve_revisits(records))
    assert "CartesianProduct" not in plan, plan
    assert "min_by" in plan or "partial_min_by" in plan, plan
    assert "Window" not in plan, plan


def test_bloom_sharded_build_single_exchange_partial_agg(spark):
    """bloom_build_sharded is ONE shuffle (the (shard, word) groupBy)
    with a map-side partial bit_or collapsing per-key probe fan-out
    before the exchange, and no Python anywhere — positions are md5/conv
    column arithmetic."""
    from go_readability_spark.operators.bloom import bloom_build_sharded

    df = spark.range(500).selectExpr("concat('https://h', id) AS url")
    plan = _plan(bloom_build_sharded(df, n_shards=8,
                                     bits_per_shard=1 << 14, k=5))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final bit_or
