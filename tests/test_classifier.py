"""Trained quality classifier (operators/classifier.py): pyspark.ml
distillation of the heuristic gate + frozen-weight scoring."""

import json
import os

import pytest

SF_DIR = "/root/testdata/sf0.01"
pytestmark = pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")

PINS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "go_readability_spark", "sources", "quality_lr_sf001.json")


def test_training_distills_the_gate(spark):
    """The linear model must recover its own weak-supervision labels on
    the training distribution (sanity of the distillation setup)."""
    from pyspark.sql import functions as F

    from go_readability_spark.operators import (
        score_with_weights,
        train_quality_classifier,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    weights = train_quality_classifier(docs)
    scored = score_with_weights(docs, weights).withColumn(
        "label", F.expr("CASE WHEN quality >= 0.5 AND lang_id = 'en' THEN 1.0 ELSE 0.0 END")
    )
    agree = scored.where(
        (F.col("pred_quality") & (F.col("label") == 1.0))
        | (~F.col("pred_quality") & (F.col("label") == 0.0))
    ).count()
    total = scored.count()
    assert total > 0
    assert agree / total >= 0.9, f"distillation agreement {agree}/{total}"


def test_pinned_weights_match_pure_python(spark):
    """Frozen-artifact scoring replays exactly in pure python over the
    engine-computed features (the bit-identity the oracle relies on)."""
    from go_readability_spark.operators import score_with_weights
    from go_readability_spark.operators.classifier import FEATURE_ORDER

    weights = json.load(open(PINS))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
    rows = score_with_weights(docs, weights).select(
        "doc_id", "logit", "pred_quality", *FEATURE_ORDER
    ).collect()
    assert rows
    for r in rows:
        z = weights["intercept"]
        for name in FEATURE_ORDER:
            z += weights["coefs"][name] * r[name]
        assert round(z, 6) == r["logit"], r["doc_id"]
        assert (z >= 0) == r["pred_quality"], r["doc_id"]


def test_pinned_artifact_schema():
    w = json.load(open(PINS))
    from go_readability_spark.operators.classifier import FEATURE_ORDER

    assert set(w["coefs"]) == set(FEATURE_ORDER)
    assert isinstance(w["intercept"], float)


def test_curate_with_quality_model(spark):
    """The frozen classifier plugs into the curation pipeline as a
    map-only gate and preserves the curated schema."""
    import json

    from go_readability_spark.plans import curate_corpus
    from go_readability_spark.sources import synth_pages_distributed

    weights = json.load(open(PINS))
    pages = synth_pages_distributed(spark, 40, seed=9, skew=False, num_partitions=4)
    base = curate_corpus(pages, min_length=150, min_quality=0.2,
                         languages=("en",), num_partitions=4)
    gated = curate_corpus(pages, min_length=150, min_quality=0.2,
                          languages=("en",), num_partitions=4,
                          quality_model=weights)
    assert sorted(gated.columns) == sorted(base.columns)
    nb, ng = base.count(), gated.count()
    assert 0 < ng <= nb  # a gate can only shrink the corpus
