#!/usr/bin/env python
"""Multimodal + output-sharding tour: real PNG/WAV/motion-PNG payloads
through decode -> feature-extract -> resize, then byte-balanced shard
assignment for the curated output. Everything synthesized with the
repo's own codecs — no external data or imaging libraries."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from go_readability_spark.operators.multimodal import (
    extract_media_features,
    resize_images,
    synth_real_media_dataframe,
)
from go_readability_spark.operators.sharding import shard_stats
from go_readability_spark.plans import build_session

spark = build_session(master="local[4]")

media = synth_real_media_dataframe(spark, n=24, seed=42)
print("media table:")
media.select("media_id", "kind", "mime", F.length("payload").alias("bytes")).show(6)

print("decoded features (real codecs — WAV frames, video frame counts):")
feats = extract_media_features(media, fake=True)
feats.select("media_id", "kind", "n_bytes", "frames").show(9)

print("resize the images to 4x4 (box average):")
images = media.where(F.col("kind") == "image")
resize_images(images, 4, 4).select("media_id", "width", "height", "ok").show(4)

print("byte-balanced shard assignment (2 KiB target):")
sized = media.select("media_id", F.length("payload").alias("n_bytes"))
shard_stats(sized, "n_bytes", "media_id", target_bytes=2048, block_size=8).show()

spark.stop()
