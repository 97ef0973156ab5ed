"""SparkSession builder with the configuration the extraction pipeline
wants at scale (SURVEY.md §4): Arrow transport on, small Arrow batches
(HTML rows are ~100 KB median, so 512 rows/batch keeps buffers sane),
AQE for post-shuffle coalescing, UTC session timezone."""

from __future__ import annotations

import os


def build_session(master: str | None = None, app_name: str = "go-readability-spark", **extra):
    from pyspark.sql import SparkSession

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # local mode: the driver JVM is the executor — the 1g default heap
        # OOMs under 32 concurrent HTML-heavy tasks (measured at 50k docs)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.driver.maxResultSize", "2g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "256m")
        .config("spark.ui.enabled", "false")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    return b.getOrCreate()
