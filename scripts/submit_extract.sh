#!/usr/bin/env bash
# Deploy contract (BASELINE.json): spark-submit --py-files on a multi-
# executor cluster. Locally this runs the same artifact on local[N].
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(python "$ROOT/scripts/build_pyfiles.py")"
INPUT="${1:?usage: submit_extract.sh <pages_parquet> <articles_out> [ckpt_dir]}"
OUTPUT="${2:?}"
CKPT="${3:-}"
MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=512 \
  --conf spark.sql.adaptive.enabled=true \
  "$ROOT/scripts/extract_job.py" \
  --input "$INPUT" --output "$OUTPUT" ${CKPT:+--checkpoint "$CKPT"}
