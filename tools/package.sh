#!/usr/bin/env bash
# Build the spark-submit --py-files artifact (north_rule packaging leg).
#
#   tools/package.sh [outdir]        # -> outdir/easyner_spark.zip
#
# Cluster usage:
#   spark-submit --master yarn --deploy-mode cluster \
#     --py-files easyner_spark.zip \
#     --conf spark.sql.adaptive.enabled=true \
#     --conf spark.sql.adaptive.skewJoin.enabled=true \
#     run_job.py --config job.json
# where run_job.py is a two-liner:
#   from easyner_spark.cli import main; main()
set -euo pipefail
repo="$(cd "$(dirname "$0")/.." && pwd)"
out="${1:-$repo/dist}"
mkdir -p "$out"
rm -f "$out/easyner_spark.zip"
(cd "$repo" && zip -qr "$out/easyner_spark.zip" easyner_spark -x '*__pycache__*')
echo "$out/easyner_spark.zip"
unzip -l "$out/easyner_spark.zip" | tail -3
