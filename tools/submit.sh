#!/usr/bin/env bash
# Package the engine and run the pipeline via spark-submit --py-files
# (the north-rule deployment shape). Locally this still runs in-process;
# on a cluster pass --master/--deploy-mode/--num-executors as usual.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f timberjack_spark.zip
zip -qr timberjack_spark.zip timberjack_spark -x '*__pycache__*'
exec spark-submit --py-files timberjack_spark.zip "$@" jobs/run_pipeline.py "${ARGS[@]:-}"
