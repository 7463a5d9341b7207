#!/usr/bin/env bash
# Package the engine and run the pipeline via spark-submit --py-files
# (the north-rule deployment shape). Locally this still runs in-process;
# on a cluster pass --master/--deploy-mode/--num-executors as usual.
# Usage: submit.sh [spark-submit options] [-- pipeline args]
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f timberjack_spark.zip
zip -qr timberjack_spark.zip timberjack_spark -x '*__pycache__*'
SUBMIT_OPTS=()
PIPELINE_ARGS=()
seen_sep=0
for arg in "$@"; do
  if [[ $seen_sep -eq 0 && "$arg" == "--" ]]; then
    seen_sep=1
  elif [[ $seen_sep -eq 0 ]]; then
    SUBMIT_OPTS+=("$arg")
  else
    PIPELINE_ARGS+=("$arg")
  fi
done
exec spark-submit --py-files timberjack_spark.zip \
  ${SUBMIT_OPTS[@]+"${SUBMIT_OPTS[@]}"} \
  jobs/run_pipeline.py \
  ${PIPELINE_ARGS[@]+"${PIPELINE_ARGS[@]}"}
