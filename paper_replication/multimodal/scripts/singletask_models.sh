#!/usr/bin/env bash
# Multimodal paper: singletask models (IR / 1H / 13C / all)
# (reference paper_replication/multimodal/scripts/singletask_models.sh)
set -euo pipefail
DATA_PATH=${1:?usage: singletask_models.sh <data_path> <working_dir>}
WORK_DIR=${2:?}
for DATA in multimodal/ir multimodal/hnmr multimodal/carbon multimodal/multimodal; do
  NAME=$(echo "$DATA" | tr '/' '_')
  python -m multimodalanalytical_tpu.cli.training \
    working_dir="$WORK_DIR" job_name="singletask_${NAME}" \
    data="$DATA" data_path="$DATA_PATH" \
    model=custom_model molecules=True
done
