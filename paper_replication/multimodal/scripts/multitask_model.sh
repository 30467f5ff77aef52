#!/usr/bin/env bash
# Multimodal paper: multitask model with modality dropout over IR/1H/13C
# (reference paper_replication/multimodal/scripts/multitask_model.sh:21-36)
set -euo pipefail
DATA_PATH=${1:?usage: multitask_model.sh <data_path> <working_dir>}
WORK_DIR=${2:?}
python -m multimodalanalytical_tpu.cli.training \
  working_dir="$WORK_DIR" job_name=multitask \
  data=multimodal/multimodal data_path="$DATA_PATH" \
  "modality_dropout=[IR,Multiplets,Carbon]" \
  model=custom_model molecules=True
