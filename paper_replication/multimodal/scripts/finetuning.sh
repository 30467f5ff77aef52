#!/usr/bin/env bash
# Multimodal paper: finetune with unique-target splitting
# (reference paper_replication/multimodal/scripts/finetuning.sh:21-46)
set -euo pipefail
DATA_PATH=${1:?usage: finetuning.sh <data_path> <working_dir> <pretrained_ckpt>}
WORK_DIR=${2:?}
CKPT=${3:?}
python -m multimodalanalytical_tpu.cli.training \
  working_dir="$WORK_DIR" job_name=finetune_unique_target \
  data=multimodal/multimodal data_path="$DATA_PATH" \
  splitting=unique_target finetuning=True \
  model=custom_model model.model_checkpoint_path="$CKPT" \
  molecules=True
