#!/usr/bin/env bash
# IR paper: 5-fold finetuning of a pretrained checkpoint on experimental data.
set -euo pipefail
DATA_PATH=${1:?usage: finetune_5fold.sh <data_path> <working_dir> <pretrained_ckpt>}
WORK_DIR=${2:?}
CKPT=${3:?}
for FOLD in 0 1 2 3 4; do
  python -m multimodalanalytical_tpu.cli.training \
    working_dir="$WORK_DIR" job_name="finetune_fold_${FOLD}" \
    data=ir/patches data_path="$DATA_PATH" \
    cv_split="$FOLD" finetuning=True \
    model=custom_model model.model_checkpoint_path="$CKPT" \
    molecules=True
done
