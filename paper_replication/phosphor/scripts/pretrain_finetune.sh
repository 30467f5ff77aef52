#!/usr/bin/env bash
# Phosphor paper: pretrain on simulated 31P then finetune on experimental.
set -euo pipefail
SIM_PATH=${1:?usage: pretrain_finetune.sh <simulated_path> <experimental_path> <working_dir>}
EXP_PATH=${2:?}
WORK_DIR=${3:?}
python -m multimodalanalytical_tpu.cli.training \
  working_dir="$WORK_DIR" job_name=pretrain_sim \
  data=phosphor/formula_num data_path="$SIM_PATH" \
  model=custom_model molecules=True
python -m multimodalanalytical_tpu.cli.training \
  working_dir="$WORK_DIR" job_name=finetune_exp \
  data=phosphor/formula_num data_path="$EXP_PATH" \
  finetuning=True \
  model=custom_model \
  model.model_checkpoint_path="$WORK_DIR/pretrain_sim/checkpoints/best" \
  molecules=True
