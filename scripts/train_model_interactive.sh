#!/usr/bin/env bash
# Interactive (foreground) IR-recipe training run — the quick-iteration
# variant of train_model.sh with the paper defaults baked in
# (reference scripts/train_model_interactive.sh, minus the LSF specifics:
# runs are launched directly here, not through bsub).
# Usage: ./train_model_interactive.sh <working_dir> <job_name> <data_path> [overrides...]
set -euo pipefail
export TOKENIZERS_PARALLELISM=false
TOP_DIR=${1:?usage: train_model_interactive.sh <working_dir> <job_name> <data_path> [overrides...]}
EXP_DIR=${2:?}
DATA_PATH=${3:?}
shift 3
python -m multimodalanalytical_tpu.cli.training \
  working_dir="$TOP_DIR" \
  job_name="$EXP_DIR" \
  data_path="$DATA_PATH" \
  data=ir/patches \
  model=custom_model \
  molecules=True \
  trainer.epochs=60 \
  model.lr=5e-4 \
  "$@"
