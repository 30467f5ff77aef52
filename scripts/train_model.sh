#!/usr/bin/env bash
# Generic training wrapper: ./train_model.sh <data_group> <data_path> <working_dir> [extra overrides...]
set -euo pipefail
export TOKENIZERS_PARALLELISM=false
DATA=${1:?usage: train_model.sh <data_group> <data_path> <working_dir> [overrides...]}
DATA_PATH=${2:?}
WORK_DIR=${3:?}
shift 3
python -m multimodalanalytical_tpu.cli.training \
  data="$DATA" data_path="$DATA_PATH" working_dir="$WORK_DIR" "$@"
