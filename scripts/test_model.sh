#!/usr/bin/env bash
# Generic predict wrapper: ./test_model.sh <data_group> <data_path> <working_dir> <ckpt> <preprocessor> [overrides...]
set -euo pipefail
export TOKENIZERS_PARALLELISM=false
DATA=${1:?usage: test_model.sh <data_group> <data_path> <working_dir> <ckpt> <preprocessor> [overrides...]}
DATA_PATH=${2:?}
WORK_DIR=${3:?}
CKPT=${4:?}
PREP=${5:?}
shift 5
python -m multimodalanalytical_tpu.cli.predict \
  data="$DATA" data_path="$DATA_PATH" working_dir="$WORK_DIR" \
  model.model_checkpoint_path="$CKPT" preprocessor_path="$PREP" "$@"
