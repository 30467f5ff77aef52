#!/usr/bin/env bash
# Phosphor paper: from-scratch 5-fold x data-representation variants
# (reference paper_replication/phosphor/scripts)
set -euo pipefail
DATA_PATH=${1:?usage: from_scratch_5fold.sh <data_path> <working_dir>}
WORK_DIR=${2:?}
for DATA in phosphor/num phosphor/formula_num phosphor/formula_txt; do
  NAME=$(echo "$DATA" | tr '/' '_')
  for FOLD in 0 1 2 3 4; do
    python -m multimodalanalytical_tpu.cli.training \
      working_dir="$WORK_DIR" job_name="${NAME}_fold_${FOLD}" \
      data="$DATA" data_path="$DATA_PATH" cv_split="$FOLD" \
      model=custom_model molecules=True
  done
done
