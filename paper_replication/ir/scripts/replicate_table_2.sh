#!/usr/bin/env bash
# IR paper Table 2: patch-size sweep 25..150
set -euo pipefail
DATA_PATH=${1:?usage: replicate_table_2.sh <data_path> <working_dir>}
WORK_DIR=${2:?}
for PATCH in 25 50 75 100 125 150; do
  python -m multimodalanalytical_tpu.cli.training \
    working_dir="$WORK_DIR" job_name="table2_patch_${PATCH}" \
    data=ir/patches data_path="$DATA_PATH" \
    data.IR.preprocessor_arguments.patch_size="$PATCH" \
    model=custom_model molecules=True
done
