#!/usr/bin/env bash
# IR paper Table 3: augmentation ablations (none/horizontal/smooth/smiles/combined)
set -euo pipefail
DATA_PATH=${1:?usage: replicate_table_3.sh <data_path> <working_dir>}
WORK_DIR=${2:?}
for AUG in no_augment ir/horizontal ir/smooth ir/smiles ir/combined; do
  NAME=$(echo "$AUG" | tr '/' '_')
  python -m multimodalanalytical_tpu.cli.training \
    working_dir="$WORK_DIR" job_name="table3_${NAME}" \
    data=ir/patches data_path="$DATA_PATH" \
    augment="$AUG" model=custom_model molecules=True
done
