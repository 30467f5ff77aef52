#!/usr/bin/env bash
# IR paper Table 1: positional-encoding x gated-linear ablation grid on the
# synthetic pretraining set (reference paper_replication/ir/scripts/replicate_table_1.sh).
set -euo pipefail
DATA_PATH=${1:?usage: replicate_table_1.sh <data_path> <working_dir>}
WORK_DIR=${2:?}
for POS_ENC in sin_cos learned; do
  for GATED in False True; do
    python -m multimodalanalytical_tpu.cli.training \
      working_dir="$WORK_DIR" \
      job_name="table1_pos_${POS_ENC}_gated_${GATED}" \
      data=ir/patches data_path="$DATA_PATH" \
      model=custom_model \
      model.positional_encoding_type="$POS_ENC" \
      model.gated_linear="$GATED" \
      molecules=True
  done
done
