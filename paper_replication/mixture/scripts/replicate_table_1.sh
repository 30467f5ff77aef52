#!/usr/bin/env bash
# Mixture paper Table 1: align-head ablation grid (network x loss x lambda)
# (reference paper_replication/mixture/scripts/replicate_table_1.sh:23-53)
set -euo pipefail
DATA_PATH=${1:?usage: replicate_table_1.sh <data_path> <working_dir>}
WORK_DIR=${2:?}
for NETWORK in convolutional mlp; do
  for LOSS in mse mae sid; do
    for LAMBDA in 1 10 50; do
      python -m multimodalanalytical_tpu.cli.training \
        working_dir="$WORK_DIR" \
        job_name="align_${NETWORK}_${LOSS}_l${LAMBDA}" \
        data=ir/patches_mixture_text_align data_path="$DATA_PATH" \
        mixture=ir/binary \
        model=custom_model_align \
        model.align_config.align_network="$NETWORK" \
        model.align_config.loss_function="$LOSS" \
        model.align_config.loss_lambda="$LAMBDA" \
        molecules=True
    done
  done
done
