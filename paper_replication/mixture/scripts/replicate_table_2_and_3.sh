#!/usr/bin/env bash
# Mixture paper Tables 2 & 3: multitask-with-pure (Table 2) or ternary
# (Table 3) mixtures — align-head pretrain on synthetic mixtures, then
# 5-fold finetune with Percentage class metrics.
# (reference paper_replication/mixture/scripts/replicate_table_2_and_3.sh)
set -euo pipefail
RUN_DIR=${1:?usage: replicate_table_2_and_3.sh <run_dir> <pretrain_data> <finetune_data> <task: multitask_w_pure|ternary>}
PRETRAIN_DATA=${2:?}
FINETUNE_DATA=${3:?}
TASK=${4:?}

LR=1e-3
PATCH=75
NET=mlp
LOSS=mse
LAMBDA=5

echo "Pretraining ${TASK} with alignment head"
python -m multimodalanalytical_tpu.cli.training \
  working_dir="$RUN_DIR" \
  job_name="$TASK" \
  data_path="$PRETRAIN_DATA" \
  data=ir/patches_mixture_text_align \
  mixture="ir/${TASK}" \
  model=custom_model_align \
  molecules=True \
  splitting=unique_target \
  trainer.val_check_interval=1000 \
  trainer.early_stopping_patience=99 \
  model.lr="$LR" \
  data.IR.preprocessor_arguments.patch_size="$PATCH" \
  model.positional_encoding_type=learned \
  model.gated_linear=True \
  model.optimiser=adamw \
  model.align_config.align_network="$NET" \
  model.align_config.loss_function="$LOSS" \
  model.align_config.loss_lambda="$LAMBDA"

for CV in 0 1 2 3 4; do
  echo "Finetuning ${TASK} cv_split ${CV}"
  python -m multimodalanalytical_tpu.cli.training \
    working_dir="$RUN_DIR/$TASK" \
    job_name="cv_split_${CV}" \
    data_path="$FINETUNE_DATA" \
    cv_split="$CV" \
    data=ir/patches_mixture_text_align \
    mixture="ir/${TASK}" \
    model=custom_model_align \
    molecules=True \
    splitting=unique_target \
    predict_class=Percentage \
    finetuning=True \
    trainer.val_check_interval=1000 \
    trainer.early_stopping_patience=20 \
    model.lr="$LR" \
    model.batch_size=64 \
    data.IR.preprocessor_arguments.patch_size="$PATCH" \
    model.positional_encoding_type=learned \
    model.gated_linear=True \
    model.optimiser=adamw \
    model.align_config.align_network="$NET" \
    model.align_config.loss_function="$LOSS" \
    model.align_config.loss_lambda="$LAMBDA" \
    preprocessor_path="$RUN_DIR/$TASK/preprocessor.json" \
    model.model_checkpoint_path="$RUN_DIR/$TASK/checkpoints/best"
done
