#!/usr/bin/env bash
# Driver-round-4 continuation backlog (host was re-provisioned: .jax_cache
# and /tmp wiped; the binary-mixture 98.5% evidence is already in
# RESULTS.md). Remaining VERDICT r3 items, in priority order:
#   1. bench.py             — re-warm the compile cache for the round-end
#                             driver bench (cold ~13 min; server-side
#                             remote-compile cache makes repeats fast).
#   2. exp_remat A/B        — base vs matmulonly vs pallasdrop: the
#                             compute-side train-step question (PROFILE
#                             round 7; VERDICT r3 item 2).
#   3. ternary mixture      — never-trained row (VERDICT r3 item 1), 6M
#                             sample budget + beam-10 eval on 10k unseen
#                             ternary mixtures.
#   4. multitask_w_pure     — never-trained row, 6x1M budget + blended and
#                             balanced-only beam-10 evals.
#   5. synth4k retrain      — flagship IR checkpoint (wiped) + guided
#                             surrogate predict on TPU.
#   6. guided flagship A/B  — exact-vs-surrogate at d512 on CPU
#                             (VERDICT r3 item 3; exact mode cannot run on
#                             the axon runtime).
# All TPU stages run strictly sequentially (single-client tunnel).
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=$(mkdir -p "${1:-/tmp/tpu_backlog}" && cd "${1:-/tmp/tpu_backlog}" && pwd)
mkdir -p "$WORK/logs"

run() {
  local name=$1; shift
  echo "=== [$name] START $(date -u +%H:%M:%S) $*" | tee -a "$WORK/logs/driver.log"
  ( "$@" ) >"$WORK/logs/$name.log" 2>&1
  echo "=== [$name] rc=$? $(date -u +%H:%M:%S)" | tee -a "$WORK/logs/driver.log"
}

# 1. bench + cache warm (also the safety net for the round-end driver bench)
run bench python bench.py

# 2. PROFILE round-7 A/B: compute-side train-step question
run exp_remat7 python benchmarks/exp_remat.py base matmulonly pallasdrop

# 3. datasets (CPU; regenerated after the wipe)
if [ ! -d /tmp/synth_ir_50k ]; then
  run make50k python benchmarks/accuracy/make_dataset.py --n 50000 --out /tmp/synth_ir_50k
fi

# 4. ternary mixture row (VERDICT r3 item 1 remainder)
run mix_ternary python -m multimodalanalytical_tpu.cli.training \
  working_dir="$WORK" job_name=mix_ternary \
  data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
  mixture=ir/ternary model=custom_model_align splitting=unique_target \
  molecules=True trainer.epochs=1 \
  mixture.balanced.train_max_n_samples=6000000 \
  trainer.val_check_interval=5000 trainer.checkpoint_every_n_vals=5
run eval_ternary python -m multimodalanalytical_tpu.cli.predict \
  working_dir="$WORK" job_name=eval_ternary \
  data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
  mixture=ir/ternary model=custom_model_align splitting=unique_target \
  molecules=True \
  preprocessor_path="$WORK/mix_ternary/preprocessor.json" \
  model.model_checkpoint_path="$WORK/mix_ternary/checkpoints/best"

# 5. multitask_w_pure row
run mix_multitask python -m multimodalanalytical_tpu.cli.training \
  working_dir="$WORK" job_name=mix_multitask \
  data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
  mixture=ir/multitask_w_pure model=custom_model_align splitting=unique_target \
  molecules=True trainer.epochs=1 \
  mixture.balanced.train_max_n_samples=1000000 \
  mixture.unbalanced_4_6.train_max_n_samples=1000000 \
  mixture.unbalanced_3_7.train_max_n_samples=1000000 \
  mixture.unbalanced_2_8.train_max_n_samples=1000000 \
  mixture.unbalanced_1_9.train_max_n_samples=1000000 \
  mixture.unbalanced_0_10.train_max_n_samples=1000000 \
  trainer.val_check_interval=5000 trainer.checkpoint_every_n_vals=5
# Blended eval (round-robin over all 6 ratio modes, ~1700 each = ~10k)
run eval_multitask python -m multimodalanalytical_tpu.cli.predict \
  working_dir="$WORK" job_name=eval_multitask \
  data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
  mixture=ir/multitask_w_pure model=custom_model_align splitting=unique_target \
  molecules=True \
  mixture.balanced.test_max_n_samples=1700 \
  mixture.unbalanced_4_6.test_max_n_samples=1700 \
  mixture.unbalanced_3_7.test_max_n_samples=1700 \
  mixture.unbalanced_2_8.test_max_n_samples=1700 \
  mixture.unbalanced_1_9.test_max_n_samples=1700 \
  mixture.unbalanced_0_10.test_max_n_samples=1700 \
  preprocessor_path="$WORK/mix_multitask/preprocessor.json" \
  model.model_checkpoint_path="$WORK/mix_multitask/checkpoints/best"
# Balanced-only eval (comparable to the binary row; normalize matches training)
run eval_multitask_bal python -m multimodalanalytical_tpu.cli.predict \
  working_dir="$WORK" job_name=eval_multitask_bal \
  data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
  mixture=ir/binary mixture.balanced.normalize=True \
  model=custom_model_align splitting=unique_target molecules=True \
  preprocessor_path="$WORK/mix_multitask/preprocessor.json" \
  model.model_checkpoint_path="$WORK/mix_multitask/checkpoints/best"

# 6. synth4k flagship retrain (checkpoints wiped) + on-TPU guided predict
if [ ! -d /tmp/synth_ir_dataset ]; then
  run make4k python benchmarks/accuracy/make_dataset.py --n 4000
fi
run synth4k python -m multimodalanalytical_tpu.cli.training \
  working_dir="$WORK" job_name=synth4k \
  data=ir/patches data_path=/tmp/synth_ir_dataset \
  model=custom_model trainer.epochs=120 \
  trainer.early_stopping_patience=25 trainer.checkpoint_every_n_vals=15
run synth4k_guided python -m multimodalanalytical_tpu.cli.predict \
  working_dir="$WORK" job_name=synth4k_guided \
  data=ir/patches data_path=/tmp/synth_ir_dataset \
  model=custom_model model.guided_generation=True \
  preprocessor_path="$WORK/synth4k/preprocessor.json" \
  model.model_checkpoint_path="$WORK/synth4k/checkpoints/best"

# 7. flagship-scale exact-vs-surrogate (CPU backend; VERDICT r3 item 3)
run guided_fs python benchmarks/accuracy/guided_exact_vs_surrogate.py /tmp/guided_fs \
  --checkpoint "$WORK/synth4k/checkpoints/best" \
  --preprocessor "$WORK/synth4k/preprocessor.json" \
  --data /tmp/synth_ir_dataset --flagship --limit 256

echo "r4 session backlog done; logs in $WORK/logs" | tee -a "$WORK/logs/driver.log"
