#!/usr/bin/env bash
# Round-4 closing backlog (host re-provisioned again: /tmp and .jax_cache
# wiped; binary-mixture 98.5% and PROFILE round 7 are already committed).
# Remaining VERDICT r3 items, strictly sequential on the single-client
# tunnel, each stage under a hard timeout so the round-end driver bench
# can never collide with a runaway stage:
#   1. bench.py            — re-warm the compile cache (cold ~13 min).
#   2. ternary mixture     — never-trained row; 3.5M-sample budget
#                            (binary trajectory: 20.2% val @3.8M) + beam-10
#                            eval on 10k unseen ternary mixtures.
#   3. multitask_w_pure    — never-trained row; 6x400k budget + blended and
#                            balanced-only beam-10 evals.
#   4. synth4k retrain     — flagship IR checkpoint (wiped) + on-TPU guided
#                            surrogate predict.
#   5. guided flagship A/B — exact-vs-surrogate at d512 on CPU (VERDICT r3
#                            item 3; exact mode cannot run on axon).
# Dataset regeneration (CPU-only) overlaps the bench warm; all TPU stages
# are sequential.
set -uo pipefail
cd "$(dirname "$0")/.."
WORK=$(mkdir -p "${1:-/tmp/tpu_backlog}" && cd "${1:-/tmp/tpu_backlog}" && pwd)
mkdir -p "$WORK/logs"

run() {
  local tmo=$1 name=$2; shift 2
  echo "=== [$name] START $(date -u +%H:%M:%S) timeout=${tmo}s" | tee -a "$WORK/logs/driver.log"
  ( timeout "$tmo" "$@" ) >"$WORK/logs/$name.log" 2>&1
  echo "=== [$name] rc=$? $(date -u +%H:%M:%S)" | tee -a "$WORK/logs/driver.log"
}

# datasets (CPU; regenerated after the wipe) — overlap the bench warm
(
  [ -d /tmp/synth_ir_50k ] || timeout 2400 python benchmarks/accuracy/make_dataset.py --n 50000 --out /tmp/synth_ir_50k
  [ -d /tmp/synth_ir_dataset ] || timeout 900 python benchmarks/accuracy/make_dataset.py --n 4000
) >"$WORK/logs/datasets.log" 2>&1 &
DATA_PID=$!

# 1. bench + cache warm (the safety net for the round-end driver bench)
run 5400 bench python bench.py

wait "$DATA_PID"
echo "=== datasets ready $(date -u +%H:%M:%S)" | tee -a "$WORK/logs/driver.log"

# 2. ternary mixture row
run 2700 mix_ternary python -m multimodalanalytical_tpu.cli.training \
  working_dir="$WORK" job_name=mix_ternary \
  data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
  mixture=ir/ternary model=custom_model_align splitting=unique_target \
  molecules=True trainer.epochs=1 \
  mixture.balanced.train_max_n_samples=3500000 \
  trainer.val_check_interval=2500 trainer.checkpoint_every_n_vals=4
run 1800 eval_ternary python -m multimodalanalytical_tpu.cli.predict \
  working_dir="$WORK" job_name=eval_ternary \
  data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
  mixture=ir/ternary model=custom_model_align splitting=unique_target \
  molecules=True \
  preprocessor_path="$WORK/mix_ternary/preprocessor.json" \
  model.model_checkpoint_path="$WORK/mix_ternary/checkpoints/best"

# 3. multitask_w_pure row (6 ratio modes incl. pure 0:10)
run 2400 mix_multitask python -m multimodalanalytical_tpu.cli.training \
  working_dir="$WORK" job_name=mix_multitask \
  data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
  mixture=ir/multitask_w_pure model=custom_model_align splitting=unique_target \
  molecules=True trainer.epochs=1 \
  mixture.balanced.train_max_n_samples=400000 \
  mixture.unbalanced_4_6.train_max_n_samples=400000 \
  mixture.unbalanced_3_7.train_max_n_samples=400000 \
  mixture.unbalanced_2_8.train_max_n_samples=400000 \
  mixture.unbalanced_1_9.train_max_n_samples=400000 \
  mixture.unbalanced_0_10.train_max_n_samples=400000 \
  trainer.val_check_interval=2500 trainer.checkpoint_every_n_vals=4
# Blended eval (round-robin over all 6 ratio modes, ~1700 each = ~10k)
run 1800 eval_multitask python -m multimodalanalytical_tpu.cli.predict \
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
run 900 eval_multitask_bal python -m multimodalanalytical_tpu.cli.predict \
  working_dir="$WORK" job_name=eval_multitask_bal \
  data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
  mixture=ir/binary mixture.balanced.normalize=True \
  model=custom_model_align splitting=unique_target molecules=True \
  preprocessor_path="$WORK/mix_multitask/preprocessor.json" \
  model.model_checkpoint_path="$WORK/mix_multitask/checkpoints/best"

# 4. synth4k flagship retrain (checkpoints wiped) + on-TPU guided predict
run 1500 synth4k python -m multimodalanalytical_tpu.cli.training \
  working_dir="$WORK" job_name=synth4k \
  data=ir/patches data_path=/tmp/synth_ir_dataset \
  model=custom_model trainer.epochs=120 \
  trainer.early_stopping_patience=25 trainer.checkpoint_every_n_vals=15
run 1200 synth4k_guided python -m multimodalanalytical_tpu.cli.predict \
  working_dir="$WORK" job_name=synth4k_guided \
  data=ir/patches data_path=/tmp/synth_ir_dataset \
  model=custom_model model.guided_generation=True \
  preprocessor_path="$WORK/synth4k/preprocessor.json" \
  model.model_checkpoint_path="$WORK/synth4k/checkpoints/best"

# 5. flagship-scale exact-vs-surrogate (CPU backend; VERDICT r3 item 3)
run 2400 guided_fs python benchmarks/accuracy/guided_exact_vs_surrogate.py /tmp/guided_fs \
  --checkpoint "$WORK/synth4k/checkpoints/best" \
  --preprocessor "$WORK/synth4k/preprocessor.json" \
  --data /tmp/synth_ir_dataset --flagship --limit 256

echo "r4b session backlog done; logs in $WORK/logs" | tee -a "$WORK/logs/driver.log"
