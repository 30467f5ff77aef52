#!/usr/bin/env bash
# Round-5 closing backlog (host re-provisioned: /tmp, /opt/venv moved,
# .jax_cache wiped; ternary row + device-side mixing already committed).
# Remaining VERDICT r4 items, strictly sequential on the single-client
# tunnel, every stage under a hard timeout so the round-end driver bench
# can never collide with a runaway stage:
#   1. mix_multitask     — the LAST missing mixture row (multitask_w_pure,
#                          6 ratio modes incl. pure 0:10). 12M-sample
#                          budget (2M per mode) on device-side mixing,
#                          under the fault supervisor. Blended +
#                          balanced-only beam-10 evals.
#   2. beam30            — table-4 analogue: one beam-30 decode of 5k
#                          unseen balanced mixtures on the multitask
#                          checkpoint; rejection row comes from the
#                          offline rescore of the same decode.
#   3. synth4k           — flagship IR checkpoint (wiped) + on-TPU guided
#                          surrogate predict.
#   4. guided flagship   — exact-vs-surrogate A/B at d512 on CPU (exact
#                          mode cannot run on axon: io_callback
#                          UNIMPLEMENTED).
#   5. finetune cycle    — pretrain on the 50k pool, then 3 folds of
#                          finetune-vs-scratch on a distribution-shifted
#                          3k set (seed 7, 6x spectral noise), mirroring
#                          reference finetuning.sh (lr 1e-3, 30 epochs).
# Usage: run_r5c_session.sh [workdir] [wait_pid]
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

# Wait for an in-flight bench warm (single-client tunnel) before any TPU work.
if [ -n "${2:-}" ]; then
  echo "waiting for pid $2 (bench warm) ..." | tee -a "$WORK/logs/driver.log"
  tail --pid="$2" -f /dev/null
fi

# 1. multitask_w_pure row — 2M samples per ratio mode (12M total), val
# capped at ~10k blended per validation to keep validation off the
# critical path (each mode's own val cap is 1700 -> 6x1700 = 10.2k).
MT_OVR=""
for m in balanced unbalanced_4_6 unbalanced_3_7 unbalanced_2_8 unbalanced_1_9 unbalanced_0_10; do
  MT_OVR="$MT_OVR mixture.$m.train_max_n_samples=2000000"
  MT_OVR="$MT_OVR mixture.$m.validation_max_n_samples=1700"
done
run 9000 mix_multitask python -m multimodalanalytical_tpu.cli.train_supervisor -- \
  working_dir="$WORK" job_name=mix_multitask \
  data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
  mixture=ir/multitask_w_pure model=custom_model_align splitting=unique_target \
  molecules=True trainer.epochs=1 $MT_OVR \
  trainer.val_check_interval=7500 trainer.checkpoint_every_n_vals=5
# Blended eval (round-robin over all 6 ratio modes, ~1700 each = ~10.2k)
MT_TST=""
for m in balanced unbalanced_4_6 unbalanced_3_7 unbalanced_2_8 unbalanced_1_9 unbalanced_0_10; do
  MT_TST="$MT_TST mixture.$m.test_max_n_samples=1700"
done
run 3600 eval_multitask python -m multimodalanalytical_tpu.cli.predict \
  working_dir="$WORK" job_name=eval_multitask \
  data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
  mixture=ir/multitask_w_pure model=custom_model_align splitting=unique_target \
  molecules=True $MT_TST \
  preprocessor_path="$WORK/mix_multitask/preprocessor.json" \
  model.model_checkpoint_path="$WORK/mix_multitask/checkpoints/best"
# Balanced-only eval (directly comparable to the binary/ternary rows)
run 3600 eval_multitask_bal python -m multimodalanalytical_tpu.cli.predict \
  working_dir="$WORK" job_name=eval_multitask_bal \
  data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
  mixture=ir/binary mixture.balanced.normalize=True \
  model=custom_model_align splitting=unique_target molecules=True \
  preprocessor_path="$WORK/mix_multitask/preprocessor.json" \
  model.model_checkpoint_path="$WORK/mix_multitask/checkpoints/best"

# 2. beam-30 decode (table-4 analogue; K=30 is an untested shape on the
# production decode path until now). One decode; the rejection row is the
# offline rescore of the same predictions JSON.
run 5400 beam30 python -m multimodalanalytical_tpu.cli.predict \
  working_dir="$WORK" job_name=beam30 \
  data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
  mixture=ir/binary mixture.balanced.normalize=True \
  mixture.balanced.test_max_n_samples=5000 \
  model=custom_model_align splitting=unique_target molecules=True \
  model.n_beams=30 \
  preprocessor_path="$WORK/mix_multitask/preprocessor.json" \
  model.model_checkpoint_path="$WORK/mix_multitask/checkpoints/best"
run 900 beam30_reject python benchmarks/accuracy/rescore_predictions.py \
  "$WORK/beam30/test_data_logits_beam_30.json" --reject \
  --out "$WORK/beam30/metrics_beam_30_reject.json"

# 3. synth4k flagship retrain (checkpoint wiped) + on-TPU guided predict
run 1800 synth4k python -m multimodalanalytical_tpu.cli.training \
  working_dir="$WORK" job_name=synth4k \
  data=ir/patches data_path=/tmp/synth_ir_dataset \
  model=custom_model trainer.epochs=120 \
  trainer.early_stopping_patience=25 trainer.checkpoint_every_n_vals=15
run 1500 synth4k_guided python -m multimodalanalytical_tpu.cli.predict \
  working_dir="$WORK" job_name=synth4k_guided \
  data=ir/patches data_path=/tmp/synth_ir_dataset \
  model=custom_model model.guided_generation=True \
  preprocessor_path="$WORK/synth4k/preprocessor.json" \
  model.model_checkpoint_path="$WORK/synth4k/checkpoints/best"

# 4. flagship-scale exact-vs-surrogate (CPU backend; VERDICT r4 item 3)
run 3600 guided_fs python benchmarks/accuracy/guided_exact_vs_surrogate.py /tmp/guided_fs \
  --checkpoint "$WORK/synth4k/checkpoints/best" \
  --preprocessor "$WORK/synth4k/preprocessor.json" \
  --data /tmp/synth_ir_dataset --flagship --limit 256

# 5. finetune cycle (VERDICT r4 item 7): pretrain at 50k scale, then
# finetune-vs-scratch on a distribution-shifted small set, 3 folds.
[ -d /tmp/synth_ir_shift ] || run 900 make_shift python benchmarks/accuracy/make_dataset.py \
  --n 3000 --seed 7 --noise 0.03 --out /tmp/synth_ir_shift
run 3600 pretrain50k python -m multimodalanalytical_tpu.cli.training \
  working_dir="$WORK" job_name=pretrain50k \
  data=ir/patches data_path=/tmp/synth_ir_50k \
  model=custom_model trainer.epochs=30 \
  trainer.early_stopping_patience=10 trainer.checkpoint_every_n_vals=10
for cv in 0 1 2; do
  run 1500 ft_cv$cv python -m multimodalanalytical_tpu.cli.training \
    working_dir="$WORK" job_name=ft_cv$cv \
    finetuning=True data=ir/patches data_path=/tmp/synth_ir_shift \
    model=custom_model model.lr=1e-3 \
    model.model_checkpoint_path="$WORK/pretrain50k/checkpoints/best" \
    preprocessor_path="$WORK/pretrain50k/preprocessor.json" \
    molecules=True trainer.epochs=30 cv_split=$cv \
    trainer.checkpoint_every_n_vals=10
  run 1500 scratch_cv$cv python -m multimodalanalytical_tpu.cli.training \
    working_dir="$WORK" job_name=scratch_cv$cv \
    data=ir/patches data_path=/tmp/synth_ir_shift \
    model=custom_model molecules=True trainer.epochs=30 cv_split=$cv \
    trainer.checkpoint_every_n_vals=10
done

echo "r5c session backlog done; logs in $WORK/logs" | tee -a "$WORK/logs/driver.log"
