#!/usr/bin/env bash
# Per-ratio-mode evals of the multitask_w_pure checkpoint (reference
# tables 2/3 report one row per ratio mode; replicate_table_2_and_3.sh).
# Each mode is one bounded predict run over 5k unseen mixtures drawn with
# that mode's ratio; the pure row (0:10) measures pure-compound recovery.
# Usage: run_r5d_permode.sh [workdir] [wait_pid]
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

if [ -n "${2:-}" ]; then
  echo "waiting for pid $2 (main session runner) ..." | tee -a "$WORK/logs/driver.log"
  tail --pid="$2" -f /dev/null
fi

for mode in "u46:[0.4,0.6]" "u37:[0.3,0.7]" "u28:[0.2,0.8]" "u19:[0.1,0.9]" "pure:[0.0,1.0]"; do
  name="${mode%%:*}"; ratio="${mode#*:}"
  run 1800 permode_$name python -m multimodalanalytical_tpu.cli.predict \
    working_dir="$WORK" job_name=permode_$name \
    data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
    mixture=ir/binary mixture.balanced.normalize=True \
    "mixture.balanced.compounds_ratio=$ratio" \
    mixture.balanced.test_max_n_samples=5000 \
    model=custom_model_align splitting=unique_target molecules=True \
    preprocessor_path="$WORK/mix_multitask/preprocessor.json" \
    model.model_checkpoint_path="$WORK/mix_multitask/checkpoints/best"
done
# balanced row: already measured at 10k as eval_multitask_bal (no override)

echo "per-mode evals done" | tee -a "$WORK/logs/driver.log"
