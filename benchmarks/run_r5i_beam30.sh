#!/usr/bin/env bash
# Second beam-30 retry: the first retry crashed the remote Mosaic compiler
# on a dynamic ref slice; the scale operand is now batch-major so every
# block is statically tile-legal. Runs after r5h drains.
# Usage: run_r5i_beam30.sh [workdir] [wait_pid]
set -uo pipefail
export PATH=/opt/venv/bin:$PATH
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
  echo "waiting for pid $2 ..." | tee -a "$WORK/logs/driver.log"
  tail --pid="$2" -f /dev/null
fi

run 5400 beam30_retry2 python -m multimodalanalytical_tpu.cli.predict \
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

echo "r5i done; logs in $WORK/logs" | tee -a "$WORK/logs/driver.log"
