#!/usr/bin/env bash
# Clean unguided synth4k predict: the training-run's own test decode ran
# with the short-lived mis-lowering kernel build (val greedy 83.1% vs test
# beam 3.6% was the tell; the guided predict with the batch-major kernel
# landed 83.25%), so its metrics file is garbage. Re-decode unguided for
# the guided-vs-unguided comparison row.
# Usage: run_r5j_unguided.sh [workdir] [wait_pid]
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

run 1500 synth4k_unguided python -m multimodalanalytical_tpu.cli.predict \
  working_dir="$WORK" job_name=synth4k_unguided \
  data=ir/patches data_path=/tmp/synth_ir_dataset \
  model=custom_model \
  preprocessor_path="$WORK/synth4k/preprocessor.json" \
  model.model_checkpoint_path="$WORK/synth4k/checkpoints/best"

echo "r5j done; logs in $WORK/logs" | tee -a "$WORK/logs/driver.log"
