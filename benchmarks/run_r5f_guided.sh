#!/usr/bin/env bash
# synth4k flagship retrain redo + guided A/B (round 5). The first synth4k
# attempt ran concurrently with heavy CPU verification work on this 1-core
# host; the host loader starved (59 samples/s vs ~2300) and the stage hit
# its timeout before any checkpoint landed, cascading into the guided
# stages. This redo runs with the core free and a longer bound.
# Usage: run_r5f_guided.sh [workdir] [wait_pid]
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
  echo "waiting for pid $2 ..." | tee -a "$WORK/logs/driver.log"
  tail --pid="$2" -f /dev/null
fi

run 2700 synth4k_redo python -m multimodalanalytical_tpu.cli.training \
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
run 3600 guided_fs python benchmarks/accuracy/guided_exact_vs_surrogate.py /tmp/guided_fs \
  --checkpoint "$WORK/synth4k/checkpoints/best" \
  --preprocessor "$WORK/synth4k/preprocessor.json" \
  --data /tmp/synth_ir_dataset --flagship --limit 256

echo "r5f done; logs in $WORK/logs" | tee -a "$WORK/logs/driver.log"
