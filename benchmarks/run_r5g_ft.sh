#!/usr/bin/env bash
# Re-run the two finetune folds lost to the log-drain hang (round 5; fixed
# in training/trainer.py: post-restore transfer flush + bounded drain).
# Usage: run_r5g_ft.sh [workdir] [wait_pid]
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

for cv in 0 1; do
  run 1500 ft_cv${cv}_retry python -m multimodalanalytical_tpu.cli.training \
    working_dir="$WORK" job_name=ft_cv$cv \
    finetuning=True data=ir/patches data_path=/tmp/synth_ir_shift \
    model=custom_model model.lr=1e-3 \
    model.model_checkpoint_path="$WORK/pretrain50k/checkpoints/best" \
    preprocessor_path="$WORK/pretrain50k/preprocessor.json" \
    molecules=True trainer.epochs=30 cv_split=$cv \
    trainer.checkpoint_every_n_vals=10
done

echo "r5g done; logs in $WORK/logs" | tee -a "$WORK/logs/driver.log"
