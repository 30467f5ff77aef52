#!/usr/bin/env bash
# Beam-30 retry + cache re-warm (round 5). The first beam30 attempt died in
# Mosaic lowering: at K=30 the update kernel's rows-per-program fell to 4,
# putting an illegal (2, 4, 256) block on the fresh_row_scales operand
# (CPU interpret mode never enforces TPU tiling, so the K=30 CPU tests
# passed). Fixed in ops/beam_attention.py (full-array s_sel block +
# tile-legal rows selection + XLA fallback gate); this runner re-drives
# the table-4 analogue end-to-end on the chip and re-warms the compile
# cache for the changed decode HLO before the round-end driver bench.
# Usage: run_r5e_beam30.sh [workdir] [wait_pid]
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

run 5400 beam30_retry python -m multimodalanalytical_tpu.cli.predict \
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

# Re-warm the compile cache for the kernel-fix HLO (beam-10 decode graphs
# changed too) so the round-end driver bench never pays the recompile.
run 5400 bench_rewarm python bench.py

echo "r5e done; logs in $WORK/logs" | tee -a "$WORK/logs/driver.log"
