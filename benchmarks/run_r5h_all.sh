#!/usr/bin/env bash
# Round-5 recovery runner: the r5d..r5g chain launched without the venv
# PATH (the image moved python to /opt/venv this session) and every stage
# died on import in milliseconds. This combines the lost backlog in
# priority order, with the interpreter pinned INSIDE the script so the
# launcher environment can never break it again:
#   1. beam-30 table-4 analogue (+offline rejection rescore) — also the
#      on-chip validation of the K=30 kernel tiling fix
#   2. synth4k flagship retrain + on-TPU guided surrogate predict
#   3. finetune folds 0/1 (lost to the log-drain hang, since fixed)
#   4. bench re-warm (decode HLO changed by the kernel fix — the
#      round-end driver bench must find a warm cache)
#   5. per-ratio-mode evals of the multitask checkpoint
#   6. flagship exact-vs-surrogate guided A/B (CPU-only, last: it owns
#      the single host core for ~40 min)
# Usage: run_r5h_all.sh [workdir]
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

# 1. beam-30 (table-4 analogue) + rejection rescore
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

# 2. synth4k flagship retrain + guided surrogate predict
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

# 3. finetune folds 0/1
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

# 4. bench re-warm (fresh decode HLO from the kernel fix)
run 5400 bench_rewarm python bench.py

# 5. per-ratio-mode evals (table-2/3 row format)
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

# 6. flagship exact-vs-surrogate guided A/B (CPU backend)
run 3600 guided_fs python benchmarks/accuracy/guided_exact_vs_surrogate.py /tmp/guided_fs \
  --checkpoint "$WORK/synth4k/checkpoints/best" \
  --preprocessor "$WORK/synth4k/preprocessor.json" \
  --data /tmp/synth_ir_dataset --flagship --limit 256

echo "r5h done; logs in $WORK/logs" | tee -a "$WORK/logs/driver.log"
