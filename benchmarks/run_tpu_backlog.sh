#!/usr/bin/env bash
# One-command runner for the TPU work queued behind the axon-relay outage
# (CLAUDE.md "Driver-round-3 state"; VERDICT r2 items 1/3/5). Run ONLY
# after `python -c "from multimodalanalytical_tpu.tpu_guard import
# probe_backend_subprocess as p; print(p(240))"` reports ok — every stage
# below takes the machine-wide TPU lock itself, but probing first avoids
# a 13-minute structured failure.
#
# Stages (each logs under $WORK/logs, continues on failure):
#   1. bench.py            — refresh .jax_cache (train HLO changed: rbg
#                            dropout r2 + LayerNorm eps r3; decode graphs
#                            changed by the eps fix too -> expect full
#                            remote recompiles, 10-20 min for beam graphs)
#                            and capture the driver-style JSON.
#   2. exp_remat A/B       — base vs keydrop vs attnlayout (train-step
#                            copy elimination; PROFILE.md round-6 entry).
#   3. trace_step          — train_hlo copy re-attribution after the wins.
#   4. synth4k train+test  — IR recipe accuracy rerun incl. guided
#                            surrogate predict (the exact mode is
#                            UNIMPLEMENTED on the axon runtime - verified
#                            2026-08-17, cli/predict.py:39-56 - so exact
#                            parity evidence comes from the CPU harness:
#                            benchmarks/accuracy/guided_exact_vs_surrogate.py).
#   5. mixture extended    — 50k pool, LONGER binary run (loss was still
#                            falling at the round-3 cutoff: 50.5% Top-10
#                            vs reference 61.4%), then ternary and
#                            multitask_w_pure rows (VERDICT r2 item 5).
set -uo pipefail
cd "$(dirname "$0")/.."
# Resolve BEFORE mkdir so a relative workdir argument doesn't split the
# logs dir between the invocation cwd and the repo root.
WORK=$(mkdir -p "${1:-/tmp/tpu_backlog}" && cd "${1:-/tmp/tpu_backlog}" && pwd)
mkdir -p "$WORK/logs"
# Stage filter: "quick" = bench + A/Bs + trace only (~1h, safe to auto-run
# unattended: a driver bench arriving later will find the TPU lock free);
# "accuracy" = the multi-hour training stages only; "all" = both.
PHASE="${2:-all}"

run() {
  local name=$1; shift
  echo "=== [$name] $*" | tee -a "$WORK/logs/driver.log"
  ( "$@" ) >"$WORK/logs/$name.log" 2>&1
  echo "=== [$name] rc=$?" | tee -a "$WORK/logs/driver.log"
}

if [ "$PHASE" != "accuracy" ]; then
# 1. bench + cache refresh
run bench python bench.py

# 2. train-step A/Bs
# base already ships key-saving dropout (ops/dropout.py); flaxdrop is the
# nn.Dropout CONTROL for that A/B. rematffn recomputes the FFN's (B,L,ffn)
# saves; attnlayout drops the head-split transposes; the combo stacks both.
run exp_remat python benchmarks/exp_remat.py flaxdrop base attnlayout rematffn attnlayout_rematffn
run opt_variants python benchmarks/opt_variants.py optax optax_noclip fused flat
run trace_step python benchmarks/trace_step.py train_hlo
fi

if [ "$PHASE" = "quick" ]; then
  echo "quick phase done; logs in $WORK/logs" | tee -a "$WORK/logs/driver.log"
  exit 0
fi

# 4. accuracy rerun + guided surrogate at scale
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

# 5. mixture rows (50k pure-compound pool). A streaming-mixture "epoch" is
# the full 320M-sample stream, so runs are bounded by an explicit
# train_max_n_samples data budget (OneCycle anneals over exactly that
# budget) + mid-epoch val_check_interval, NOT by trainer.epochs.
# Device-side mixing (round 5) keeps these chip-bound (~5-6k samples/s);
# every stage runs under the fault supervisor (cli/train_supervisor):
# process death -> relay probe -> relaunch with schedule-correct resume,
# bounded at 3 restarts (VERDICT r4 item 5).
if [ ! -d /tmp/synth_ir_50k ]; then
  run make50k python benchmarks/accuracy/make_dataset.py --n 50000 --out /tmp/synth_ir_50k
fi
run mix_binary_ext python -m multimodalanalytical_tpu.cli.train_supervisor -- \
  working_dir="$WORK" job_name=mix_binary_ext \
  data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
  mixture=ir/binary model=custom_model_align splitting=unique_target \
  molecules=True trainer.epochs=1 \
  mixture.balanced.train_max_n_samples=40000000 \
  trainer.val_check_interval=10000 trainer.checkpoint_every_n_vals=5
run mix_ternary python -m multimodalanalytical_tpu.cli.train_supervisor -- \
  working_dir="$WORK" job_name=mix_ternary \
  data=ir/patches_mixture_text_align data_path=/tmp/synth_ir_50k \
  mixture=ir/ternary model=custom_model_align splitting=unique_target \
  molecules=True trainer.epochs=1 \
  mixture.balanced.train_max_n_samples=6000000 \
  trainer.val_check_interval=5000 trainer.checkpoint_every_n_vals=5
run mix_multitask python -m multimodalanalytical_tpu.cli.train_supervisor -- \
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

echo "done; logs in $WORK/logs" | tee -a "$WORK/logs/driver.log"
