"""Benchmark: flagship IR recipe throughput on one TPU chip.

Workload mirrors the reference's IR structure-elucidation recipe
(reference configs/model/custom_model.yaml + configs/data/ir/patches.yaml):
custom_model 512-d / 6+6 layers, batch 128, Formula(12 tok) + IR(14x125
patches) -> SMILES, bf16 compute. Vocab 320 and target length 48 match a
fitted SMILES tokenizer on NIST-class data (reference tokenizers land in the
~100-600 range; round 1 used an unrealistic vocab 64 / target 40).

Measured quantities:
  * jitted train step (fwd+bwd+adamw, modality-dropout in graph),
  * beam-10 decode, WORST CASE: random weights never trigger the early-exit
    bound, so the full max_length=128 loop runs — the conservative number,
  * beam-10 decode, TYPICAL: length-48 decode, approximating a trained
    model whose beams all finish by ~48 tokens (SMILES in the IR corpus are
    ~15-45 tokens; the early-exit stops the loop there).

Headline metric: combined spectra/s/chip where every spectrum is trained on
once and decoded once, using the TYPICAL-CASE decode — the baseline's
decode side is also the reference's typical case, so this is the
like-for-like ratio. The worst-case combined (full len-128 loop, no early
exit, i.e. an untrained model) is reported in `detail` alongside.

Baseline (REF_COMBINED_SPECTRA_PER_SEC = 70): an estimate for the reference
on 1x V100, derived as follows and deliberately GENEROUS to the reference —
  * train: 1.2 TFLOP/step at batch 128 (6 * 44M params * 8.4k tokens),
    ~30% MFU of 112 TFLOPs fp16 => ~36 ms/step => ~3500 spectra/s;
  * decode: the reference generates with use_cache=False (wrapper.py:450),
    re-running the decoder over the whole prefix every step. For a TRAINED
    model finishing by ~40 tokens that is ~50 TFLOP per 128-batch => ~1.7 s
    => ~75 spectra/s. (Worst-case len-128 would be ~530 TFLOP => ~7/s; we
    compare our worst case against their typical case.)
  * combined: 1/(1/3500 + 1/75) ~= 73, rounded to 70.
The phosphor paper's only published wall-clock (12 min/run on 1x V100,
reference paper_replication/phosphor/README.md:32) is consistent with the
train-side estimate within ~2x but covers a different recipe.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
"""

from __future__ import annotations

import json
import os
import time

try:
    import jax
except ModuleNotFoundError:  # pragma: no cover - environment self-heal
    # Since the 2026-08-21 re-provisioning, the interpreter with jax lives
    # at /opt/venv/bin/python while the bare `python` on PATH has no
    # packages. If a launcher (e.g. the round-end driver) invokes this
    # script with the wrong python, re-exec with the venv one instead of
    # dying on import.
    import sys

    _venv = "/opt/venv/bin/python"
    # Compare the LITERAL executable path: the venv python is a symlink to
    # the same binary (venv resolution is bin-path-based), so realpath
    # comparison would wrongly skip the re-exec.
    if os.path.exists(_venv) and sys.executable != _venv:
        os.execv(_venv, [_venv] + sys.argv)
    raise

import numpy as np

# Persistent compilation cache: decode graphs are expensive to compile on the
# remote-compile path; cached binaries make repeat bench runs start in seconds.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF_COMBINED_SPECTRA_PER_SEC = 70.0  # see module docstring for derivation

BATCH = 128
FORMULA_LEN = 12
N_PATCHES = 14
PATCH = 125
TARGET_LEN = 48
VOCAB = 320
N_BEAMS = 10
MAX_DECODE_LEN = 128
TYPICAL_DECODE_LEN = 48


def main() -> None:
    from multimodalanalytical_tpu.tpu_guard import guard_if_tpu

    # Two concurrent TPU jobs once raced the single-client relay into a
    # >10h outage (CLAUDE.md): when the session targets the axon backend,
    # hold the machine-wide lock for the whole run and probe backend init
    # in a hang-safe subprocess (a wedged relay hangs jax.devices()
    # forever; the probe turns that into a fast structured-JSON failure).
    # guard_if_tpu honors JAX_PLATFORMS=cpu FIRST (re-asserting it over the
    # sitecustomize), so a CPU smoke run never touches the lock or relay.
    guard_if_tpu(timeout_s=float(os.environ.get("BENCH_LOCK_TIMEOUT_S", 300)))

    from __graft_entry__ import _example_batch, _flagship
    from multimodalanalytical_tpu.generation.beam_search import beam_search
    from multimodalanalytical_tpu.parallel.mesh import make_mesh, shard_batch
    from multimodalanalytical_tpu.training.trainer import (
        Trainer, _device_batch, _modality_segments,
    )

    model = _flagship(d_model=512, layers=6, ffn=2048, vocab=VOCAB,
                      dtype="bfloat16")
    batch = dict(
        _example_batch(
            batch=BATCH, n_patches=N_PATCHES, patch=PATCH,
            formula_len=FORMULA_LEN, target_len=TARGET_LEN, vocab=VOCAB,
        ),
        n_valid=BATCH,
    )

    mesh = make_mesh()

    class _Tok:
        def batch_decode(self, ids, skip_special_tokens=True):
            return ["C"] * len(ids)

    trainer = Trainer(model, _Tok(), num_steps=1000, lr=1e-4, mesh=mesh, seed=0)
    state = trainer.init_state(batch)
    device_batch = shard_batch(_device_batch(batch), mesh)
    step = trainer._build_train_step(
        _modality_segments(device_batch["encoder_inputs"])
    )

    # ---- train step ------------------------------------------------------
    # NOTE: device_get (not block_until_ready) — the axon backend's
    # block_until_ready can return before remote execution finishes.
    state, metrics = step(state, device_batch)  # compile
    jax.device_get(metrics["loss"])
    n_steps = 20
    start = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, device_batch)
    jax.device_get(metrics["loss"])
    train_time = (time.perf_counter() - start) / n_steps
    train_tput = BATCH / train_time

    # ---- beam-10 decode --------------------------------------------------
    # Throughput vs latency: on the axon relay a synchronized dispatch+fetch
    # round-trip costs ~40 ms REGARDLESS of the computation (measured: a
    # null jit costs 39.3 ms synced; device_get of a ready buffer 0.02 ms).
    # Syncing after every decode therefore measures relay latency, not TPU
    # throughput. Spectra/s is a THROUGHPUT metric and production decoding
    # pipelines batches (cli/serve.py keeps the queue full), so the
    # throughput measurement dispatches the reps back-to-back and syncs
    # once — execution is in-order on the single device, so the last
    # result being ready implies all are. The per-batch synced LATENCY is
    # reported alongside in detail.
    def time_decode(max_length: int, n_decodes: int = 6):
        def decode(params, enc, mask):
            return beam_search(
                model, {"params": params}, enc, mask,
                num_beams=N_BEAMS, max_length=max_length,
            )

        decode_jit = jax.jit(decode)
        args = (state.params, device_batch["encoder_inputs"],
                device_batch["encoder_mask"])
        seqs, _ = decode_jit(*args)           # compile + warm
        jax.device_get(seqs[0, 0, 0])
        # latency: sync every rep
        start = time.perf_counter()
        for _ in range(3):
            seqs, _ = decode_jit(*args)
            jax.device_get(seqs[0, 0, 0])
        latency = (time.perf_counter() - start) / 3
        # throughput: pipeline the dispatches, sync once at the end
        start = time.perf_counter()
        for _ in range(n_decodes):
            seqs, _ = decode_jit(*args)
        jax.device_get(seqs[0, 0, 0])
        throughput = (time.perf_counter() - start) / n_decodes
        return throughput, latency

    decode_worst_s, decode_worst_lat_s = time_decode(MAX_DECODE_LEN)
    decode_typical_s, decode_typical_lat_s = time_decode(TYPICAL_DECODE_LEN)
    decode_tput = BATCH / decode_worst_s

    # Headline: TYPICAL-case decode — the 70/s baseline's decode side is
    # the reference's typical case (trained model, ~40-token SMILES), so
    # typical-vs-typical is the like-for-like ratio. The worst-case number
    # (full len-128 loop, no early exit) is reported alongside: at it the
    # ratio would still be `combined_worst / 70`.
    combined_worst = 1.0 / (1.0 / train_tput + 1.0 / decode_tput)
    combined = 1.0 / (1.0 / train_tput + decode_typical_s / BATCH)
    result = {
        # Renamed from ..._per_chip when the headline switched from
        # worst-case to like-for-like typical-case decode — a new
        # metric identity, so cross-round comparisons cannot silently
        # mix definitions (worst-case numbers stay in detail).
        "metric": "ir_recipe_spectra_per_sec_per_chip_typical",
        "value": round(combined, 2),
        "unit": "spectra/s (train + typical len-48 beam10 decode, "
                "batch 128, bf16, vocab 320; like-for-like vs the "
                "typical-case V100 baseline)",
        "vs_baseline": round(combined / REF_COMBINED_SPECTRA_PER_SEC, 2),
        "detail": {
            "train_spectra_per_sec": round(train_tput, 1),
            "train_step_ms": round(train_time * 1e3, 2),
            "decode_worst_batch_s": round(decode_worst_s, 3),
            "decode_worst_spectra_per_sec": round(BATCH / decode_worst_s, 1),
            "decode_typical_batch_s": round(decode_typical_s, 3),
            "decode_typical_spectra_per_sec": round(
                BATCH / decode_typical_s, 1),
            "decode_worst_latency_batch_s": round(decode_worst_lat_s, 3),
            "decode_typical_latency_batch_s": round(decode_typical_lat_s, 3),
            "latency_note": "latency = synced per batch; throughput numbers "
                            "pipeline dispatches (the axon relay costs "
                            "~40 ms per synchronized round-trip even for a "
                            "null program)",
            "combined_worst_spectra_per_sec": round(combined_worst, 1),
            "vs_baseline_worst_case": round(
                combined_worst / REF_COMBINED_SPECTRA_PER_SEC, 2),
            "baseline_note": "70/s = reference V100 estimate with "
                             "TYPICAL-case decode; see bench.py docstring",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


def _start_watchdog() -> None:
    """Fail fast instead of hanging forever if the axon relay is wedged.

    The relay has twice wedged mid-transfer (CLAUDE.md), and a wedged
    backend blocks ``jax`` calls indefinitely with no exception to catch.
    A daemon thread emits a structured error line and hard-exits after
    ``BENCH_DEADLINE_S`` (default 90 min — generous for a fully cold
    compile cache: train step ~1-2 min + two beam graphs at 10-20 min
    each on the remote-compile service)."""
    import threading

    deadline = float(os.environ.get("BENCH_DEADLINE_S", 5400))

    def fire():
        time.sleep(deadline)
        print(json.dumps({
            "metric": "ir_recipe_spectra_per_sec_per_chip_typical",
            "value": 0.0,
            "unit": "spectra/s",
            "vs_baseline": 0.0,
            "error": f"bench watchdog fired after {deadline:.0f}s - "
                     "TPU relay likely wedged or compile service stuck; "
                     "rerun after relay restart",
        }), flush=True)
        os._exit(2)

    threading.Thread(target=fire, daemon=True, name="bench-watchdog").start()


if __name__ == "__main__":
    _start_watchdog()
    try:
        main()
    except BaseException as e:  # noqa: BLE001 - driver needs JSON, not a trace
        # Round-2 postmortem: a fast init failure (relay down) died as a raw
        # traceback and the driver recorded `parsed: null`. ANY failure must
        # still emit the one structured JSON line.
        import traceback

        traceback.print_exc()
        print(json.dumps({
            "metric": "ir_recipe_spectra_per_sec_per_chip_typical",
            "value": 0.0,
            "unit": "spectra/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }), flush=True)
        raise SystemExit(1)
