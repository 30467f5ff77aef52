"""Exact-vs-surrogate guided-decoding parity at trained-model scale (CPU).

VERDICT r2 item 4 asked for one real-chip exact-mode run; that is
runtime-impossible — the axon TPU runtime returns UNIMPLEMENTED for the
host send/recv callbacks `jax.experimental.io_callback` needs (verified
2026-08-17, see cli/predict.py:39-56, which auto-falls back to CPU with a
warning). This harness therefore supplies the strongest available
evidence on the CPU backend, at a reduced-but-real scale:

  1. trains a small CustomModel recipe on the synthetic IR set until the
     beam search produces real molecule distributions,
  2. runs beam-10 predict three ways — unguided, guided=surrogate
     (in-graph heavy-atom counts; the production path), guided=exact
     (host io_callback computing FULL formulas incl. implicit H, the
     reference semantics of logit_processors.py:104-128),
  3. reports Top-N for all three plus the measured wall-clock ratio
     exact/surrogate — the quantified justification for the surrogate
     default.

Usage: python benchmarks/accuracy/guided_exact_vs_surrogate.py [workdir]

Flagship-scale mode (VERDICT r3 item 3): reuse an existing d512 6+6
checkpoint instead of training the small model —

  python benchmarks/accuracy/guided_exact_vs_surrogate.py /tmp/guided_fs \\
      --checkpoint /tmp/tpu_backlog/synth4k/checkpoints/best \\
      --preprocessor /tmp/tpu_backlog/synth4k/preprocessor.json \\
      --data /tmp/synth_ir_dataset --flagship --limit 256

--limit N caps the test rows via the predict CLI's test_idx mechanism
(cli/common.py) so the CPU-only exact mode stays tractable at d512.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = Path(__file__).resolve().parents[2]
DATA = Path("/tmp/synth_ir_1200")

MODEL_OVERRIDES = [
    "model=custom_model",
    "model.d_model=128",
    "model.encoder_layers=2", "model.decoder_layers=2",
    "model.encoder_attention_heads=8", "model.decoder_attention_heads=8",
    "model.encoder_ffn_dim=512", "model.decoder_ffn_dim=512",
    "model.dtype=float32",
    "model.batch_size=64",
]


def sh(args, **kw):
    print("+", " ".join(map(str, args)), flush=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(list(map(str, args)), check=True, cwd=REPO,
                          env=env, **kw)


FLAGSHIP_OVERRIDES = [
    "model=custom_model",
    "model.dtype=float32",   # CPU backend; keep modes numerically identical
    "model.batch_size=64",
]


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/guided_ab")
    ap.add_argument("--checkpoint", default=None,
                    help="existing checkpoint dir (skips the training stage)")
    ap.add_argument("--preprocessor", default=None)
    ap.add_argument("--data", default=None, help="dataset dir override")
    ap.add_argument("--flagship", action="store_true",
                    help="use the d512 6+6 custom_model preset")
    ap.add_argument("--limit", type=int, default=0,
                    help="cap test rows via test_idx (0 = all)")
    args = ap.parse_args()

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    data = Path(args.data) if args.data else DATA
    overrides = FLAGSHIP_OVERRIDES if args.flagship else MODEL_OVERRIDES

    if not data.exists():
        sh([sys.executable, "benchmarks/accuracy/make_dataset.py",
            "--n", "1200", "--out", data])

    if args.checkpoint:
        ckpt = Path(args.checkpoint)
        prep = Path(args.preprocessor) if args.preprocessor else (
            ckpt.parent.parent / "preprocessor.json")
    else:
        ckpt = work / "train" / "checkpoints" / "best"
        prep = work / "train" / "preprocessor.json"
        if not ckpt.exists():
            sh([sys.executable, "-m", "multimodalanalytical_tpu.cli.training",
                f"working_dir={work}", "job_name=train",
                "data=ir/patches", f"data_path={data}",
                *overrides,
                # Greedy Top-1 stays 0.0 for the first ~30 epochs at this
                # small scale (the 4k d512 run lifted off at epoch 9; d128
                # is later), so early-stop on val_loss, not molecular
                # accuracy.
                "trainer.checkpoint_monitor=val_loss",
                "trainer.epochs=150", "trainer.early_stopping_patience=25"])

    limit_args = []
    if args.limit:
        import numpy as np

        idx_path = work / f"test_idx_{args.limit}.npy"
        # the same deterministic row subset for all three modes
        np.save(idx_path, np.arange(args.limit))
        limit_args = [f"test_idx={idx_path}"]

    results = {}
    for mode, extra in (
        ("unguided", []),
        ("surrogate", ["model.guided_generation=surrogate"]),
        ("exact", ["model.guided_generation=exact"]),
    ):
        t0 = time.perf_counter()
        sh([sys.executable, "-m", "multimodalanalytical_tpu.cli.predict",
            f"working_dir={work}", f"job_name=pred_{mode}",
            "data=ir/patches", f"data_path={data}",
            *overrides, *limit_args,
            f"preprocessor_path={prep}",
            f"model.model_checkpoint_path={ckpt}",
            *extra])
        wall = time.perf_counter() - t0
        metrics_files = sorted((work / f"pred_{mode}").glob("metrics_beam_*.json"))
        metrics = json.loads(metrics_files[-1].read_text())
        results[mode] = {"wall_s": round(wall, 1), **{
            k: metrics[k] for k in ("Top-1", "Top-5", "Top-10") if k in metrics}}
        print(mode, results[mode], flush=True)

    summary = {
        "results": results,
        "exact_over_surrogate_wall": round(
            results["exact"]["wall_s"] / results["surrogate"]["wall_s"], 2),
        "note": ("exact mode is CPU-only: the axon TPU runtime returns "
                 "UNIMPLEMENTED for io_callback host transfers "
                 "(cli/predict.py:39-56)"),
    }
    out = work / "summary.json"
    out.write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary, indent=1), flush=True)


if __name__ == "__main__":
    main()
