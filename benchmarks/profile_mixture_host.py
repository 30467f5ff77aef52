"""Attribute the host-side cost of streaming-mixture training.

VERDICT r4 weak #1: the round-4 binary retrain sustained ~1,840 mixtures/s
while the train step alone does ~6,150 spectra/s on-chip — a ~3.3x
host-bound gap on this 1-core machine. This harness builds the EXACT
production pipeline (same config composition as
``cli.training`` with ``data=ir/patches_mixture_text_align
mixture=ir/binary``) and times each stage in isolation:

  gen       raw multi_config_mix stream (synthesis + component yields)
  batch     + loader column accumulation (no collation)
  collate   + MultiModalCollator (preprocess/tokenize/pad)
  devprep   + trainer._device_batch host bf16 cast (no transfer)

Per-stage cost = difference of consecutive cumulative rows. Runs on CPU
JAX only — never touches the TPU relay (safe to run alongside chip jobs).

Usage: python benchmarks/profile_mixture_host.py [--pool /tmp/synth_ir_50k]
       [--batches 64] [--mixture ir/binary]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")


def build_pipeline(pool: str, mixture: str, batch_size: int):
    from multimodalanalytical_tpu.cli.common import (
        build_collator, build_preprocessors, default_configs_dir,
    )
    from multimodalanalytical_tpu.config import compose_config
    from multimodalanalytical_tpu.data.datasets import build_dataset_multimodal
    from multimodalanalytical_tpu.training.loader import DataLoader

    config = compose_config(
        default_configs_dir(), "config_train",
        [
            "working_dir=/tmp/profile_mixture_host", "job_name=prof",
            "data=ir/patches_mixture_text_align", f"data_path={pool}",
            f"mixture={mixture}", "model=custom_model_align",
            "splitting=unique_target", "molecules=True",
        ],
    )
    data_config, dataset = build_dataset_multimodal(
        dict(config["data"]),
        data_path=config["data_path"],
        cv_split=config.get("cv_split", 0),
        splitting=config.get("splitting", "random"),
        augment_config=config.get("augment"),
        num_cpu=1,
        mixture_config=config.get("mixture"),
    )
    data_config, preprocessors, artifact = build_preprocessors(
        config, data_config, dataset["train"]
    )
    collator = build_collator(
        data_config, preprocessors, dataset["train"], batch_size,
        artifact_path=artifact,
    )
    return dataset["train"], collator, data_config


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", default="/tmp/synth_ir_50k")
    ap.add_argument("--batches", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--mixture", default="ir/binary")
    args = ap.parse_args()

    t0 = time.perf_counter()
    train_set, collator, data_config = build_pipeline(
        args.pool, args.mixture, args.batch_size
    )
    print(f"pipeline built in {time.perf_counter() - t0:.1f}s", flush=True)

    from multimodalanalytical_tpu.training.loader import DataLoader
    from multimodalanalytical_tpu.training.trainer import _device_batch

    n_samples = args.batches * args.batch_size
    results = {}

    # ---- gen: raw generator stream ------------------------------------
    t0 = time.perf_counter()
    it = iter(train_set)
    for _ in range(n_samples):
        next(it)
    results["gen"] = time.perf_counter() - t0

    # ---- batch: + column accumulation ----------------------------------
    loader = DataLoader(train_set, collator, args.batch_size, prefetch=0)
    t0 = time.perf_counter()
    cols_it = loader._column_batches()
    kept = [next(cols_it) for _ in range(args.batches)]
    results["batch"] = time.perf_counter() - t0

    # ---- collate: reuse the accumulated columns so the stage is isolated
    t0 = time.perf_counter()
    batches = [collator(c[0] if isinstance(c, tuple) else c) for c in kept]
    results["collate_only"] = time.perf_counter() - t0

    # ---- devprep: host bf16 cast ---------------------------------------
    import jax.numpy as jnp

    t0 = time.perf_counter()
    for b in batches:
        _device_batch(b, jnp.bfloat16)
    results["devprep_only"] = time.perf_counter() - t0

    # ---- end-to-end loader (threaded prefetch ON, as production runs) --
    loader = DataLoader(train_set, collator, args.batch_size, prefetch=2)
    t0 = time.perf_counter()
    it = iter(loader)
    for _ in range(args.batches):
        next(it)
    results["e2e_loader"] = time.perf_counter() - t0

    per_batch = {k: 1e3 * v / args.batches for k, v in results.items()}
    summary = {
        "batches": args.batches,
        "batch_size": args.batch_size,
        "mixture": args.mixture,
        "ms_per_batch": {k: round(v, 2) for k, v in per_batch.items()},
        "stage_ms": {
            "synthesis": round(per_batch["gen"], 2),
            "column_accum": round(per_batch["batch"] - per_batch["gen"], 2),
            "collate": round(per_batch["collate_only"], 2),
            "devprep": round(per_batch["devprep_only"], 2),
        },
        "host_samples_per_sec": round(
            args.batch_size / (per_batch["e2e_loader"] / 1e3), 1
        ),
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
