#!/usr/bin/env python
"""Convert a reference (rxn4chemistry/MultimodalAnalytical) checkpoint into
an orbax checkpoint this framework can finetune from or serve.

The reference trains torch models inside a Lightning ``HFWrapper``
(reference modeling/wrapper.py:230-298) and saves Lightning ``.ckpt`` files;
this tool maps those weights onto our Flax param tree
(``multimodalanalytical_tpu/models/torch_mapping.py`` — the mapping is
numerically pinned against the reference's executed forward by
``tests/test_reference_model_parity.py``) and writes an orbax checkpoint.

Usage:
    python scripts/convert_reference_checkpoint.py IN.ckpt OUT_DIR \
        [--family auto|CustomModel|BartForConditionalGeneration|T5ForConditionalGeneration]

``IN.ckpt`` may be a Lightning checkpoint (state_dict keys under
``hf_model.``) or a bare torch ``state_dict`` of CustomModel / the
reference's surgered HF BART/T5. Point the CLIs at the result with
``model.model_checkpoint_path=OUT_DIR`` (cli.predict / cli.serve, or
``finetuning=True`` in cli.training). The MODEL config (layers, d_model,
GEGLU, positions, align) must still be supplied via ``model=...`` overrides
exactly as for any checkpoint; the tokenizer/preprocessor artifact is
separate (the reference pickles its preprocessor — re-fit or export it to
our JSON artifact with the training CLI).

torch is imported HERE only — it is a migration tool dependency, never a
framework one.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodalanalytical_tpu.models.torch_mapping import (  # noqa: E402
    lightning_state_dict_to_flax,
)

FAMILIES = ["auto", "CustomModel", "BartForConditionalGeneration",
            "T5ForConditionalGeneration"]


def load_state_dict(path: Path):
    import torch

    try:
        raw = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Lightning checkpoints embed hyper_parameters (arbitrary pickled
        # objects); only fall back for a file the user already chose to load.
        print("weights_only load failed; falling back to full unpickling "
              "(only convert checkpoints you trust)", file=sys.stderr)
        raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    return {
        k: np.asarray(v.detach().cpu().numpy())
        for k, v in sd.items()
        if hasattr(v, "detach")
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("ckpt", type=Path, help="reference .ckpt / .pt file")
    ap.add_argument("out", type=Path, help="orbax checkpoint dir to create")
    ap.add_argument("--family", default="auto", choices=FAMILIES,
                    help="reference model family (default: detect from keys)")
    args = ap.parse_args(argv)

    sd = load_state_dict(args.ckpt)
    params = lightning_state_dict_to_flax(sd, family=args.family)

    import os

    from multimodalanalytical_tpu.tpu_guard import honor_platform_env

    # Conversion is pure host-side work; FORCE CPU. setdefault would not do:
    # this host's launch env exports JAX_PLATFORMS=axon, and a first-run
    # conversion must not block on (or race) the TPU relay just to write
    # numpy arrays to disk.
    os.environ["JAX_PLATFORMS"] = "cpu"
    honor_platform_env()

    import jax
    import orbax.checkpoint as ocp

    out = args.out.resolve()
    if out.exists():
        ap.error(f"{out} already exists; orbax needs a fresh directory")
    ocp.PyTreeCheckpointer().save(out, {"params": params})
    leaves = jax.tree_util.tree_leaves(params)
    print(f"wrote {out}: {len(leaves)} param arrays, "
          f"{sum(int(np.size(a)) for a in leaves):,} weights")
    return 0


if __name__ == "__main__":
    sys.exit(main())
