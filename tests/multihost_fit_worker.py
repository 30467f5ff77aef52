"""Worker for the multi-process Trainer end-to-end test.

Runs the full Trainer path — fit (one epoch with checkpointing) ->
validate -> beam predict — either single-process (8 local CPU devices) or as
one rank of a 2-process jax.distributed run (4 local CPU devices each, same
8-device global mesh). Emits a JSON result for cross-run comparison.

Usage: python multihost_fit_worker.py <proc_id> <num_procs> <out_json> <workdir>
"""

import json
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    proc_id, num_procs = int(sys.argv[1]), int(sys.argv[2])
    out_json, workdir = Path(sys.argv[3]), Path(sys.argv[4])
    if num_procs > 1:
        jax.distributed.initialize(
            coordinator_address="localhost:12411",
            num_processes=num_procs, process_id=proc_id,
        )
        assert jax.process_count() == num_procs
    assert len(jax.devices()) == 8

    from multimodalanalytical_tpu.data.collator import MultiModalCollator
    from multimodalanalytical_tpu.data.data_utils import fit_preprocessors
    from multimodalanalytical_tpu.data.datasets import TableDataset
    from multimodalanalytical_tpu.models import ModelConfig, Seq2SeqModel
    from multimodalanalytical_tpu.parallel.mesh import make_mesh
    from multimodalanalytical_tpu.training.checkpoint import CheckpointManager
    from multimodalanalytical_tpu.training.loader import DataLoader
    from multimodalanalytical_tpu.training.trainer import Trainer

    SMILES_REGEX = (
        r"(\[[^\]]+]|Br?|Cl?|N|O|S|P|F|I|b|c|n|o|s|p|\(|\)|\.|=|#|-|\+|\\\\|\/|:"
        r"|~|@|\?|>|\*|\$|\%[0-9]{2}|[0-9])"
    )

    rng = np.random.default_rng(0)
    # 17 rows with global batch 8: batches of 8, 8, 1 — the final batch
    # exercises the zero-row shard (rank 1 gets a masked dummy batch).
    n = 17
    table = TableDataset({
        "Formula": (["C2H6O", "C2H7N"] * n)[:n],
        "IR": [rng.random(200).tolist() for _ in range(n)],
        "Smiles": (["CCO", "CCN"] * n)[:n],
    })
    config = {
        "Formula": {"type": "text", "column": "Formula", "target": False,
                    "preprocessor_arguments": {
                        "tokenizer_regex": r"([A-Z]{1}[a-z]?[0-9]*)"}},
        "IR": {"type": "1D_patches", "column": "IR", "target": False,
               "preprocessor_arguments": {"patch_size": 50,
                                          "interpolation": False,
                                          "masking": False}},
        "Smiles": {"type": "text", "column": "Smiles", "target": True,
                   "preprocessor_arguments": {"tokenizer_regex": SMILES_REGEX}},
    }
    config, preps = fit_preprocessors(table.columns, config)
    batch_size = 8
    collator = MultiModalCollator(
        preps, config, pad_to_batch_size=batch_size // num_procs)
    collator.fit_lengths(table.columns)
    cfg = ModelConfig(
        d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        vocab_size=config["Smiles"]["vocab_size"],
        pad_token_id=config["Smiles"]["pad_token_id"],
        max_target_length=16,
    )
    model = Seq2SeqModel(config=cfg, data_config=config,
                         target_modality="Smiles")

    shard_kw = dict(num_shards=num_procs, shard_index=proc_id)
    train_loader = DataLoader(table, collator, batch_size, shuffle=True,
                              seed=7, prefetch=0, **shard_kw)
    eval_loader = DataLoader(table, collator, batch_size, shuffle=False,
                             prefetch=0, **shard_kw)

    mesh = make_mesh()
    trainer = Trainer(model, preps["Smiles"], num_steps=6, lr=1e-3,
                      mesh=mesh, seed=0, n_beams=2)
    state = trainer.init_state(next(iter(train_loader)))

    ckpts = CheckpointManager(workdir / "ckpt")
    state = trainer.fit(state, train_loader, eval_loader, epochs=2,
                        checkpoints=ckpts)

    eval_step = trainer._build_eval_step()
    val = trainer.validate(state, eval_loader, eval_step)
    pred = trainer.predict(state, eval_loader, n_beams=2)

    result = {
        "proc": proc_id,
        "val": val,
        "avg_loss": pred["avg_loss"],
        "predictions": pred["predictions"],
        "targets": pred["targets"],
        "ckpt_last": (workdir / "ckpt" / "last").exists(),
    }
    out_json.write_text(json.dumps(result))
    print(f"proc{proc_id} done", flush=True)


if __name__ == "__main__":
    main()
