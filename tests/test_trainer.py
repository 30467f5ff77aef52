"""Trainer loop tests: fit with checkpointing, resume, finetune load."""

import numpy as np
import pytest

from multimodalanalytical_tpu.data.collator import MultiModalCollator
from multimodalanalytical_tpu.data.data_utils import fit_preprocessors
from multimodalanalytical_tpu.data.datasets import TableDataset
from multimodalanalytical_tpu.models import ModelConfig, Seq2SeqModel
from multimodalanalytical_tpu.training.checkpoint import (
    CheckpointManager,
    load_finetune_params,
    restore_params,
)
from multimodalanalytical_tpu.training.loader import DataLoader
from multimodalanalytical_tpu.training.trainer import Trainer

SMILES_REGEX = (
    r"(\[[^\]]+]|Br?|Cl?|N|O|S|P|F|I|b|c|n|o|s|p|\(|\)|\.|=|#|-|\+|\\\\|\/|:"
    r"|~|@|\?|>|\*|\$|\%[0-9]{2}|[0-9])"
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n = 16
    table = TableDataset({
        "Formula": ["C2H6O", "C2H7N"] * (n // 2),
        "IR": [rng.random(200).tolist() for _ in range(n)],
        "Smiles": ["CCO", "CCN"] * (n // 2),
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
    collator = MultiModalCollator(preps, config, pad_to_batch_size=8)
    collator.fit_lengths(table.columns)
    cfg = ModelConfig(
        d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        vocab_size=config["Smiles"]["vocab_size"],
        pad_token_id=config["Smiles"]["pad_token_id"],
        max_target_length=16,
    )
    model = Seq2SeqModel(config=cfg, data_config=config, target_modality="Smiles")
    return table, config, preps, collator, model


def test_fit_checkpoints_and_restore(setup, tmp_path):
    table, config, preps, collator, model = setup
    loader = DataLoader(table, collator, batch_size=8, shuffle=True, prefetch=0)
    trainer = Trainer(model, preps["Smiles"], num_steps=8, lr=1e-3, seed=0)
    state = trainer.init_state(next(iter(loader)))

    ckpts = CheckpointManager(tmp_path / "ckpt")
    state = trainer.fit(
        state, loader, loader, epochs=2, checkpoints=ckpts,
        limit_val_batches=0.5,
    )
    assert (tmp_path / "ckpt" / "last").exists()
    assert (tmp_path / "ckpt" / "best").exists()

    params = restore_params(tmp_path / "ckpt" / "best")
    leaves_a = [np.asarray(x) for x in
                __import__("jax").tree_util.tree_leaves(params)]
    assert all(np.isfinite(x).all() for x in leaves_a)

    # Finetune load round-trips the param tree.
    loaded, dropped = load_finetune_params(
        tmp_path / "ckpt" / "best", state.params, strip_align=True
    )
    assert dropped == 0

    # Resume continues from the saved step.
    state2 = trainer.init_state(next(iter(loader)))
    state2 = trainer.fit(
        state2, loader, None, epochs=2, checkpoints=ckpts, resume=True,
    )
    assert int(state2.step) >= int(state.step)


def test_fit_max_steps_bounds_global_step(setup, tmp_path):
    """max_steps stops mid-epoch, runs a terminal validation so ``best``
    reflects the final state, and a resume at/past the bound is a no-op."""
    table, config, preps, collator, model = setup
    loader = DataLoader(table, collator, batch_size=8, shuffle=True, prefetch=0)
    trainer = Trainer(model, preps["Smiles"], num_steps=8, lr=1e-3, seed=0)
    state = trainer.init_state(next(iter(loader)))
    ckpts = CheckpointManager(tmp_path / "ckpt")

    # 2 batches/epoch; epochs=4 would be 8 steps — the bound wins at 3.
    state = trainer.fit(state, loader, loader, epochs=4, checkpoints=ckpts,
                        max_steps=3)
    assert int(state.step) == 3
    assert (tmp_path / "ckpt" / "best").exists()  # terminal validation ran

    # Resuming at the bound trains zero additional steps.
    state2 = trainer.init_state(next(iter(loader)))
    state2 = trainer.fit(state2, loader, None, epochs=4, checkpoints=ckpts,
                         resume=True, max_steps=3)
    assert int(state2.step) == 3


def test_predict_returns_beams(setup):
    table, config, preps, collator, model = setup
    loader = DataLoader(table, collator, batch_size=8, prefetch=0)
    trainer = Trainer(model, preps["Smiles"], num_steps=4, lr=1e-3, seed=0,
                      n_beams=3)
    state = trainer.init_state(next(iter(loader)))
    out = trainer.predict(state, loader, n_beams=3)
    assert len(out["predictions"]) == len(table)
    assert all(len(beams) == 3 for beams in out["predictions"])
    assert out["targets"][:2] == ["CCO", "CCN"]


def test_checkpoint_fused_projection_migration():
    """Pre-fusion checkpoints (separate q/k/v projections) load into the
    fused layout losslessly."""
    import numpy as np

    from multimodalanalytical_tpu.training.checkpoint import (
        _migrate_fused_projections,
    )

    rng = np.random.default_rng(0)
    old = {
        "encoder": {
            "layer_0": {
                "self_attn": {
                    "q_proj": {"kernel": rng.random((8, 8)), "bias": rng.random(8)},
                    "k_proj": {"kernel": rng.random((8, 8)), "bias": rng.random(8)},
                    "v_proj": {"kernel": rng.random((8, 8)), "bias": rng.random(8)},
                    "out_proj": {"kernel": rng.random((8, 8)), "bias": rng.random(8)},
                },
            },
        },
        "decoder": {
            "layer_0": {
                "cross_attn": {
                    "q_proj": {"kernel": rng.random((8, 8)), "bias": rng.random(8)},
                    "k_proj": {"kernel": rng.random((8, 8)), "bias": rng.random(8)},
                    "v_proj": {"kernel": rng.random((8, 8)), "bias": rng.random(8)},
                },
            },
        },
    }
    new = _migrate_fused_projections(old)
    enc = new["encoder"]["layer_0"]["self_attn"]
    assert "qkv_proj" in enc and "q_proj" not in enc
    assert enc["qkv_proj"]["kernel"].shape == (8, 24)
    np.testing.assert_array_equal(
        enc["qkv_proj"]["kernel"][:, :8],
        old["encoder"]["layer_0"]["self_attn"]["q_proj"]["kernel"],
    )
    assert "out_proj" in enc
    # cross attention keeps q separate and fuses only k/v
    cross = new["decoder"]["layer_0"]["cross_attn"]
    assert "q_proj" in cross and "kv_proj" in cross
    assert "qkv_proj" not in cross and "k_proj" not in cross
    assert cross["kv_proj"]["kernel"].shape == (8, 16)
    np.testing.assert_array_equal(
        cross["kv_proj"]["kernel"][:, 8:],
        old["decoder"]["layer_0"]["cross_attn"]["v_proj"]["kernel"],
    )


def test_checkpoint_cadence_rate_limits_improvement_saves(setup, tmp_path):
    """Improvement saves honor checkpoint_every_n_vals as a rate limit
    (round-3 review): a steadily improving run saves ~1/N validations, and
    the saved best lags the true best by at most N-1 validations."""
    table, config, preps, collator, model = setup
    trainer = Trainer(model, preps["Smiles"], num_steps=4,
                      checkpoint_every_n_vals=3)

    saves = []

    class _Ckpts:
        def save_async(self, step, tree, metrics):
            saves.append((step, metrics["val_molecular_accuracy"]))

        def snapshot(self, tree):
            return tree

    # Scripted monotone improvement: every validation improves.
    accs = iter([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7])
    trainer.validate = lambda *a, **k: {
        "val_loss": 0.0, "val_token_acc": 0.0,
        "val_molecular_accuracy": next(accs),
    }

    class _State:
        params = {}
        opt_state = {}

    best, patience = -float("inf"), 100
    for step in range(7):
        stop, best, patience = trainer._run_validation(
            _State(), None, None, 1.0, _Ckpts(), None, step, step, 100,
            best, patience,
        )
    # val 1 (first improvement), val 3 (cadence), val 4 (improvement,
    # >=3 after val 1), val 6 (cadence), val 7 (improvement, >=3 after 4).
    assert [acc for _, acc in saves] == [0.1, 0.3, 0.4, 0.6, 0.7]


def test_improvement_saves_track_best_without_early_stopping(setup):
    """VERDICT r1 #9: with early_stopping_patience=None, non-improving
    validations must NOT count as improvements (best_monitor is tracked
    unconditionally)."""
    table, config, preps, collator, model = setup
    trainer = Trainer(model, preps["Smiles"], num_steps=4,
                      checkpoint_every_n_vals=2)

    saves = []

    class _Ckpts:
        def save_async(self, step, tree, metrics):
            saves.append(metrics["val_molecular_accuracy"])

        def snapshot(self, tree):
            return tree

    # Improves, then degrades twice, then improves past the best.
    accs = iter([0.5, 0.3, 0.4, 0.6])
    trainer.validate = lambda *a, **k: {
        "val_loss": 0.0, "val_token_acc": 0.0,
        "val_molecular_accuracy": next(accs),
    }

    class _State:
        params = {}
        opt_state = {}

    best, patience = -float("inf"), None
    for step in range(4):
        stop, best, patience = trainer._run_validation(
            _State(), None, None, 1.0, _Ckpts(), None, step, step, None,
            best, patience,
        )
    # val 1: improvement save (0.5); val 2: cadence save (0.3); val 3
    # (0.4 < best 0.5) must NOT improvement-save — the old bug counted every
    # validation as improved when patience was None and saved 0.4 here;
    # val 4: genuine improvement (0.6 > 0.5) plus cadence.
    assert saves == [0.5, 0.3, 0.6]


def test_async_checkpoint_save(tmp_path):
    """save_async writes the same restorable artifact as save, and wait()
    drains the background thread; training-side buffers can be mutated
    immediately after save_async returns (device snapshot decoupling)."""
    import jax.numpy as jnp
    import numpy as np
    from multimodalanalytical_tpu.training.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ck")
    params = {"w": jnp.arange(8, dtype=jnp.float32)}
    tree = {"params": params, "step": 3}
    mgr.save_async(3, tree, {"val_molecular_accuracy": 0.5})
    # A second request while the first may still be in flight (latest wins).
    tree2 = {"params": {"w": jnp.arange(8, dtype=jnp.float32) * 2}, "step": 4}
    mgr.save_async(4, tree2, {"val_molecular_accuracy": 0.7})
    mgr.wait()
    restored = mgr.restore("last", {"params": {"w": np.zeros(8, np.float32)},
                                    "step": 0})
    assert int(restored["step"]) == 4
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(8, dtype=np.float32) * 2)
    # The best/top-k entry for step 4 exists too.
    assert mgr.best_step == 4


def test_rate_suppressed_improvement_is_never_lost(setup):
    """ADVICE r1 #1: an improvement suppressed by the rate window is pinned
    on device and flushed by the next due save (instead of the degraded
    current state) or at end of fit — the true best params always reach
    disk."""
    table, config, preps, collator, model = setup
    trainer = Trainer(model, preps["Smiles"], num_steps=4,
                      checkpoint_every_n_vals=3)

    saves = []

    class _Ckpts:
        def save_async(self, step, tree, metrics):
            saves.append((step, metrics["val_molecular_accuracy"]))

        def snapshot(self, tree):
            return tree

        def wait(self, timeout_s=None):
            return True

    # val 1: improvement save (0.1). val 2: BIG improvement, suppressed by
    # the window -> pinned. val 3: degraded but due -> must flush the
    # pinned 0.9 from step 1, NOT save the 0.2 current state.
    accs = iter([0.1, 0.9, 0.2, 0.3, 0.85])
    trainer.validate = lambda *a, **k: {
        "val_loss": 0.0, "val_token_acc": 0.0,
        "val_molecular_accuracy": next(accs),
    }

    class _State:
        params = {}
        opt_state = {}

    ckpts = _Ckpts()
    best, patience = -float("inf"), 100
    for step in range(5):
        stop, best, patience = trainer._run_validation(
            _State(), None, None, 1.0, ckpts, None, step, step, 100,
            best, patience,
        )
    assert saves == [(0, 0.1), (1, 0.9)]
    # val 5 (0.85 < 0.9): NOT an improvement, not due -> nothing pinned.
    assert trainer._pending_best is None

    # End-of-fit flush: val 6 improves (due + past the window -> saved),
    # val 7 improves again inside the window -> pinned; fit-end flushes it.
    accs2 = iter([0.95, 0.97])
    trainer.validate = lambda *a, **k: {
        "val_loss": 0.0, "val_token_acc": 0.0,
        "val_molecular_accuracy": next(accs2),
    }
    for step in (5, 6):
        stop, best, patience = trainer._run_validation(
            _State(), None, None, 1.0, ckpts, None, step, step, 100,
            best, patience,
        )
    assert saves[-1] == (5, 0.95)
    assert trainer._pending_best is not None
    trainer._flush_pending_best(ckpts)
    assert saves[-1] == (6, 0.97)
    assert trainer._pending_best is None


def test_wait_timeout_abandons_wedged_save(tmp_path, caplog):
    """A saver wedged mid-D2H (axon relay hang, seen twice) must not block
    wait() forever: the bounded drain abandons the in-flight save, logs the
    surviving on-disk state, and returns False (VERDICT r2 item 6)."""
    import logging
    import threading
    import time

    import jax
    import jax.numpy as jnp
    from multimodalanalytical_tpu.training.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ck")
    tree = {"params": {"w": jnp.arange(4, dtype=jnp.float32)}, "step": 1}
    # A good on-disk `last` from before the wedge.
    mgr.save(1, jax.device_get(tree), {"val_molecular_accuracy": 0.5})

    release = threading.Event()
    real_save = mgr.save

    def wedged_save(step, host_tree, metrics):
        release.wait(30.0)  # stands in for the infinite D2H/write hang
        real_save(step, host_tree, metrics)

    mgr.save = wedged_save
    tree2 = {"params": {"w": jnp.arange(4, dtype=jnp.float32)}, "step": 2}
    mgr.save_async(2, tree2, {"val_molecular_accuracy": 0.9})
    t0 = time.monotonic()
    with caplog.at_level(logging.ERROR):
        assert mgr.wait(timeout_s=1.0) is False
    assert time.monotonic() - t0 < 10.0
    # The operator is told what survived on disk.
    assert "Abandoning in-flight checkpoint save" in caplog.text
    assert "last=step 1" in caplog.text
    # Un-wedge: the drain completes and a clean wait succeeds again.
    release.set()
    assert mgr.wait(timeout_s=30.0) is True
    restored = mgr.restore("last", jax.device_get(tree))
    assert int(restored["step"]) == 2


def test_fit_end_drops_pending_best_when_saver_wedged(setup, caplog):
    """End-of-fit with a wedged saver: _flush_pending_best must return
    (bounded first drain), drop the rate-suppressed best with an explicit
    log, and never enqueue work the wedged thread can't take."""
    import logging

    table, config, preps, collator, model = setup
    trainer = Trainer(model, preps["Smiles"], num_steps=4,
                      checkpoint_wait_timeout_s=0.5)

    enqueued = []

    class _WedgedCkpts:
        def save_async(self, step, tree, metrics):
            enqueued.append(step)

        def snapshot(self, tree):
            return tree

        def wait(self, timeout_s=None):
            return False  # wedged: the drain timed out

    trainer._pending_best = (7, {"params": {}}, {"val_molecular_accuracy": 0.9})
    with caplog.at_level(logging.ERROR):
        trainer._flush_pending_best(_WedgedCkpts())
    assert trainer._pending_best is None
    assert enqueued == []
    assert "Dropping rate-suppressed best" in caplog.text


def test_bf16_input_shipping_is_bit_identical():
    """_device_batch(compute_dtype=bf16) casts float32 encoder inputs to
    bfloat16 on the host (halving the dominant host->device bytes); every
    consumer is a Dense(dtype=bf16) that casts in-graph anyway, so the loss
    must be BIT-identical. XVal numerical_values must stay float32 (they
    multiply the embedding under f32 promotion)."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from __graft_entry__ import _example_batch, _flagship
    from multimodalanalytical_tpu.training.trainer import _device_batch

    model = _flagship(d_model=64, layers=1, ffn=128, vocab=50,
                      dtype="bfloat16")
    batch = _example_batch(batch=4, n_patches=6, patch=25, formula_len=5,
                           target_len=12, vocab=50)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["encoder_inputs"], batch["encoder_mask"], batch["decoder_ids"],
        batch["decoder_mask"], batch["labels"], deterministic=True)

    def loss(b):
        out = model.apply(
            variables, b["encoder_inputs"], b["encoder_mask"],
            b["decoder_ids"], b["decoder_mask"], b["labels"],
            deterministic=True)
        return float(out["loss"])

    comp = _device_batch(batch, jnp.bfloat16)
    leaves = jax.tree_util.tree_leaves(comp["encoder_inputs"])
    assert any(l.dtype == ml_dtypes.bfloat16 for l in leaves)
    assert loss(_device_batch(batch)) == loss(comp)

    # XVal numerical_values stay f32; f32 models are untouched.
    fake = {"encoder_inputs": {"M": {
        "tokenized_input": np.ones((2, 3), np.int32),
        "numerical_values": np.ones((2, 3), np.float32),
    }}}
    out = _device_batch(fake, jnp.bfloat16)
    assert out["encoder_inputs"]["M"]["numerical_values"].dtype == np.float32
    out32 = _device_batch({"encoder_inputs": {"IR": np.ones((2, 3), np.float32)}})
    assert out32["encoder_inputs"]["IR"].dtype == np.float32


@pytest.mark.parametrize("num_steps", [1, 2, 3, 4])
def test_onecycle_schedule_finite_at_tiny_horizons(num_steps):
    """optax cosine_onecycle_schedule NaNs for transition_steps <= 3 (the
    warmup boundary int(0.3*steps) is 0 -> division by zero); one update
    then NaN'd every parameter on short runs. build_optimizer floors the
    horizon so the first update is always finite."""
    import jax
    import jax.numpy as jnp

    from multimodalanalytical_tpu.training.trainer import build_optimizer

    tx = build_optimizer("adamw", 1e-4, num_steps)
    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros(3)}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(params))


def test_fit_is_deterministic_per_seed(setup):
    """Two identical seeded fits produce bit-identical parameters — pins
    the rng plumbing end to end (threefry carry, in-graph rbg re-keying,
    key-saving dropout, shuffled loader order)."""
    import jax

    table, config, preps, collator, model = setup

    def run():
        loader = DataLoader(table, collator, batch_size=8, shuffle=True,
                            seed=11, prefetch=0)
        trainer = Trainer(model, preps["Smiles"], num_steps=8, lr=1e-3,
                          seed=5)
        state = trainer.init_state(next(iter(loader)))
        state = trainer.fit(state, loader, None, epochs=2)
        return jax.tree_util.tree_leaves(state.params)

    a, b = run(), run()
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("model_type", [
    "BartForConditionalGeneration", "T5ForConditionalGeneration",
    "CustomBartForConditionalGeneration",
])
def test_hf_preset_fit_and_beam_predict(setup, model_type):
    """The graph-faithful HF presets must train and beam-decode end to end
    (rel-bias decode steps, tied d**-0.5 logits scaling, bias-free
    projections, BART's decoder layernorm_embedding) — forward parity is
    pinned in tests/test_reference_model_parity.py; this drives the paths
    that parity test can't (optimizer step, KV-cached beam search)."""
    import numpy as np

    from multimodalanalytical_tpu.models import Seq2SeqModel
    from multimodalanalytical_tpu.models.config import resolve_model_config

    table, config, preps, collator, _ = setup
    cfg = resolve_model_config(
        {
            "model_type": model_type, "d_model": 32,
            "encoder_layers": 1, "decoder_layers": 1,
            "encoder_attention_heads": 4, "decoder_attention_heads": 4,
            "encoder_ffn_dim": 64, "decoder_ffn_dim": 64, "dropout": 0.1,
            "max_position_embeddings": 64, "max_target_length": 16,
        },
        vocab_size=config["Smiles"]["vocab_size"],
        pad_token_id=config["Smiles"]["pad_token_id"],
        bos_token_id=2, eos_token_id=3,
    )
    model = Seq2SeqModel(config=cfg, data_config=config,
                         target_modality="Smiles")
    loader = DataLoader(table, collator, batch_size=8, prefetch=0)
    trainer = Trainer(model, preps["Smiles"], num_steps=4, lr=1e-3, seed=0,
                      n_beams=3)
    state = trainer.init_state(next(iter(loader)))
    state = trainer.fit(state, loader, loader, epochs=1,
                        limit_val_batches=0.5)
    leaves = __import__("jax").tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    out = trainer.predict(state, loader, n_beams=3)
    assert len(out["predictions"]) == len(table)
    assert all(len(beams) == 3 for beams in out["predictions"])
