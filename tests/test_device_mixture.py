"""Device-side mixture synthesis (data/device_mixture.py).

Pins the fast path against the host generator it replaces:
  * the index stream replays mix_spectra / multi_config_mix sample-for-
    sample (same RandomState draws, filtering, round-robin interleave);
  * the in-graph expansion reproduces the host collator's batch leaves
    (token ids/masks exact; float leaves to f32-vs-f64 rounding);
  * an end-to-end trainer fit over the fast path matches the host-path
    losses;
  * ineligible recipes (mixed=True, non-mixture datasets) fall back.
"""

import copy

import numpy as np
import pytest

from multimodalanalytical_tpu.data.collator import MultiModalCollator
from multimodalanalytical_tpu.data.data_utils import fit_preprocessors
from multimodalanalytical_tpu.data.datasets import (
    IterableDatasetWithLength,
    TableDataset,
    mix_spectra,
    multi_config_mix,
)
from multimodalanalytical_tpu.data.device_mixture import (
    DeviceMixtureLoader,
    mixture_index_stream,
    multi_config_index_stream,
    try_build_device_mixture,
)
from multimodalanalytical_tpu.training.loader import DataLoader

SMILES_REGEX = (
    r"(\[[^\]]+]|Br?|Cl?|N|O|S|P|F|I|b|c|n|o|s|p|\(|\)|\.|=|#|-|\+|\\\\|\/|:"
    r"|~|@|\?|>|\*|\$|\%[0-9]{2}|[0-9])"
)

DATA_CONFIG = {
    "Formula": {"type": "text", "column": "Formula", "target": False,
                "preprocessor_arguments": {
                    "tokenizer_regex": r"([A-Z]{1}[a-z]?[0-9]*)"}},
    "IR": {"type": "1D_patches", "column": "IR", "target": False,
           "preprocessor_arguments": {"patch_size": 100,
                                      "interpolation": False,
                                      "masking": False}},
    "IR_target": {"type": "1D_patches", "column": "", "target": True,
                  "alignment": True,
                  "preprocessor_arguments": {"patch_size": 100,
                                             "interpolation": False,
                                             "masking": False}},
    "Smiles": {"type": "text", "column": "Smiles", "target": True,
               "preprocessor_arguments": {"tokenizer_regex": SMILES_REGEX}},
}

TERNARY = {"balanced": {"n_compounds": 3, "compounds_ratio": None,
                        "train_max_n_samples": 120, "parallel_samples": 8,
                        "normalize": False}}
MULTITASK = {
    "balanced": {"n_compounds": 2, "compounds_ratio": None,
                 "train_max_n_samples": 64, "parallel_samples": 8,
                 "normalize": True},
    "unbalanced_3_7": {"n_compounds": 2, "compounds_ratio": [0.3, 0.7],
                       "train_max_n_samples": 64, "parallel_samples": 8,
                       "normalize": True},
    "unbalanced_0_10": {"n_compounds": 2, "compounds_ratio": [0.0, 1.0],
                        "train_max_n_samples": 64, "parallel_samples": 8,
                        "normalize": True},
}


def _pool(n=12):
    rng = np.random.default_rng(1)
    return TableDataset({
        "Smiles": [f"{'C' * (i + 1)}O" for i in range(n)],
        "Formula": [f"C{i + 1}H{2 * i + 4}O" for i in range(n)],
        "IR": [rng.random(1800).tolist() for _ in range(n)],
    })


def _stream(pool, mixture_config, length):
    return IterableDatasetWithLength(
        generator_fn=multi_config_mix,
        generator_args={"dataset": pool, "mixture_config": mixture_config,
                        "split": "train", "seed": 3247},
        length=length, split="train",
    )


def _pipeline(pool, mixture_config, length, batch_size=4):
    stream = _stream(pool, mixture_config, length)
    sampled = stream.take(min(length, 48))
    config = copy.deepcopy(DATA_CONFIG)
    config, preps = fit_preprocessors(sampled.columns, config)
    collator = MultiModalCollator(preps, config, pad_to_batch_size=batch_size)
    collator.fit_lengths(sampled.columns)
    return stream, config, preps, collator


@pytest.mark.parametrize("mixture_config,n_take", [
    ({"balanced": {"n_compounds": 2, "compounds_ratio": [0.3, 0.7],
                   "train_max_n_samples": 64, "parallel_samples": 8,
                   "normalize": True}}, 40),
    (TERNARY, 60),
    (MULTITASK, 60),
])
def test_index_stream_replays_host_generator(mixture_config, n_take):
    pool = _pool()
    smiles = pool["Smiles"]
    formulae = pool["Formula"]
    host = multi_config_mix(pool, mixture_config, "train", seed=11)
    fast = multi_config_index_stream(mixture_config, len(pool), "train",
                                     seed=11)
    n = 0
    for host_sample, decision in zip(host, fast):
        idx, comp, ratios, norm = decision
        assert host_sample["Smiles"] == smiles[idx[comp]]
        assert host_sample["Formula"] == formulae[idx[comp]]
        assert host_sample["Percentage"] == f"{np.asarray(ratios)[comp]}"
        others = ",".join(
            smiles[idx[j]] for j in range(len(idx)) if j != comp
        )
        assert host_sample["Additional_smiles"] == others
        n += 1
        if n >= n_take:
            break
    assert n == n_take
    # Stream lengths agree too (same filtering).
    assert (len(list(multi_config_mix(pool, mixture_config, "train", seed=11)))
            == len(list(multi_config_index_stream(
                mixture_config, len(pool), "train", seed=11))))


@pytest.mark.parametrize("mixture_config,length", [
    (MULTITASK, 40),
    (TERNARY, 36),
])
def test_premix_matches_host_collator(mixture_config, length):
    import jax

    pool = _pool()
    stream, config, preps, collator = _pipeline(pool, mixture_config, length)
    dm = try_build_device_mixture(stream, config, preps, collator,
                                  batch_size=4, seed=3247)
    assert dm is not None
    premix = jax.jit(dm.premix)
    # Regression guard for the closure-constant bug: the lowered module
    # must NOT inline the pool (547 MB of HLO text wedged the remote
    # compiler when it did).
    sample = next(iter(dm.loader))
    lowered_chars = len(premix.lower(dm.consts, sample).as_text())
    assert lowered_chars < 2_000_000, f"pool inlined into HLO ({lowered_chars} chars)"

    host_loader = DataLoader(stream, collator, batch_size=4, prefetch=0)
    for host_batch, idx_batch in zip(host_loader, dm.loader):
        fast = jax.device_get(premix(dm.consts, idx_batch))
        assert host_batch["n_valid"] == idx_batch["n_valid"]
        np.testing.assert_array_equal(
            fast["encoder_inputs"]["Formula"],
            host_batch["encoder_inputs"]["Formula"])
        np.testing.assert_allclose(
            fast["encoder_inputs"]["IR"],
            host_batch["encoder_inputs"]["IR"], rtol=2e-5, atol=2e-6)
        np.testing.assert_array_equal(fast["encoder_mask"],
                                      host_batch["encoder_mask"])
        np.testing.assert_array_equal(fast["decoder_ids"],
                                      host_batch["decoder_ids"])
        np.testing.assert_array_equal(fast["decoder_mask"],
                                      host_batch["decoder_mask"])
        np.testing.assert_array_equal(fast["labels"], host_batch["labels"])
        np.testing.assert_allclose(fast["align_target"],
                                   host_batch["align_target"],
                                   rtol=1e-6, atol=1e-7)


def test_trainer_fit_device_mix_matches_host_path():
    import jax

    from multimodalanalytical_tpu.models import ModelConfig, Seq2SeqModel
    from multimodalanalytical_tpu.models.config import AlignConfig
    from multimodalanalytical_tpu.training.trainer import Trainer

    pool = _pool()
    mixture_config = {"balanced": {"n_compounds": 2, "compounds_ratio": None,
                                   "train_max_n_samples": 24,
                                   "parallel_samples": 8,
                                   "normalize": False}}
    from multimodalanalytical_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    stream, config, preps, collator = _pipeline(pool, mixture_config, 24)
    dm = try_build_device_mixture(stream, config, preps, collator,
                                  batch_size=4, seed=3247, mesh=mesh)
    assert dm is not None

    cfg = ModelConfig(
        d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        vocab_size=config["Smiles"]["vocab_size"],
        pad_token_id=config["Smiles"]["pad_token_id"],
        align_config=AlignConfig(
            align_network="convolutional", hidden_dimension=16,
            conv_channels=8, kernel_size=5, output_dimension=1800,
            loss_lambda=10.0, loss_function="mae",
        ),
    )

    def losses(loader, transform):
        model = Seq2SeqModel(config=cfg, data_config=config,
                             target_modality="Smiles")
        trainer = Trainer(model, preps["Smiles"], num_steps=12, lr=1e-3,
                          seed=5, mesh=mesh, batch_transform=transform)
        batches = list(loader)
        state = trainer.init_state(batches[0])
        out = []
        step = None
        from multimodalanalytical_tpu.parallel.mesh import shard_batch
        from multimodalanalytical_tpu.training.trainer import (
            _device_batch, _modality_segments,
        )
        for batch in batches:
            db = shard_batch(_device_batch(batch), trainer.mesh)
            if step is None:
                probe = db
                if "encoder_inputs" not in probe:
                    probe = jax.eval_shape(trainer._maybe_expand, probe,
                                           trainer._transform_consts)
                step = trainer._build_train_step(
                    _modality_segments(probe["encoder_inputs"],
                                       order=list(config)))
            state, metrics = step(state, db, trainer._transform_consts)
            out.append(float(metrics["loss"]))
        return out

    host_losses = losses(DataLoader(stream, collator, batch_size=4,
                                    prefetch=0), None)
    fast_losses = losses(dm.loader, (dm.premix, dm.consts))
    np.testing.assert_allclose(fast_losses, host_losses, rtol=5e-4)


def test_fallbacks():
    pool = _pool()
    mixed_cfg = {"balanced": {"n_compounds": 2, "compounds_ratio": None,
                              "train_max_n_samples": 0,
                              "parallel_samples": 16384,
                              "normalize": False, "mixed": True}}
    stream, config, preps, collator = _pipeline(
        pool,
        {"balanced": {"n_compounds": 2, "compounds_ratio": None,
                      "train_max_n_samples": 24, "parallel_samples": 8,
                      "normalize": False}},
        24,
    )
    mixed_stream = _stream(pool, mixed_cfg, 12)
    assert try_build_device_mixture(mixed_stream, config, preps, collator,
                                    batch_size=4) is None
    assert try_build_device_mixture(pool, config, preps, collator,
                                    batch_size=4) is None
    with pytest.raises(ValueError):
        next(mixture_index_stream(12, mixed_cfg["balanced"], "train", 1))


def test_loader_final_partial_batch_padded():
    pool = _pool()
    mixture_config = {"balanced": {"n_compounds": 2, "compounds_ratio": None,
                                   "train_max_n_samples": 24,
                                   "parallel_samples": 8,
                                   "normalize": False}}
    loader = DeviceMixtureLoader(len(pool), mixture_config, "train",
                                 seed=3247, batch_size=5, length=23)
    batches = list(loader)
    assert len(batches) == len(loader)
    total = sum(b["n_valid"] for b in batches)
    assert total == min(23, total)
    last = batches[-1]
    assert last["row_valid"].sum() == last["n_valid"]
    assert last["mix_idx"].shape == (5, 2)
