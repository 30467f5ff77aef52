"""Integration tests: multimodal (IR + 1H + 13C) batches with modality
dropout, and streaming mixture synthesis with alignment targets."""

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
from multimodalanalytical_tpu.training.loader import DataLoader

SMILES_REGEX = (
    r"(\[[^\]]+]|Br?|Cl?|N|O|S|P|F|I|b|c|n|o|s|p|\(|\)|\.|=|#|-|\+|\\\\|\/|:"
    r"|~|@|\?|>|\*|\$|\%[0-9]{2}|[0-9])"
)


def _multimodal_table(n=12):
    rng = np.random.default_rng(0)
    smiles = ["CCO", "CCN", "CCC", "CC(=O)O"] * (n // 4)
    return TableDataset({
        "Smiles": smiles,
        "Formula": ["C2H6O", "C2H7N", "C3H8", "C2H4O2"] * (n // 4),
        "IR": [rng.random(400).tolist() for _ in range(n)],
        "Multiplets": [
            [{"rangeMax": 3.6, "rangeMin": 3.4, "category": "q", "nH": 2,
              "j_values": None}]
            if i % 3 else None
            for i in range(n)
        ],
        "Carbon": [
            [{"delta (ppm)": 60.1, "intensity": 1.0}] if i % 2 else None
            for i in range(n)
        ],
    })


MULTIMODAL_CONFIG = {
    "Formula": {"type": "text", "column": "Formula", "target": False,
                "preprocessor_arguments": {
                    "tokenizer_regex": r"([A-Z]{1}[a-z]?[0-9]*)"}},
    "Multiplets": {"type": "multiplets", "column": "Multiplets", "target": False,
                   "preprocessor_arguments": {"encoding": "text",
                                              "j_values": False,
                                              "normalise": False}},
    "Carbon": {"type": "carbon", "column": "Carbon", "target": False,
               "preprocessor_arguments": {"intensities": False}},
    "IR": {"type": "1D_patches", "column": "IR", "target": False,
           "preprocessor_arguments": {"patch_size": 50, "interpolation": False,
                                      "masking": False}},
    "Smiles": {"type": "text", "column": "Smiles", "target": True,
               "preprocessor_arguments": {"tokenizer_regex": SMILES_REGEX}},
}


def test_multimodal_collation_and_dropout_training():
    import copy

    import jax

    from multimodalanalytical_tpu.models import ModelConfig, Seq2SeqModel
    from multimodalanalytical_tpu.parallel.mesh import make_mesh, shard_batch
    from multimodalanalytical_tpu.training.trainer import (
        Trainer, _device_batch, _modality_segments,
    )

    table = _multimodal_table()
    config = copy.deepcopy(MULTIMODAL_CONFIG)
    config, preps = fit_preprocessors(table.columns, config)

    collator = MultiModalCollator(preps, config, pad_to_batch_size=8)
    collator.fit_lengths(table.columns)
    loader = DataLoader(table, collator, batch_size=8, shuffle=True, prefetch=0)
    batch = next(iter(loader))

    # Four input modalities concatenated along the source axis.
    segs = _modality_segments(batch["encoder_inputs"])
    assert [m for m, _, _ in segs] == ["Formula", "Multiplets", "Carbon", "IR"]
    assert batch["encoder_mask"].shape[1] == segs[-1][2]
    # None rows are fully masked within their modality slice.
    mult_rows_none = [i for i in range(8) if batch["encoder_inputs"]["Multiplets"] is not None]
    assert batch["labels"].shape == batch["decoder_ids"].shape

    cfg = ModelConfig(
        d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        vocab_size=config["Smiles"]["vocab_size"],
        pad_token_id=config["Smiles"]["pad_token_id"],
    )
    model = Seq2SeqModel(config=cfg, data_config=config, target_modality="Smiles")
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    trainer = Trainer(
        model, preps["Smiles"], num_steps=4, lr=1e-3,
        modality_dropout=["IR", "Multiplets", "Carbon"], mesh=mesh,
    )
    state = trainer.init_state(batch)
    db = shard_batch(_device_batch(batch), mesh)
    step = trainer._build_train_step(_modality_segments(db["encoder_inputs"]))
    for _ in range(3):
        state, metrics = step(state, db)
        assert np.isfinite(float(metrics["loss"]))


def _mixture_table(n=10):
    rng = np.random.default_rng(1)
    return TableDataset({
        "Smiles": [f"{'C' * (i + 1)}O" for i in range(n)],
        "Formula": [f"C{i + 1}H{2 * i + 4}O" for i in range(n)],
        "IR": [rng.random(1800).tolist() for _ in range(n)],
    })


def test_mix_spectra_weighted_average():
    table = _mixture_table()
    mix_config = {
        "n_compounds": 2, "compounds_ratio": [0.3, 0.7],
        "train_max_n_samples": 8, "parallel_samples": 4, "normalize": False,
    }
    samples = list(mix_spectra(table, mix_config, "train", seed=7))
    assert samples, "generator yielded nothing"
    sample = samples[0]
    assert set(sample) == {"Smiles", "Formula", "IR", "Additional_smiles",
                           "Percentage", "IR_target"}
    assert len(sample["IR"]) == 1800
    # The component's pure spectrum differs from the mixture.
    assert not np.allclose(sample["IR"], sample["IR_target"])
    assert sample["Percentage"] in ("0.3", "0.7")


def test_mixture_streaming_through_collator_with_alignment():
    table = _mixture_table()
    mixture_config = {
        "balanced": {
            "n_compounds": 2, "compounds_ratio": None,
            "train_max_n_samples": 8, "parallel_samples": 4,
            "normalize": False,
        }
    }
    stream = IterableDatasetWithLength(
        generator_fn=multi_config_mix,
        generator_args={"dataset": table, "mixture_config": mixture_config,
                        "split": "train", "seed": 3247},
        length=8, split="train",
    )

    config = {
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
    sampled = stream.take(8)
    config, preps = fit_preprocessors(sampled.columns, config)
    collator = MultiModalCollator(preps, config, pad_to_batch_size=4)
    collator.fit_lengths(sampled.columns)
    assert collator.alignment_modality == "IR_target"

    loader = DataLoader(stream, collator, batch_size=4, prefetch=0)
    batch = next(iter(loader))
    assert batch["align_target"].shape == (4, 1800)
    assert (batch["align_target"] != 0).any()
    assert "Percentage" not in batch["encoder_inputs"]


def test_modality_order_stable_under_jit():
    """jit canonicalizes dict pytrees to SORTED key order; the embedding and
    segment math must follow the static data-config order instead, or any
    config whose sorted order differs (e.g. multimodal:
    Formula,Multiplets,Carbon,IR) silently scrambles embeddings against the
    collator's mask layout (round-2 bug found via multitask serving)."""
    import jax
    import jax.numpy as jnp

    from multimodalanalytical_tpu.models import ModelConfig, Seq2SeqModel
    from multimodalanalytical_tpu.training.trainer import _modality_segments

    # config order deliberately NOT sorted
    data_config = {
        "Formula": {"type": "text", "column": "f", "target": False,
                    "vocab_size": 16, "pad_token_id": 0,
                    "preprocessor_arguments": {}},
        "Carbon": {"type": "carbon", "column": "c", "target": False,
                   "vocab_size": 16, "pad_token_id": 0,
                   "preprocessor_arguments": {}},
        "Smiles": {"type": "text", "column": "s", "target": True,
                   "vocab_size": 16, "pad_token_id": 0,
                   "preprocessor_arguments": {}},
    }
    cfg = ModelConfig(d_model=32, encoder_layers=1, decoder_layers=1,
                      encoder_attention_heads=4, decoder_attention_heads=4,
                      encoder_ffn_dim=64, decoder_ffn_dim=64, vocab_size=16,
                      dropout=0.0)
    model = Seq2SeqModel(config=cfg, data_config=data_config,
                         target_modality="Smiles")
    rng = np.random.default_rng(0)
    batch = {
        "encoder_inputs": {
            "Formula": rng.integers(4, 16, (2, 5)).astype(np.int32),
            "Carbon": rng.integers(4, 16, (2, 7)).astype(np.int32),
        },
        "encoder_mask": np.ones((2, 12), np.int32),
        "decoder_ids": rng.integers(4, 16, (2, 6)).astype(np.int32),
        "decoder_mask": np.ones((2, 6), np.int32),
        "labels": rng.integers(4, 16, (2, 6)).astype(np.int32),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )

    def loss(inputs):
        out = model.apply(
            {"params": variables["params"]}, inputs, batch["encoder_mask"],
            batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
            deterministic=True,
        )
        return out["loss"]

    raw = float(loss(batch["encoder_inputs"]))
    jitted = float(jax.jit(loss)(batch["encoder_inputs"]))
    # dict with reversed insertion order must also agree
    reversed_inputs = dict(reversed(list(batch["encoder_inputs"].items())))
    swapped = float(loss(reversed_inputs))
    assert abs(raw - jitted) < 1e-5, (raw, jitted)
    assert abs(raw - swapped) < 1e-5, (raw, swapped)

    # segment attribution must follow the given canonical order
    segs = _modality_segments(
        {k: jnp.asarray(v) for k, v in sorted(batch["encoder_inputs"].items())},
        order=["Formula", "Carbon"],
    )
    assert segs == [("Formula", 0, 5), ("Carbon", 5, 12)]
