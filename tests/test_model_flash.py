"""Model-level flash-attention routing: with use_flash_attention=True and a
long tile-aligned source, the encoder goes through the Pallas kernel
(interpret mode on CPU) and matches the XLA path numerically."""

import jax
import numpy as np
import pytest

from multimodalanalytical_tpu.models import ModelConfig, Seq2SeqModel


def _make(use_flash):
    data_config = {
        "RLE": {"type": "run_length_encoding", "column": "x", "target": False,
                "vocab_size": 32, "pad_token_id": 0,
                "preprocessor_arguments": {}},
        "Smiles": {"type": "text", "column": "s", "target": True,
                   "vocab_size": 16, "pad_token_id": 0,
                   "preprocessor_arguments": {}},
    }
    cfg = ModelConfig(
        d_model=256, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=128, decoder_ffn_dim=128, vocab_size=16, dropout=0.0,
        use_flash_attention=use_flash,
    )
    return Seq2SeqModel(config=cfg, data_config=data_config,
                        target_modality="Smiles")


def test_flash_encoder_matches_xla():
    rng = np.random.default_rng(0)
    batch = {
        "encoder_inputs": {"RLE": rng.integers(4, 32, (2, 256)).astype(np.int32)},
        "encoder_mask": np.ones((2, 256), np.int32),
        "decoder_ids": rng.integers(4, 16, (2, 8)).astype(np.int32),
        "decoder_mask": np.ones((2, 8), np.int32),
        "labels": rng.integers(4, 16, (2, 8)).astype(np.int32),
    }
    batch["encoder_mask"][:, 200:] = 0

    model_flash = _make(True)
    model_xla = _make(False)
    variables = model_flash.init(
        jax.random.PRNGKey(0), batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    out_flash = model_flash.apply(
        variables, batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    out_xla = model_xla.apply(
        variables, batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    np.testing.assert_allclose(
        float(out_flash["loss"]), float(out_xla["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_flash["logits"]), np.asarray(out_xla["logits"]),
        rtol=1e-3, atol=1e-4,
    )
