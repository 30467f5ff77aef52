"""Alignment-head tests (mixture paper)."""

import jax
import numpy as np
import pytest

from multimodalanalytical_tpu.models import AlignConfig, ModelConfig, Seq2SeqModel
from multimodalanalytical_tpu.models.align import sid


def _model(align_network, loss_function):
    data_config = {
        "IR": {"type": "1D_patches", "column": "ir", "target": False,
               "preprocessor_arguments": {"patch_size": 8}},
        "Smiles": {"type": "text", "column": "s", "target": True,
                   "vocab_size": 16, "pad_token_id": 0,
                   "preprocessor_arguments": {}},
    }
    cfg = ModelConfig(
        d_model=32, encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, vocab_size=16, dropout=0.0,
        align_config=AlignConfig(
            align_network=align_network, hidden_dimension=16,
            conv_channels=8, kernel_size=5, output_dimension=64,
            loss_lambda=10.0, loss_function=loss_function,
        ),
    )
    return Seq2SeqModel(config=cfg, data_config=data_config,
                        target_modality="Smiles")


def _batch(b=4):
    rng = np.random.default_rng(0)
    return dict(
        encoder_inputs={"IR": rng.random((b, 6, 8)).astype(np.float32)},
        encoder_mask=np.ones((b, 6), np.int32),
        decoder_ids=rng.integers(4, 16, (b, 10)).astype(np.int32),
        decoder_mask=np.ones((b, 10), np.int32),
        labels=rng.integers(4, 16, (b, 10)).astype(np.int32),
        align_target=rng.random((b, 64)).astype(np.float32),
    )


@pytest.mark.parametrize("network", ["convolutional", "mlp"])
@pytest.mark.parametrize("loss", ["mse", "mae", "sid"])
def test_align_loss_included(network, loss):
    model = _model(network, loss)
    batch = _batch()
    variables = model.init(
        jax.random.PRNGKey(0), batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        batch["align_target"], deterministic=True,
    )
    out = model.apply(
        variables, batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        batch["align_target"], deterministic=True,
    )
    align = float(out["alignment_loss"])
    assert np.isfinite(align) and align > 0
    assert np.isclose(
        float(out["loss"]),
        float(out["model_only_loss"]) + 10.0 * align,
        rtol=1e-5,
    )


def test_align_loss_ignores_padded_rows():
    model = _model("mlp", "mae")
    batch = _batch(b=4)
    # Make rows 2,3 padding dummies: fully masked, zero targets/labels.
    batch["encoder_mask"][2:] = 0
    batch["labels"][2:] = -100
    batch["align_target"][2:] = 0
    variables = model.init(
        jax.random.PRNGKey(0), batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        batch["align_target"], deterministic=True,
    )
    out_padded = model.apply(
        variables, batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        batch["align_target"], deterministic=True,
    )
    # Same valid rows without padding.
    trimmed = {k: (v[:2] if isinstance(v, np.ndarray) else
                   {m: a[:2] for m, a in v.items()})
               for k, v in batch.items()}
    out_trim = model.apply(
        variables, trimmed["encoder_inputs"], trimmed["encoder_mask"],
        trimmed["decoder_ids"], trimmed["decoder_mask"], trimmed["labels"],
        trimmed["align_target"], deterministic=True,
    )
    assert np.isclose(float(out_padded["alignment_loss"]),
                      float(out_trim["alignment_loss"]), rtol=1e-4)


def test_sid_symmetric_positive():
    rng = np.random.default_rng(0)
    x = np.abs(rng.random((4, 16))) + 0.1
    y = np.abs(rng.random((4, 16))) + 0.1
    import jax.numpy as jnp

    a = float(sid(jnp.asarray(x), jnp.asarray(y)))
    b = float(sid(jnp.asarray(y), jnp.asarray(x)))
    assert np.isclose(a, b) and a > 0
    assert np.isclose(float(sid(jnp.asarray(x), jnp.asarray(x))), 0.0, atol=1e-6)
