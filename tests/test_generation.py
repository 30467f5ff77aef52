"""Generation tests: KV-cache consistency and beam-search semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalanalytical_tpu.generation.beam_search import beam_search, greedy_decode
from multimodalanalytical_tpu.models import ModelConfig, Seq2SeqModel
from multimodalanalytical_tpu.models.seq2seq import Seq2SeqModel as M

VOCAB = 16
BOS, EOS, PAD = 2, 3, 0


@pytest.fixture(scope="module")
def model_and_params():
    data_config = {
        "IR": {"type": "1D_patches", "column": "ir", "target": False,
               "preprocessor_arguments": {"patch_size": 8}},
        "Smiles": {"type": "text", "column": "s", "target": True,
                   "vocab_size": VOCAB, "pad_token_id": PAD,
                   "preprocessor_arguments": {}},
    }
    cfg = ModelConfig(
        d_model=32, encoder_layers=1, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, vocab_size=VOCAB,
        dropout=0.0,
    )
    model = Seq2SeqModel(config=cfg, data_config=data_config,
                         target_modality="Smiles")
    rng = np.random.default_rng(0)
    batch = {
        "encoder_inputs": {"IR": rng.random((3, 6, 8)).astype(np.float32)},
        "encoder_mask": np.ones((3, 6), np.int32),
        "decoder_ids": rng.integers(4, VOCAB, (3, 10)).astype(np.int32),
        "decoder_mask": np.ones((3, 10), np.int32),
        "labels": rng.integers(4, VOCAB, (3, 10)).astype(np.int32),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    return model, variables, batch


def test_kv_cache_matches_full_decode(model_and_params):
    """decode_step chain must reproduce decode_train logits exactly."""
    model, variables, batch = model_and_params
    enc_mask = jnp.asarray(batch["encoder_mask"])
    hidden = model.apply(variables, batch["encoder_inputs"], enc_mask,
                         method=M.encode)
    ids = jnp.asarray(batch["decoder_ids"])
    full_logits = model.apply(
        variables, ids, jnp.asarray(batch["decoder_mask"]), hidden, enc_mask,
        method=M.decode_train,
    )

    cache = model.apply(variables, ids.shape[0], ids.shape[1], hidden,
                        method=M.init_cache)
    step_logits = []
    for t in range(ids.shape[1]):
        logits, cache = model.apply(
            variables, ids[:, t:t + 1], t, cache, enc_mask,
            method=M.decode_step,
        )
        step_logits.append(logits)
    step_logits = jnp.stack(step_logits, axis=1)
    err = float(jnp.abs(step_logits - full_logits).max())
    assert err < 1e-4, f"cache/full mismatch {err}"


def test_beam_search_shapes_and_sorting(model_and_params):
    model, variables, batch = model_and_params
    seqs, scores = beam_search(
        model, variables, batch["encoder_inputs"],
        jnp.asarray(batch["encoder_mask"]), num_beams=4, max_length=12,
    )
    assert seqs.shape == (3, 4, 12)
    assert (np.diff(np.asarray(scores), axis=1) <= 1e-6).all()  # sorted desc
    assert (np.asarray(seqs)[:, :, 0] == BOS).all()
    # Every beam must contain an EOS (forced at max length).
    assert (np.asarray(seqs) == EOS).any(axis=-1).all()


def test_greedy_matches_stepwise_argmax(model_and_params):
    """num_beams=1 must follow the stepwise argmax path until EOS."""
    model, variables, batch = model_and_params
    enc_mask = jnp.asarray(batch["encoder_mask"])
    out = greedy_decode(model, variables, batch["encoder_inputs"], enc_mask,
                        max_length=12)
    out = np.asarray(out)

    # Manual argmax rollout with the cache.
    hidden = model.apply(variables, batch["encoder_inputs"], enc_mask,
                         method=M.encode)
    cache = model.apply(variables, 3, 12, hidden, method=M.init_cache)
    tokens = np.full((3, 12), PAD, np.int32)
    tokens[:, 0] = BOS
    finished = np.zeros(3, bool)
    for t in range(11):
        logits, cache = model.apply(
            variables, jnp.asarray(tokens[:, t:t + 1]), t, cache, enc_mask,
            method=M.decode_step,
        )
        nxt = np.asarray(jnp.argmax(logits, -1))
        nxt = np.where(finished, PAD, nxt)
        tokens[:, t + 1] = nxt
        finished |= nxt == EOS

    for b in range(3):
        ref = tokens[b]
        got = out[b]
        # Compare up to the first EOS; the final position is excluded because
        # beam search forces EOS there (forced_eos_token_id semantics) while
        # the naive rollout does not.
        eos_pos = np.argmax(ref == EOS) if (ref == EOS).any() else len(ref) - 1
        end = min(eos_pos + 1, len(ref) - 1)
        assert (got[:end] == ref[:end]).all(), (b, got, ref)
        if (ref == EOS).any():
            assert got[eos_pos] == EOS


@pytest.mark.parametrize("model_type", [
    "T5ForConditionalGeneration", "BartForConditionalGeneration",
])
def test_preset_architectures_train_and_decode(model_type):
    """T5 (RMSNorm + relative bias, no absolute positions) and BART
    (learned positions, post-LN) presets: train forward, cache-consistent
    decode, beam search (reference wrapper.py:182-219 builds real HF graphs
    for these)."""
    from multimodalanalytical_tpu.models.config import resolve_model_config

    data_config = {
        "IR": {"type": "1D_patches", "column": "ir", "target": False,
               "preprocessor_arguments": {"patch_size": 8}},
        "Smiles": {"type": "text", "column": "s", "target": True,
                   "vocab_size": VOCAB, "pad_token_id": PAD,
                   "preprocessor_arguments": {}},
    }
    cfg = resolve_model_config(
        {"model_type": model_type, "d_model": 32, "encoder_layers": 2,
         "decoder_layers": 2, "encoder_attention_heads": 4,
         "decoder_attention_heads": 4, "encoder_ffn_dim": 64,
         "decoder_ffn_dim": 64, "dropout": 0.0},
        vocab_size=VOCAB, pad_token_id=PAD, bos_token_id=BOS,
        eos_token_id=EOS,
    )
    if model_type.startswith("T5"):
        assert cfg.norm_type == "rmsnorm" and cfg.relative_position_bias
        assert not cfg.use_absolute_positions
    model = Seq2SeqModel(config=cfg, data_config=data_config,
                         target_modality="Smiles")
    rng = np.random.default_rng(1)
    batch = {
        "encoder_inputs": {"IR": rng.random((2, 6, 8)).astype(np.float32)},
        "encoder_mask": np.ones((2, 6), np.int32),
        "decoder_ids": rng.integers(4, VOCAB, (2, 9)).astype(np.int32),
        "decoder_mask": np.ones((2, 9), np.int32),
        "labels": rng.integers(4, VOCAB, (2, 9)).astype(np.int32),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    if model_type.startswith("T5"):
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        paths = ["/".join(str(getattr(p, "key", p)) for p in path)
                 for path, _ in flat]
        assert any("rel_bias" in p for p in paths), paths
    out = model.apply(
        variables, batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    assert np.isfinite(float(out["loss"]))

    # cached decode == full decode (relative bias must agree step-wise)
    enc_mask = jnp.asarray(batch["encoder_mask"])
    hidden = model.apply(variables, batch["encoder_inputs"], enc_mask,
                         method=M.encode)
    ids = jnp.asarray(batch["decoder_ids"])
    full_logits = model.apply(
        variables, ids, jnp.asarray(batch["decoder_mask"]), hidden, enc_mask,
        method=M.decode_train,
    )
    cache = model.apply(variables, 2, ids.shape[1], hidden,
                        method=M.init_cache)
    for t in range(ids.shape[1]):
        logits, cache = model.apply(
            variables, ids[:, t:t + 1], t, cache, enc_mask,
            method=M.decode_step,
        )
        err = float(jnp.abs(logits - full_logits[:, t]).max())
        assert err < 1e-3, (model_type, t, err)

    seqs, scores = beam_search(
        model, variables, batch["encoder_inputs"], enc_mask,
        num_beams=3, max_length=10,
    )
    assert seqs.shape == (2, 3, 10)
    assert (np.asarray(seqs) == EOS).any(axis=-1).all()
