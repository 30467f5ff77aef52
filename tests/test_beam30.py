"""Beam-30 decode path (the mixture-paper table-4 recipe).

The reference's real-mixture predict recipe runs ``model.n_beams=30`` with
optional rejection sampling (reference paper_replication/mixture/scripts/
replicate_table_4.sh:29-89). The fused beam kernels and the staged decode
loop were tuned at K=10 (ops/attention.py kernel_ok; beam_search stage
rounding), so K=30 is pinned here across every formulation boundary:

  * fused self-attention kernel (interpret) vs the XLA lazy-ancestry math
    at K=30 flat-slot shapes;
  * staged vs unstaged beam search identity at K=30 (stage rounding with
    gcd(30, 32) = 2 forces 16-multiple stage bounds);
  * full beam search with the kernel forced on vs off at K=30;
  * the K=30 eligibility window itself (30 <= 32 passes the gate; the
    append window stays at 64 rows).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalanalytical_tpu.generation.beam_search import beam_search
from multimodalanalytical_tpu.models import ModelConfig, Seq2SeqModel
from multimodalanalytical_tpu.ops.beam_attention import beam_select_attention

VOCAB = 64  # > 30: the first expansion must offer at least K candidates
BOS, EOS, PAD = 2, 3, 0


def _xla_reference(q, cache, ancestry, position, B, K, L, H, DH):
    kv = cache.reshape(2, B, L, K, H, DH)
    qh = q.reshape(B, K, H, DH)
    onehot = (
        ancestry[:, :, :, None] == jnp.arange(K)[None, None, None, :]
    ).astype(jnp.float32)
    scale = DH ** -0.5
    qk_all = jnp.einsum("bnhd,blkhd->bnhkl", (qh * scale).astype(kv.dtype),
                        kv[0], preferred_element_type=jnp.float32)
    logits = jnp.einsum("bnhkl,bnlk->bnhl", qk_all, onehot)
    slots = jnp.arange(L)[None, None, None, :]
    logits = jnp.where(slots <= position, logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1)
    pw = jnp.einsum("bnhl,bnlk->bnhlk", probs.astype(kv.dtype),
                    onehot.astype(kv.dtype))
    out = jnp.einsum("bnhlk,blkhd->bnhd", pw, kv[1],
                     preferred_element_type=jnp.float32)
    return out.reshape(B, K, H * DH)


def test_kernel_matches_xla_math_at_beam30():
    B, K, L, H, DH = 2, 30, 16, 2, 64  # L*K = 480 (32-mult), D = 128
    key = jax.random.PRNGKey(7)
    kq, kc, ka = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, K, H * DH), jnp.bfloat16)
    cache = jax.random.normal(kc, (2, B, L * K, H * DH), jnp.bfloat16)
    ancestry = jax.random.randint(ka, (B, K, L), 0, K)

    for position in (0, 7, L - 1):
        want = np.asarray(
            _xla_reference(q, cache, ancestry, position, B, K, L, H, DH),
            np.float32,
        )
        got = np.asarray(
            beam_select_attention(q, cache, ancestry, position, H), np.float32
        )
        err = np.abs(want - got).max()
        assert err < 2e-2, f"pos {position}: max err {err}"


@pytest.fixture(scope="module")
def model_and_batch():
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
    rng = np.random.default_rng(5)
    batch = {
        "encoder_inputs": {"IR": rng.random((2, 6, 8)).astype(np.float32)},
        "encoder_mask": np.ones((2, 6), np.int32),
        "decoder_ids": rng.integers(4, VOCAB, (2, 10)).astype(np.int32),
        "decoder_mask": np.ones((2, 10), np.int32),
        "labels": rng.integers(4, VOCAB, (2, 10)).astype(np.int32),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    return model, variables, batch


def test_beam30_shapes_sorting_and_eos(model_and_batch):
    model, variables, batch = model_and_batch
    seqs, scores = beam_search(
        model, variables, batch["encoder_inputs"],
        jnp.asarray(batch["encoder_mask"]), num_beams=30, max_length=16,
    )
    assert seqs.shape == (2, 30, 16)
    assert (np.diff(np.asarray(scores), axis=1) <= 1e-6).all()
    assert (np.asarray(seqs)[:, :, 0] == BOS).all()
    assert (np.asarray(seqs) == EOS).any(axis=-1).all()
    # 30 beams must be 30 DISTINCT hypotheses per row.
    for b in range(2):
        rows = {tuple(r) for r in np.asarray(seqs)[b]}
        assert len(rows) == 30


def test_beam30_staged_equals_unstaged(model_and_batch):
    model, variables, batch = model_and_batch
    kw = dict(num_beams=30, max_length=32)
    staged, s_scores = beam_search(
        model, variables, batch["encoder_inputs"],
        jnp.asarray(batch["encoder_mask"]), stage_size=8, **kw,
    )
    full, f_scores = beam_search(
        model, variables, batch["encoder_inputs"],
        jnp.asarray(batch["encoder_mask"]), stage_size=None, **kw,
    )
    np.testing.assert_array_equal(np.asarray(staged), np.asarray(full))
    np.testing.assert_allclose(np.asarray(s_scores), np.asarray(f_scores),
                               rtol=1e-5, atol=1e-6)


def _sharpen_lm_head(variables, factor):
    import flax

    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    out = {}
    for k, v in flat.items():
        if "lm_head" in k:
            out[k] = v * factor
        else:
            out[k] = v
    return flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in out.items()}
    )


def test_kernel_in_full_beam_search_at_beam30():
    """Forced-kernel (interpret) vs XLA beam search, K=30, flagship-gate
    shapes (d_model 512, head_dim 64; 16-multiple max_length)."""
    from __graft_entry__ import _example_batch, _flagship
    from multimodalanalytical_tpu.ops import beam_attention as bk_mod

    model = _flagship(d_model=512, layers=1, ffn=128, vocab=VOCAB,
                      dtype="bfloat16")
    batch = _example_batch(batch=1, target_len=8, vocab=VOCAB)
    variables = model.init(
        jax.random.PRNGKey(0), batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    variables = _sharpen_lm_head(variables, factor=32.0)

    seqs_xla, scores_xla = beam_search(
        model, variables, batch["encoder_inputs"],
        jnp.asarray(batch["encoder_mask"]), num_beams=30, max_length=16,
    )

    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu-interpret-forced"
        bk_mod._interpret = lambda: True
        seqs_k, scores_k = beam_search(
            model, variables, batch["encoder_inputs"],
            jnp.asarray(batch["encoder_mask"]), num_beams=30, max_length=16,
        )
    finally:
        jax.default_backend = orig
        bk_mod._interpret = lambda: jax.default_backend() == "cpu"

    assert (np.asarray(seqs_xla[:, 0]) == np.asarray(seqs_k[:, 0])).all()
    np.testing.assert_allclose(
        np.asarray(scores_xla), np.asarray(scores_k), rtol=2e-2, atol=2e-2
    )
