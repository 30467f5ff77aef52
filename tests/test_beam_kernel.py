"""Fused beam-attention Pallas kernel vs the XLA formulation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalanalytical_tpu.ops.beam_attention import beam_select_attention

B, K, L, H, DH = 3, 4, 16, 2, 8
D = H * DH


def _xla_reference(q, cache, ancestry, position):
    """The XLA lazy-attention math (mirrors beam_decode_self_attention)."""
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
    return out.reshape(B, K, D)


def test_kernel_matches_xla_path():
    key = jax.random.PRNGKey(0)
    kq, kc, ka = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, K, D), jnp.bfloat16)
    cache = jax.random.normal(kc, (2, B, L * K, D), jnp.bfloat16)
    ancestry = jax.random.randint(ka, (B, K, L), 0, K)

    for position in (0, 5, L - 1):
        want = np.asarray(_xla_reference(q, cache, ancestry, position),
                          np.float32)
        got = np.asarray(
            beam_select_attention(q, cache, ancestry, position, H), np.float32
        )
        err = np.abs(want - got).max()
        assert err < 2e-2, f"pos {position}: max err {err}"


def test_kernel_in_full_beam_search():
    """End-to-end beam search must be identical with the kernel forced on
    (interpret) and off."""
    from __graft_entry__ import _example_batch, _flagship
    from multimodalanalytical_tpu.generation.beam_search import beam_search
    from multimodalanalytical_tpu.ops import attention as attn_mod
    from multimodalanalytical_tpu.ops import beam_attention as bk_mod

    model = _flagship(d_model=32, layers=2, ffn=64, vocab=16)
    batch = _example_batch(batch=2, target_len=8, vocab=16)
    variables = model.init(
        jax.random.PRNGKey(0), batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )

    seqs_xla, scores_xla = beam_search(
        model, variables, batch["encoder_inputs"],
        jnp.asarray(batch["encoder_mask"]), num_beams=3, max_length=10,
    )

    # Force the kernel path on CPU (interpret mode).
    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu-interpret-forced"
        bk_mod._interpret = lambda: True
        seqs_k, scores_k = beam_search(
            model, variables, batch["encoder_inputs"],
            jnp.asarray(batch["encoder_mask"]), num_beams=3, max_length=10,
        )
    finally:
        jax.default_backend = orig
        bk_mod._interpret = lambda: jax.default_backend() == "cpu"

    assert (np.asarray(seqs_xla) == np.asarray(seqs_k)).all()
    np.testing.assert_allclose(
        np.asarray(scores_xla), np.asarray(scores_k), rtol=1e-3, atol=1e-3
    )
