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


def test_cross_kernel_matches_xla_math():
    """Fused beam cross-attention kernel (interpret) vs the einsum math."""
    from multimodalanalytical_tpu.ops.beam_attention import (
        beam_cross_attention,
    )

    ls = 11
    key = jax.random.PRNGKey(3)
    kq, kk, kv_, km = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, K, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, ls, D), jnp.bfloat16)
    v = jax.random.normal(kv_, (B, ls, D), jnp.bfloat16)
    keep = jax.random.bernoulli(km, 0.8, (B, ls)).at[:, 0].set(True)
    bias = jnp.where(keep, 0.0, -1e9).astype(jnp.float32)

    got = np.asarray(
        beam_cross_attention(q.reshape(B * K, D), k, v, bias, H, K),
        np.float32,
    ).reshape(B, K, D)

    qh = q.reshape(B, K, H, DH).astype(jnp.float32)
    kh = k.reshape(B, ls, H, DH).astype(jnp.float32)
    vh = v.reshape(B, ls, H, DH).astype(jnp.float32)
    logits = jnp.einsum("bkhd,blhd->bkhl", qh * DH ** -0.5, kh)
    logits = logits + bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    want = np.asarray(
        jnp.einsum("bkhl,blhd->bkhd", probs, vh).reshape(B, K, D), np.float32
    )
    assert np.abs(want - got).max() < 2e-2


def _quantize_cache(cache, num_heads):
    """Reference int8 per-(slot, head) quantization of a bf16 cache."""
    from multimodalanalytical_tpu.ops.attention import quantize_kv_heads

    data, scales = quantize_kv_heads(cache, num_heads)   # (2,B,F,D),(2,B,F,H)
    return data, scales.transpose(0, 1, 3, 2)            # scale (2,B,H,F)


def test_kernel_matches_xla_path_int8():
    """int8-cache kernel vs dequantize-then-XLA reference."""
    from multimodalanalytical_tpu.ops.attention import dequantize_kv

    key = jax.random.PRNGKey(1)
    kq, kc, ka = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, K, D), jnp.bfloat16)
    cache = jax.random.normal(kc, (2, B, L * K, D), jnp.bfloat16)
    ancestry = jax.random.randint(ka, (B, K, L), 0, K)

    data, scale = _quantize_cache(cache, H)
    deq = dequantize_kv(data, scale, H)

    for position in (0, 5, L - 1):
        want = np.asarray(_xla_reference(q, deq, ancestry, position),
                          np.float32)
        got = np.asarray(
            beam_select_attention(q, data, ancestry, position, H,
                                  scales=scale),
            np.float32,
        )
        err = np.abs(want - got).max()
        assert err < 2e-2, f"pos {position}: max err {err}"


def test_quantize_roundtrip_error_bound():
    """x ≈ dequant(quant(x)) within the per-head int8 step size."""
    from multimodalanalytical_tpu.ops.attention import (
        dequantize_kv, quantize_kv_heads,
    )

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 8, D), jnp.float32)
    data, scales = quantize_kv_heads(x, H)
    deq = np.asarray(
        dequantize_kv(data, scales.transpose(0, 1, 3, 2), H), np.float32
    )
    x_np = np.asarray(x)
    # Error per element <= scale/2 (int8 rounding) + bf16 rounding of the
    # dequantized value; scale = absmax/127 per head block.
    step = np.repeat(np.asarray(scales), D // H, axis=-1)
    bound = step * 0.51 + np.abs(x_np) * 2.0 ** -8 + 1e-6
    assert (np.abs(deq - x_np) <= bound).all()


def _fresh_ops(k_new, v_new, h):
    """Pre-quantized fresh rows + lane-padded scale operands, mirroring how
    ops/attention.py builds them for the int8 update kernel."""
    from multimodalanalytical_tpu.ops.attention import quantize_kv_heads

    b, k, d = k_new.shape
    kh = k * h
    pad_kh = -(-kh // 128) * 128

    def one(x):
        xq, s = quantize_kv_heads(x.reshape(b * k, d), h)
        s_bkh = s.reshape(b, k, h)
        hk = jnp.pad(jnp.transpose(s_bkh, (0, 2, 1)),
                     ((0, 0), (0, 0), (0, 128 - k)))
        sel = jnp.pad(s_bkh.reshape(b, kh), ((0, 0), (0, pad_kh - kh)))
        return xq, hk, sel

    k_q, k_hk, k_sel = one(k_new)
    v_q, v_hk, v_sel = one(v_new)
    return (k_q, v_q, jnp.stack([k_hk, v_hk]),
            jnp.stack([k_sel, v_sel], axis=1))


def test_update_kernel_matches_store_then_read():
    """Fused attention+append kernel vs DUS-then-read, bf16 and int8."""
    from multimodalanalytical_tpu.ops.attention import quantize_kv_heads
    from multimodalanalytical_tpu.ops.beam_attention import (
        beam_select_attention, beam_select_attention_update,
    )

    key = jax.random.PRNGKey(7)
    kq, kc, ka, kk, kv_ = jax.random.split(key, 5)
    q = jax.random.normal(kq, (B, K, D), jnp.bfloat16)
    cache = jax.random.normal(kc, (2, B, L * K, D), jnp.bfloat16)
    k_new = jax.random.normal(kk, (B, K, D), jnp.bfloat16)
    v_new = jax.random.normal(kv_, (B, K, D), jnp.bfloat16)
    ancestry = jax.random.randint(ka, (B, K, L), 0, K)
    # Beam n writes slot n at `position` (beam_search sets this row).
    for position in (0, 5, L - 1):
        anc = ancestry.at[:, :, position].set(jnp.arange(K)[None, :])

        # ---- bf16 ----
        stored = jax.lax.dynamic_update_slice(
            cache, jnp.stack([k_new, v_new]), (0, 0, position * K, 0))
        want = np.asarray(
            beam_select_attention(q, stored, anc, position, H), np.float32)
        got, cache_out, _ = beam_select_attention_update(
            q.reshape(B * K, D), k_new.reshape(B * K, D),
            v_new.reshape(B * K, D), cache, anc, position, H)
        got = got.reshape(B, K, D)
        assert np.abs(np.asarray(got, np.float32) - want).max() < 2e-2, (
            f"bf16 pos {position}")
        np.testing.assert_array_equal(
            np.asarray(cache_out), np.asarray(stored))

        # ---- int8 ----
        data0, scale0 = _quantize_cache(cache, H)
        k_q, k_s = quantize_kv_heads(k_new, H)
        v_q, v_s = quantize_kv_heads(v_new, H)
        data_stored = jax.lax.dynamic_update_slice(
            data0, jnp.stack([k_q, v_q]), (0, 0, position * K, 0))
        scale_stored = jax.lax.dynamic_update_slice(
            scale0, jnp.stack([k_s, v_s]).transpose(0, 1, 3, 2),
            (0, 0, 0, position * K))
        want = np.asarray(
            beam_select_attention(q, data_stored, anc, position, H,
                                  scales=scale_stored), np.float32)
        k_qf, v_qf, hk2, sel2 = _fresh_ops(k_new, v_new, H)
        got, data_out, scale_out = beam_select_attention_update(
            q.reshape(B * K, D), k_qf, v_qf, data0, anc, position, H,
            scales=scale0, fresh_scales=hk2, fresh_row_scales=sel2)
        got = got.reshape(B, K, D)
        assert np.abs(np.asarray(got, np.float32) - want).max() < 2e-2, (
            f"int8 pos {position}")
        np.testing.assert_array_equal(
            np.asarray(data_out), np.asarray(data_stored))
        np.testing.assert_allclose(
            np.asarray(scale_out), np.asarray(scale_stored), rtol=1e-6)


def test_update_kernel_scale_window_crossing():
    """int8 scale append at flagship beam count where a step's 10 fresh
    lanes STRADDLE a 128-lane boundary (pos*K = 120..129, 250..259): the
    scale window must be wider than its 128 alignment or the overhanging
    lanes silently keep stale scales (regression: round-3 review)."""
    from multimodalanalytical_tpu.ops.attention import quantize_kv_heads
    from multimodalanalytical_tpu.ops.beam_attention import (
        beam_select_attention_update,
    )

    b, k, h, d, length = 2, 10, 8, 512, 16       # flat 160, scale pad 256
    key = jax.random.PRNGKey(11)
    kq, kc, ka, kk, kv_ = jax.random.split(key, 5)
    q = jax.random.normal(kq, (b, k, d), jnp.bfloat16)
    cache = jax.random.normal(kc, (2, b, length * k, d), jnp.bfloat16)
    k_new = jax.random.normal(kk, (b, k, d), jnp.bfloat16)
    v_new = jax.random.normal(kv_, (b, k, d), jnp.bfloat16)
    ancestry = jax.random.randint(ka, (b, k, length), 0, k)

    data0, scale_exact = quantize_kv_heads(cache, h)
    scale0 = jnp.zeros((2, b, h, 256), jnp.float32)
    scale0 = scale0.at[:, :, :, : length * k].set(
        scale_exact.transpose(0, 1, 3, 2))
    k_q, k_s = quantize_kv_heads(k_new, h)
    v_q, v_s = quantize_kv_heads(v_new, h)

    for position in (12, 15):                    # lanes 120-129, 150-159
        anc = ancestry.at[:, :, position].set(jnp.arange(k)[None, :])
        want_scale = scale0.at[
            :, :, :, position * k : (position + 1) * k
        ].set(jnp.stack([k_s, v_s]).transpose(0, 1, 3, 2))
        k_qf, v_qf, hk2, sel2 = _fresh_ops(k_new, v_new, h)
        _, data_out, scale_out = beam_select_attention_update(
            q.reshape(b * k, d), k_qf, v_qf, data0, anc, position, h,
            scales=scale0, fresh_scales=hk2, fresh_row_scales=sel2)
        np.testing.assert_allclose(
            np.asarray(scale_out), np.asarray(want_scale), rtol=1e-6,
            err_msg=f"pos {position}")
        want_data = jax.lax.dynamic_update_slice(
            data0, jnp.stack([k_q, v_q]), (0, 0, position * k, 0))
        np.testing.assert_array_equal(
            np.asarray(data_out), np.asarray(want_data))


def _sharpen_lm_head(variables, factor=8.0):
    """Scale the lm_head so random-init logits are well separated — beam
    choices then survive sub-percent numerical perturbations (int8 quant)."""
    params = jax.tree_util.tree_map(lambda x: x, dict(variables["params"]))
    params["lm_head"] = dict(params["lm_head"])
    params["lm_head"]["kernel"] = params["lm_head"]["kernel"] * factor
    return {"params": params}


def test_int8_beam_search_matches_bf16():
    """End-to-end beam search with the int8 cache (XLA dequant fallback on
    CPU) must produce the same sequences as the bf16 cache on shapes that
    pass the eligibility gate (d_model 512 -> head_dim 64, beams 4)."""
    import dataclasses

    from __graft_entry__ import _example_batch, _flagship
    from multimodalanalytical_tpu.generation.beam_search import beam_search

    model = _flagship(d_model=512, layers=1, ffn=128, vocab=16)
    batch = _example_batch(batch=2, target_len=8, vocab=16)
    variables = model.init(
        jax.random.PRNGKey(0), batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    variables = _sharpen_lm_head(variables)

    # max_length * beams = 128 passes the quantize gate (flat % 128 == 0).
    seqs_bf, scores_bf = beam_search(
        model, variables, batch["encoder_inputs"],
        jnp.asarray(batch["encoder_mask"]), num_beams=4, max_length=32,
    )

    q_model = dataclasses.replace(model, config=dataclasses.replace(
        model.config, kv_cache_dtype="int8"))
    # Confirm the eligibility gate actually engages for these shapes.
    cache = q_model.apply(
        variables, 2, 4, 32, jnp.zeros((2, 26, 512), jnp.float32), True,
        method=type(q_model).init_beam_cache,
    )
    assert cache["self"][0]["data"].dtype == jnp.int8

    seqs_q, scores_q = beam_search(
        q_model, variables, batch["encoder_inputs"],
        jnp.asarray(batch["encoder_mask"]), num_beams=4, max_length=32,
    )

    assert (np.asarray(seqs_bf) == np.asarray(seqs_q)).all()
    np.testing.assert_allclose(
        np.asarray(scores_bf), np.asarray(scores_q), rtol=0.05, atol=0.05
    )


def test_kernel_in_full_beam_search():
    """End-to-end beam search must be identical with the kernel forced on
    (interpret) and off. Shapes chosen to pass the kernel gate
    (d_model % 128 == 0, head_dim % 64 == 0, beams >= 4)."""
    from __graft_entry__ import _example_batch, _flagship
    from multimodalanalytical_tpu.generation.beam_search import beam_search
    from multimodalanalytical_tpu.ops import attention as attn_mod
    from multimodalanalytical_tpu.ops import beam_attention as bk_mod

    # bfloat16: the production cache dtype — f32 caches are gated OFF the
    # update kernel (the window splice round-trips untouched rows via bf16).
    model = _flagship(d_model=512, layers=1, ffn=128, vocab=16,
                      dtype="bfloat16")
    batch = _example_batch(batch=2, target_len=8, vocab=16)
    variables = model.init(
        jax.random.PRNGKey(0), batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    # Heavier sharpening than the f32 tests: with a bf16 model both paths
    # round differently at every matmul, so beam choices need wider margins
    # to be formulation-invariant.
    variables = _sharpen_lm_head(variables, factor=32.0)

    seqs_xla, scores_xla = beam_search(
        model, variables, batch["encoder_inputs"],
        jnp.asarray(batch["encoder_mask"]), num_beams=4, max_length=16,
    )

    # Force the kernel path on CPU (interpret mode).
    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu-interpret-forced"
        bk_mod._interpret = lambda: True
        seqs_k, scores_k = beam_search(
            model, variables, batch["encoder_inputs"],
            jnp.asarray(batch["encoder_mask"]), num_beams=4, max_length=16,
        )
    finally:
        jax.default_backend = orig
        bk_mod._interpret = lambda: jax.default_backend() == "cpu"

    # bf16 end to end: both paths round differently at every matmul, so
    # low-ranked beams may legitimately swap on a random-init model. The
    # contract: the TOP beam agrees exactly and all normalized scores
    # agree to bf16-level tolerance. (Exact full-beam identity is pinned
    # by the f32 unit tests above and tests/test_beam_golden.py.)
    assert (np.asarray(seqs_xla[:, 0]) == np.asarray(seqs_k[:, 0])).all()
    np.testing.assert_allclose(
        np.asarray(scores_xla), np.asarray(scores_k), rtol=2e-2, atol=2e-2
    )


def test_decode_ffn_kernel_matches_xla():
    """Fused GEGLU FFN kernel (interpret) vs the flax FeedForward bf16 path;
    also checks the in-kernel erf rational against jax.lax.erf."""
    from multimodalanalytical_tpu.models.transformer import FeedForward
    from multimodalanalytical_tpu.ops.decode_ffn import _erf, geglu_ffn

    x_erf = jnp.linspace(-6, 6, 4096, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(_erf(x_erf)), np.asarray(jax.lax.erf(x_erf)), atol=2e-6)

    m, d, f = 256, 128, 256
    for gated in (True, False):
        ff = FeedForward(d_model=d, ffn_dim=f, dropout=0.0, activation="gelu",
                         gated_linear=gated, dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(0), (m, d), jnp.bfloat16)
        params = ff.init(jax.random.PRNGKey(1), x, deterministic=True)
        want = np.asarray(
            ff.apply(params, x, deterministic=True), np.float32)
        p = params["params"]
        got = np.asarray(geglu_ffn(
            x,
            p["linear1"]["kernel"], p["linear1"]["bias"],
            p["gate"]["kernel"] if gated else None,
            p["gate"]["bias"] if gated else None,
            p["linear2"]["kernel"], p["linear2"]["bias"],
        ), np.float32)
        err = np.abs(want - got).max()
        # bf16 rounding differences only (erf poly + accum order).
        assert err < 0.15, f"gated={gated}: max err {err}"
        rel = err / max(np.abs(want).max(), 1e-6)
        assert rel < 0.02, f"gated={gated}: rel err {rel}"
