"""Scratch experiments: train-step copy elimination (remat / layouts).

Variants (fwd+bwd with rbg dropout unless noted):
  base          current code path
  remat_dots    jax.checkpoint(loss, policy=dots_with_no_batch_dims_saveable)
  remat_dotsb   jax.checkpoint(loss, policy=dots_saveable)
  remat_full    jax.checkpoint(loss) (save nothing)
  nodrop        deterministic=True (dropout off) for reference

  keydrop       custom-VJP dropout: save only the rng key, regenerate the
                mask in backward (no u32 bits saved/copied)

  rematffn      nn.remat on the FFN sublayer ONLY: recompute linear1/gate
                activations in backward instead of saving the (B, L, ffn)
                tensors — whole-model remat measured WORSE (PROFILE.md
                round 5) because it recomputes attention too; this targets
                just the widest saves

Usage: python benchmarks/exp_remat.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import profile_train as pt  # noqa: E402


def main():
    model, params, opt, opt_state, batch = pt._setup()
    rng = jax.random.PRNGKey(2)

    def loss_fn(p, drop_rng, deterministic=False):
        out = model.apply(
            {"params": p}, batch["encoder_inputs"], batch["encoder_mask"],
            batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": drop_rng},
        )
        return out["loss"]

    def _rbg(r):
        return jax.random.wrap_key_data(
            jax.random.key_data(jax.random.split(r, 2)).reshape(4)
            .astype(jnp.uint32), impl="rbg")

    policies = {
        "remat_dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "remat_dotsb": jax.checkpoint_policies.dots_saveable,
        "remat_full": None,
    }

    def _patch_keydrop():
        import flax.linen as nn
        from functools import partial
        from jax import lax, random

        @partial(jax.custom_vjp, nondiff_argnums=(2,))
        def rng_dropout(x, key, rate):
            keep_prob = 1.0 - rate
            mask = random.bernoulli(key, p=keep_prob, shape=x.shape)
            return lax.select(mask, x / keep_prob, jnp.zeros_like(x))

        def _f(x, key, rate):
            return rng_dropout(x, key, rate), key

        def _b(rate, key, g):
            keep_prob = 1.0 - rate
            mask = random.bernoulli(key, p=keep_prob, shape=g.shape)
            return lax.select(mask, g / keep_prob, jnp.zeros_like(g)), None

        rng_dropout.defvjp(_f, _b)

        def patched(self, inputs, deterministic=None, rng=None):
            deterministic = nn.merge_param(
                "deterministic", self.deterministic, deterministic)
            if self.rate == 0.0 or deterministic:
                return inputs
            if self.rate == 1.0:
                return jnp.zeros_like(inputs)
            if rng is None:
                rng = self.make_rng(self.rng_collection)
            return rng_dropout(inputs, rng, self.rate)

        nn.Dropout.__call__ = patched

    def _patch_attnlayout():
        """Self/cross attention without explicit head transposes: einsum
        straight from (B, L, H, Dh) operands; XLA's layout assignment
        decides whether a relayout is needed (vs the hand-written
        transpose(0,2,1,3) copies measured at ~0.7 GB/step)."""
        from multimodalanalytical_tpu.ops import attention as attn_mod

        def call(self, query_input, kv_input, bias=None, cache=None,
                 cache_index=None, precomputed_kv=None):
            assert cache is None and precomputed_kv is None
            b, lq, _ = query_input.shape
            h = self.num_heads
            dh = self.d_model // h
            if self.mode == "self":
                q, k, v = self._qkv(query_input)
            else:
                q = self.q_proj(query_input)
                k, v = jnp.split(self.kv_proj(kv_input), 2, axis=-1)
            lk = k.shape[1]
            q = q.reshape(b, lq, h, dh)
            k = k.reshape(b, lk, h, dh)
            v = v.reshape(b, lk, h, dh)
            scale = dh ** -0.5
            logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                                preferred_element_type=jnp.float32)
            if bias is not None:
                logits = logits + bias
            w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", w, v)
            out = out.reshape(b, lq, self.d_model)
            return self.out_proj(out), None

        attn_mod.MultiHeadAttention.__call__ = call

    def _patch_pallasdrop():
        """Route every dropout site through the Pallas fused kernel
        (ops/fused_dropout.py): bits generated in-kernel by the TPU-core
        PRNG, fused with the mask-multiply — no u32 bit tensors in HBM in
        either pass (the copy bucket that survived rounds 5-6)."""
        import flax.linen as nn

        from multimodalanalytical_tpu.ops import dropout as drop_mod
        from multimodalanalytical_tpu.ops.fused_dropout import pallas_dropout

        def patched(self, inputs, deterministic=None, rng=None):
            deterministic = nn.merge_param(
                "deterministic", self.deterministic, deterministic)
            if self.rate == 0.0 or deterministic:
                return inputs
            if self.rate == 1.0:
                return jnp.zeros_like(inputs)
            if rng is None:
                rng = self.make_rng(self.rng_collection)
            return pallas_dropout(inputs, rng, self.rate)

        drop_mod.Dropout.__call__ = patched

    def _orig_state():
        import flax.linen as nn

        from multimodalanalytical_tpu.ops import attention as attn_mod
        from multimodalanalytical_tpu.ops import dropout as drop_mod
        import multimodalanalytical_tpu.models.transformer as tr

        return {
            "nn_dropout_call": nn.Dropout.__call__,
            "repo_dropout_call": drop_mod.Dropout.__call__,
            "attn_call": attn_mod.MultiHeadAttention.__call__,
            "tr_feedforward": tr.FeedForward,
            "tr_dropout": tr.Dropout,
        }

    _ORIG = _orig_state()

    def _restore():
        """Undo every monkeypatch so variants can run in ANY order within
        one invocation (previously a patch leaked into all later variants)."""
        import flax.linen as nn

        from multimodalanalytical_tpu.ops import attention as attn_mod
        from multimodalanalytical_tpu.ops import dropout as drop_mod
        import multimodalanalytical_tpu.models.transformer as tr

        nn.Dropout.__call__ = _ORIG["nn_dropout_call"]
        drop_mod.Dropout.__call__ = _ORIG["repo_dropout_call"]
        attn_mod.MultiHeadAttention.__call__ = _ORIG["attn_call"]
        tr.FeedForward = _ORIG["tr_feedforward"]
        tr.Dropout = _ORIG["tr_dropout"]

    def _patch_rematffn():
        import flax.linen as nn

        import multimodalanalytical_tpu.models.transformer as tr

        # Same param tree (name="ff" is set at the call sites); only the
        # backward schedule changes: linear1/gate/dropout recompute instead
        # of their activations being saved. static_argnums=(2,) is the
        # Python-bool ``deterministic`` (self counts as 0).
        tr.FeedForward = nn.remat(tr.FeedForward, static_argnums=(2,))

    def _matmulonly_fn():
        """GEMM skeleton: the step's matmul inventory at the exact bench
        shapes/dtypes, chained through residual adds, with every
        elementwise stage (LN, softmax, dropout, gelu) and every layout
        change removed. value_and_grad over the weights gives the same
        fwd+bwd GEMM count as the model, so its ms/step is the MXU-bound
        floor of the current architecture: the gap between it and `base`
        is what fusion-structure work (e.g. a Pallas attention block)
        could ever reclaim (VERDICT r3 item 2)."""
        import numpy as np

        d, ffn, vocab = 512, 2048, pt.VOCAB
        b, src, tgt = pt.BATCH, 26, pt.TARGET_LEN
        rng_np = np.random.default_rng(0)

        def w(*shape):
            return jnp.asarray(
                rng_np.standard_normal(shape, dtype=np.float32) * 0.02,
                dtype=jnp.bfloat16)

        weights = {}
        for i in range(6):
            weights[f"enc{i}"] = {
                "qkv": w(d, 3 * d), "o": w(d, d),
                "ff1": w(d, ffn), "ff2": w(ffn, d),
            }
            weights[f"dec{i}"] = {
                "qkv": w(d, 3 * d), "o": w(d, d),
                "xq": w(d, d), "xkv": w(d, 2 * d), "xo": w(d, d),
                "ff1": w(d, ffn), "ff2": w(ffn, d),
            }
        weights["logits"] = w(d, vocab)
        x_enc = jnp.asarray(rng_np.standard_normal((b * src, d),
                                                   dtype=np.float32),
                            dtype=jnp.bfloat16)
        x_dec = jnp.asarray(rng_np.standard_normal((b * tgt, d),
                                                   dtype=np.float32),
                            dtype=jnp.bfloat16)

        h_heads, dh = 8, d // 8

        def attn_gemms(q, k, v, lq, lk):
            # the two true attention contractions, softmax replaced by a
            # bf16 cast (identity-cost); operands stay (B, L, H, Dh) and
            # XLA picks layouts, exactly like the attnlayout variant
            q = q.reshape(b, lq, h_heads, dh)
            k = k.reshape(b, lk, h_heads, dh)
            v = v.reshape(b, lk, h_heads, dh)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", s.astype(jnp.bfloat16), v)
            return ctx.reshape(b * lq, d)

        def skeleton(ws):
            h = x_enc
            for i in range(6):
                lw = ws[f"enc{i}"]
                qkv = h @ lw["qkv"]
                ctx = attn_gemms(qkv[:, :d], qkv[:, d:2 * d],
                                 qkv[:, 2 * d:], src, src)
                h = h + ctx @ lw["o"]
                h = h + (h @ lw["ff1"]) @ lw["ff2"]
            enc = h
            g = x_dec
            for i in range(6):
                lw = ws[f"dec{i}"]
                qkv = g @ lw["qkv"]
                ctx = attn_gemms(qkv[:, :d], qkv[:, d:2 * d],
                                 qkv[:, 2 * d:], tgt, tgt)
                g = g + ctx @ lw["o"]
                kv = enc @ lw["xkv"]
                q = g @ lw["xq"]
                xctx = attn_gemms(q, kv[:, :d], kv[:, d:], tgt, src)
                g = g + xctx @ lw["xo"]
                g = g + (g @ lw["ff1"]) @ lw["ff2"]
            logits = (g @ ws["logits"]).astype(jnp.float32)
            return jnp.mean(logits)

        def f(p, r):
            del r
            loss, grads = jax.value_and_grad(skeleton)(weights)
            return loss, grads

        return f, weights

    def make(name):
        _restore()
        if name == "matmulonly":
            f_skel, skel_weights = _matmulonly_fn()

            @jax.jit
            def g_skel(p, r):
                loss, grads = f_skel(skel_weights, r)
                return loss, jax.tree_util.tree_map(lambda x: x.sum(), grads)
            return g_skel
        if name == "flaxdrop":
            # CONTROL: the product default is now the key-saving dropout;
            # this restores flax nn.Dropout for the A/B.
            import flax.linen as nn

            import multimodalanalytical_tpu.models.transformer as tr
            tr.Dropout = nn.Dropout

            def f(p, r):
                return jax.value_and_grad(lambda q: loss_fn(q, _rbg(r)))(p)
        elif name == "attnlayout":
            _patch_attnlayout()

            def f(p, r):
                return jax.value_and_grad(lambda q: loss_fn(q, _rbg(r)))(p)
        elif name == "attnlayout_keydrop":
            _patch_attnlayout()
            _patch_keydrop()

            def f(p, r):
                return jax.value_and_grad(lambda q: loss_fn(q, _rbg(r)))(p)
        elif name == "keydrop":
            _patch_keydrop()

            def f(p, r):
                return jax.value_and_grad(lambda q: loss_fn(q, _rbg(r)))(p)
        elif name == "pallasdrop":
            _patch_pallasdrop()

            def f(p, r):
                return jax.value_and_grad(lambda q: loss_fn(q, _rbg(r)))(p)
        elif name == "rematffn":
            _patch_rematffn()

            def f(p, r):
                return jax.value_and_grad(lambda q: loss_fn(q, _rbg(r)))(p)
        elif name == "rematffn_keydrop":
            _patch_rematffn()
            _patch_keydrop()

            def f(p, r):
                return jax.value_and_grad(lambda q: loss_fn(q, _rbg(r)))(p)
        elif name == "attnlayout_rematffn":
            _patch_attnlayout()
            _patch_rematffn()

            def f(p, r):
                return jax.value_and_grad(lambda q: loss_fn(q, _rbg(r)))(p)
        elif name == "keydrop_full":
            _patch_keydrop()

            def f(p, r):
                loss, grads = jax.value_and_grad(
                    lambda q: loss_fn(q, _rbg(r)))(p)
                updates, s2 = opt.update(grads, opt_state, p)
                p2 = jax.tree_util.tree_map(lambda a, b: a + b, p, updates)
                return loss, jax.tree_util.tree_leaves(p2)[0].sum()
        elif name == "base":
            def f(p, r):
                return jax.value_and_grad(lambda q: loss_fn(q, _rbg(r)))(p)
        elif name == "nodrop":
            def f(p, r):
                return jax.value_and_grad(
                    lambda q: loss_fn(q, None, deterministic=True))(p)
        elif name in policies:
            pol = policies[name]
            ck = (jax.checkpoint(loss_fn, policy=pol) if pol is not None
                  else jax.checkpoint(loss_fn))

            def f(p, r):
                return jax.value_and_grad(lambda q: ck(q, _rbg(r)))(p)
        else:
            raise SystemExit(f"unknown variant {name}")

        @jax.jit
        def g(p, r):
            loss, grads = f(p, r)
            return loss, jax.tree_util.tree_map(lambda x: x.sum(), grads)
        return g

    names = sys.argv[1:] or ["base", "remat_dots", "remat_dotsb",
                             "remat_full", "nodrop"]
    print(f"device={jax.devices()[0]} b={pt.BATCH} tgt={pt.TARGET_LEN} "
          f"vocab={pt.VOCAB}")
    for name in names:
        g = make(name)
        dt = pt._time_step(g, params, rng)
        print(f"{name:14s} {dt*1e3:8.2f} ms/step   "
              f"{pt.BATCH/dt:8.0f} spectra/s")


if __name__ == "__main__":
    main()
