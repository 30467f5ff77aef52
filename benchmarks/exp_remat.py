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

    def _orig_state():
        import flax.linen as nn

        from multimodalanalytical_tpu.ops import attention as attn_mod
        import multimodalanalytical_tpu.models.transformer as tr

        return {
            "nn_dropout_call": nn.Dropout.__call__,
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
        import multimodalanalytical_tpu.models.transformer as tr

        nn.Dropout.__call__ = _ORIG["nn_dropout_call"]
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

    def make(name):
        _restore()
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
