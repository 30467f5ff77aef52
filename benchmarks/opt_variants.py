"""Optimizer-update variants A/B (run on the real TPU chip).

VERDICT r1 #3: the adamw update measured 6.1 ms vs a ~2.4 ms traffic floor
(read g,p,mu,nu + write p,mu,nu ~= 1.6 GB at ~58M f32 params). Variants:

  optax        — current production chain (clip_by_global_norm -> adamw)
  optax_noclip — optax adamw alone (isolates the clip passes)
  fused        — hand-fused per-leaf adamw+clip: one global-norm reduction,
                 then ONE tree_map doing scale+moments+bias-correction+decay+
                 apply per leaf (one fused kernel per leaf)
  flat         — same math on a single flattened vector (mu/nu kept flat;
                 grads concatenated in-graph, updates sliced back out)

Usage: python benchmarks/opt_variants.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B1, B2, EPS, WD, LR, CLIP = 0.9, 0.999, 1e-8, 0.0, 1e-4, 1.0


def _params():
    from __graft_entry__ import _example_batch, _flagship

    model = _flagship(d_model=512, layers=6, ffn=2048, vocab=320,
                      dtype="bfloat16")
    batch = _example_batch(batch=8, n_patches=14, patch=125,
                           formula_len=12, target_len=48, vocab=320)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    return variables["params"]


def _time(fn, *args, reps=30):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps


def fused_update(grads, params, mu, nu, count):
    """One-pass per-leaf adamw with global-norm clip."""
    sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
             for g in jax.tree_util.tree_leaves(grads))
    gnorm = jnp.sqrt(sq)
    scale = jnp.minimum(1.0, CLIP / (gnorm + 1e-16))
    count = count + 1
    c1 = 1.0 - B1 ** count.astype(jnp.float32)
    c2 = 1.0 - B2 ** count.astype(jnp.float32)

    def leaf(g, p, m, v):
        g = g.astype(jnp.float32) * scale
        m = B1 * m + (1.0 - B1) * g
        v = B2 * v + (1.0 - B2) * jnp.square(g)
        update = (m / c1) / (jnp.sqrt(v / c2) + EPS) + WD * p
        return p - LR * update, m, v

    out = jax.tree_util.tree_map(
        lambda g, p, m, v: leaf(g, p, m, v), grads, params, mu, nu)
    new_p = jax.tree_util.tree_map(lambda t: t[0], out,
                                   is_leaf=lambda t: isinstance(t, tuple))
    new_mu = jax.tree_util.tree_map(lambda t: t[1], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
    new_nu = jax.tree_util.tree_map(lambda t: t[2], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
    return new_p, new_mu, new_nu, count


def main():
    import optax
    from jax.flatten_util import ravel_pytree

    params = _params()
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"device={jax.devices()[0]} params={n/1e6:.1f}M "
          f"({sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))/1e6:.0f} MB)")
    grads = jax.tree_util.tree_map(lambda x: x * 1e-3, params)

    results = {}

    # --- optax variants -------------------------------------------------
    for name, opt in (
        ("optax", optax.chain(optax.clip_by_global_norm(CLIP),
                              optax.adamw(LR))),
        ("optax_noclip", optax.adamw(LR)),
    ):
        state = opt.init(params)

        @jax.jit
        def step(g, p, s, _opt=opt):
            updates, s = _opt.update(g, s, p)
            return optax.apply_updates(p, updates), s

        results[name] = _time(step, grads, params, state)

    # --- hand-fused per-leaf -------------------------------------------
    zeros = jax.tree_util.tree_map(
        lambda x: jnp.zeros(x.shape, jnp.float32), params)
    mu = jax.tree_util.tree_map(jnp.copy, zeros)
    nu = jax.tree_util.tree_map(jnp.copy, zeros)
    count = jnp.zeros((), jnp.int32)
    fused = jax.jit(fused_update)
    results["fused"] = _time(fused, grads, params, mu, nu, count)

    # --- flat-state -----------------------------------------------------
    flat_mu = jnp.zeros((n,), jnp.float32)
    flat_nu = jnp.zeros((n,), jnp.float32)

    @jax.jit
    def flat_step(g, p, m, v, c):
        fg, unravel = ravel_pytree(g)
        fg = fg.astype(jnp.float32)
        gnorm = jnp.sqrt(jnp.sum(jnp.square(fg)))
        fg = fg * jnp.minimum(1.0, CLIP / (gnorm + 1e-16))
        c = c + 1
        c1 = 1.0 - B1 ** c.astype(jnp.float32)
        c2 = 1.0 - B2 ** c.astype(jnp.float32)
        m = B1 * m + (1.0 - B1) * fg
        v = B2 * v + (1.0 - B2) * jnp.square(fg)
        update = (m / c1) / (jnp.sqrt(v / c2) + EPS)
        up_tree = unravel(update)
        p = jax.tree_util.tree_map(
            lambda pp, uu: pp - LR * (uu + WD * pp), p, up_tree)
        return p, m, v, c

    results["flat"] = _time(flat_step, grads, params, flat_mu, flat_nu, count)

    for name in sys.argv[1:] or results:
        print(f"{name:14s} {results[name]*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
