"""Train-step component profiler (run on the real TPU chip).

Round-1 measured the flagship train step at 29.8 ms @ b128 (~20% MFU at
~1.2 TFLOP/step). Decomposes into: forward, forward+backward, optimizer
update, dropout on/off — to locate the non-compute time.

Usage: python benchmarks/profile_train.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 128
VOCAB = 320
TARGET_LEN = 48


def _setup():
    import optax

    from __graft_entry__ import _example_batch, _flagship

    model = _flagship(d_model=512, layers=6, ffn=2048, vocab=VOCAB,
                      dtype="bfloat16")
    batch = _example_batch(batch=BATCH, n_patches=14, patch=125,
                           formula_len=12, target_len=TARGET_LEN, vocab=VOCAB)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["encoder_inputs"], batch["encoder_mask"],
        batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
        deterministic=True,
    )
    params = variables["params"]
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    opt_state = opt.init(params)
    device_batch = {k: jnp.asarray(v) if not isinstance(v, dict) else
                    {kk: jnp.asarray(vv) for kk, vv in v.items()}
                    for k, v in batch.items()}
    return model, params, opt, opt_state, device_batch


def _time_step(fn, *args, reps=20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def main():
    model, params, opt, opt_state, batch = _setup()
    rng = jax.random.PRNGKey(2)

    def loss_fn(p, deterministic, drop_rng):
        out = model.apply(
            {"params": p}, batch["encoder_inputs"], batch["encoder_mask"],
            batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": drop_rng},
        )
        return out["loss"]

    @jax.jit
    def fwd(p):
        return loss_fn(p, True, None)

    @jax.jit
    def fwd_bwd(p):
        loss, grads = jax.value_and_grad(lambda q: loss_fn(q, True, None))(p)
        return loss, jax.tree_util.tree_map(lambda g: g.sum(), grads)

    @jax.jit
    def fwd_bwd_drop(p, r):
        loss, grads = jax.value_and_grad(lambda q: loss_fn(q, False, r))(p)
        return loss, jax.tree_util.tree_map(lambda g: g.sum(), grads)

    @jax.jit
    def fwd_bwd_drop_rbg(p, r):
        rbg = jax.random.wrap_key_data(
            jax.random.key_data(jax.random.split(r, 2)).reshape(4)
            .astype(jnp.uint32), impl="rbg")
        loss, grads = jax.value_and_grad(lambda q: loss_fn(q, False, rbg))(p)
        return loss, jax.tree_util.tree_map(lambda g: g.sum(), grads)

    @jax.jit
    def full_step(p, s, r):
        r = jax.random.wrap_key_data(
            jax.random.key_data(jax.random.split(r, 2)).reshape(4)
            .astype(jnp.uint32), impl="rbg")
        loss, grads = jax.value_and_grad(lambda q: loss_fn(q, False, r))(p)
        updates, s = opt.update(grads, s, p)
        p = jax.tree_util.tree_map(lambda a, b: a + b, p, updates)
        return loss, p, s

    @jax.jit
    def opt_only(p, s):
        grads = jax.tree_util.tree_map(lambda a: a * 1e-6, p)
        updates, s = opt.update(grads, s, p)
        p = jax.tree_util.tree_map(lambda a, b: a + b, p, updates)
        return p, s

    names = sys.argv[1:] or ["fwd", "fwd_bwd", "fwd_bwd_drop",
                             "fwd_bwd_drop_rbg", "opt_only", "full_step"]
    print(f"device={jax.devices()[0]} b={BATCH} tgt={TARGET_LEN} vocab={VOCAB}")
    for name in names:
        if name == "fwd":
            dt = _time_step(fwd, params)
        elif name == "fwd_bwd":
            dt = _time_step(fwd_bwd, params)
        elif name == "fwd_bwd_drop":
            dt = _time_step(fwd_bwd_drop, params, rng)
        elif name == "fwd_bwd_drop_rbg":
            dt = _time_step(fwd_bwd_drop_rbg, params, rng)
        elif name == "opt_only":
            dt = _time_step(opt_only, params, opt_state)
        elif name == "full_step":
            dt = _time_step(full_step, params, opt_state, rng)
        print(f"{name:14s} {dt*1e3:8.2f} ms/step   "
              f"{BATCH/dt:8.0f} spectra/s")


if __name__ == "__main__":
    main()
