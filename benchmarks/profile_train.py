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
    # Callable lr so the state carries a ScaleByScheduleState slot (what the
    # Trainer's OneCycle chain has; fused_update pattern-matches it).
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(lambda count: jnp.float32(1e-4),
                                  weight_decay=1e-4))
    opt_state = opt.init(params)
    device_batch = {k: jnp.asarray(v) if not isinstance(v, dict) else
                    {kk: jnp.asarray(vv) for kk, vv in v.items()}
                    for k, v in batch.items()}
    return model, params, opt, opt_state, device_batch


def _fetch_scalar(out):
    # device_get of a big buffer rides the ~35 MB/s axon tunnel and would
    # dominate the timing; pull ONE element (tiny follow-up executable that
    # waits on the output buffer) to sync without the transfer.
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[:1])


def _time_step(fn, *args, reps=20):
    out = fn(*args)
    _fetch_scalar(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _fetch_scalar(out)
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

    # A/B: hand-fused single-pass clip+adamw (one tree_map producing
    # (p', mu', nu') per leaf — no clipped-grads tree, no updates tree, no
    # separate apply pass). Measured IDENTICAL to the optax chain in-situ
    # (21.93 ms both, round 4): XLA already fuses the chain per leaf and
    # interleaves updates into the backward pass. Kept as the record of
    # that experiment.
    def fused_update(p, s, grads):
        import optax as _optax
        clip_state, inner = s
        adam, wd_empty, sched = inner
        g_norm = jnp.sqrt(sum(jnp.sum(x * x)
                              for x in jax.tree_util.tree_leaves(grads)))
        trigger = g_norm < 1.0
        count_inc = adam.count + 1
        bc1 = 1 - 0.9 ** count_inc
        bc2 = 1 - 0.999 ** count_inc
        step_size = -jnp.float32(1e-4)

        def leaf(pl, g, m, v):
            g = jax.lax.select(trigger, g, (g / g_norm) * 1.0)
            m2 = 0.1 * g + 0.9 * m
            v2 = 0.001 * (g * g) + 0.999 * v
            u = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + 1e-8)
            u = step_size * (u + 1e-4 * pl)
            return pl + u, m2, v2

        fused = jax.tree_util.tree_map(leaf, p, grads, adam.mu, adam.nu)
        take = lambda i: jax.tree_util.tree_map(lambda _, t: t[i], p, fused)
        new_adam = _optax.ScaleByAdamState(count=count_inc, mu=take(1),
                                           nu=take(2))
        new_sched = _optax.ScaleByScheduleState(count=sched.count + 1)
        return take(0), (clip_state, (new_adam, wd_empty, new_sched))

    @jax.jit
    def opt_fused(p, s):
        grads = jax.tree_util.tree_map(lambda a: a * 1e-6, p)
        return fused_update(p, s, grads)

    @jax.jit
    def full_step_fused(p, s, r):
        r = jax.random.wrap_key_data(
            jax.random.key_data(jax.random.split(r, 2)).reshape(4)
            .astype(jnp.uint32), impl="rbg")
        loss, grads = jax.value_and_grad(lambda q: loss_fn(q, False, r))(p)
        p, s = fused_update(p, s, grads)
        return loss, p, s

    names = sys.argv[1:] or ["fwd", "fwd_bwd", "fwd_bwd_drop",
                             "fwd_bwd_drop_rbg", "opt_only", "opt_fused",
                             "full_step", "full_step_fused"]
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
