"""Flash-attention kernel vs XLA attention at long-sequence encoder shapes.

The RLE / text-spectrum configs produce ~4k-token encoder inputs
(reference text_spectrum.py:459); XLA attention materializes the
(B, H, L, L) logits there. Measures fwd and fwd+bwd wall-clock for both
paths at that shape with the model family's head_dim 64.

Usage: python benchmarks/profile_flash.py [B L H D]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

args = sys.argv[1:]
B = int(args[0]) if len(args) > 0 else 8
L = int(args[1]) if len(args) > 1 else 4096
H = int(args[2]) if len(args) > 2 else 8
D = int(args[3]) if len(args) > 3 else 64


def _time(fn, *a, reps=5):
    out = fn(*a)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.device_get(out)
    return (time.perf_counter() - t0) / reps


def main():
    from multimodalanalytical_tpu.ops.flash_attention import (
        _attention_reference, flash_attention,
    )

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, L, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, H, L, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, H, L, D), jnp.bfloat16)
    keep = jnp.ones((B, L), jnp.int32).at[:, L - 7:].set(0)
    bias = jnp.where(keep[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)

    @jax.jit
    def xla_fwd(q, k, v):
        return _attention_reference(q, k, v, bias).sum().astype(jnp.float32)

    @jax.jit
    def flash_fwd(q, k, v):
        return flash_attention(q, k, v, bias).sum().astype(jnp.float32)

    @jax.jit
    def xla_bwd(q, k, v):
        g = jax.grad(lambda a, b, c: _attention_reference(a, b, c, bias)
                     .astype(jnp.float32).sum(), argnums=(0, 1, 2))(q, k, v)
        return sum(x.astype(jnp.float32).sum() for x in g)

    @jax.jit
    def flash_bwd(q, k, v):
        g = jax.grad(lambda a, b, c: flash_attention(a, b, c, bias)
                     .astype(jnp.float32).sum(), argnums=(0, 1, 2))(q, k, v)
        return sum(x.astype(jnp.float32).sum() for x in g)

    print(f"device={jax.devices()[0]} B={B} L={L} H={H} D={D}")
    # numerics check first
    ref = _attention_reference(q, k, v, bias)
    fl = flash_attention(q, k, v, bias)
    err = float(jnp.abs(ref.astype(jnp.float32) - fl.astype(jnp.float32)).max())
    print(f"max |flash - xla| = {err:.4f}")

    for name, fn in [("xla_fwd", xla_fwd), ("flash_fwd", flash_fwd),
                     ("xla_bwd", xla_bwd), ("flash_bwd", flash_bwd)]:
        dt = _time(fn, q, k, v)
        print(f"{name:10s} {dt*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
