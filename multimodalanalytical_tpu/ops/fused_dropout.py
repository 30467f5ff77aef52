"""Pallas fused dropout: generate the mask bits IN-KERNEL, fwd and bwd.

Why this exists: XLA's ``RngBitGenerator`` op cannot fuse into its
elementwise consumers, so every dropout site materializes a full u32 bit
tensor to HBM — even with the key-saving VJP (``ops/dropout.py``), the
compiled step re-emits the SAME 36 x u32[128,48,512] +
6 x u32[128,48,2048] ≈ 755 MB/step at bench shapes in both passes
(PROFILE.md rounds 5-6: the copy bucket that survived every layout A/B).
Generating the bits with the TPU core's native PRNG inside a Pallas
kernel fuses generation with the mask-multiply: no bits ever touch HBM.

Semantics: standard inverted dropout (keep with prob ``1-rate``, scale
kept values by ``1/(1-rate)``), deterministic given (key, shape), and the
backward pass regenerates the identical mask from the saved key (custom
VJP — the mask application is linear, so the VJP is the same kernel run
on the cotangent). The random STREAM differs from
``flax.linen.Dropout``'s threefry/rbg stream, so this is a
training-equivalent variant, not a bit-identical one — which is why it is
opt-in (``use_pallas_dropout``) rather than the silent default.

Reference equivalent: torch ``nn.Dropout`` inside the custom layers
(reference modeling/custom_modeling.py:108-199) — torch materializes the
mask too; this is a TPU-side improvement, not a semantic deviation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK_M = 256
# Knuth multiplicative constant as a wrapping int32: decorrelates the
# per-program stream offset from the per-site seed.
_MIX = -1640531527


def _interpret() -> bool:
    # Mosaic compiles natively on the axon TPU relay; interpreter mode is
    # for CPU tests/dry-runs only (same convention as flash_attention.py).
    return jax.default_backend() == "cpu"


def _kernel(seed_ref, x_ref, o_ref, *, rate: float):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * _MIX)
    bits = pltpu.prng_random_bits(x_ref.shape)
    # drop iff bits < rate * 2^32  (P = rate on uniform u32)
    thresh = jnp.uint32(min(int(round(rate * 2.0**32)), 2**32 - 1))
    keep = pltpu.bitcast(bits, jnp.uint32) >= thresh
    inv = jnp.float32(1.0 / (1.0 - rate))
    kept = x_ref[:].astype(jnp.float32) * inv
    o_ref[:] = jnp.where(keep, kept, 0.0).astype(o_ref.dtype)


def _run(x: jnp.ndarray, seed: jnp.ndarray, rate: float) -> jnp.ndarray:
    if _interpret():
        # CPU fallback: the interpreter has no lowering for the TPU-core
        # PRNG primitives. Same contract — mask deterministic given
        # (seed, shape), so fwd and bwd regenerate identically.
        key = jax.random.key(seed[0].astype(jnp.uint32))
        keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
        inv = jnp.float32(1.0 / (1.0 - rate))
        return jnp.where(keep, x.astype(jnp.float32) * inv, 0.0).astype(x.dtype)
    orig_shape = x.shape
    n = orig_shape[-1]
    m = math.prod(orig_shape[:-1]) if len(orig_shape) > 1 else 1
    x2 = x.reshape(m, n)
    pad_m = (-m) % BLK_M
    pad_n = (-n) % 128
    if pad_m or pad_n:
        x2 = jnp.pad(x2, ((0, pad_m), (0, pad_n)))
    grid = (x2.shape[0] // BLK_M,)
    out = pl.pallas_call(
        functools.partial(_kernel, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec((BLK_M, x2.shape[1]),
                                   lambda i, s: (i, 0))],
            out_specs=pl.BlockSpec((BLK_M, x2.shape[1]),
                                   lambda i, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=_interpret(),
    )(seed, x2)
    if pad_m or pad_n:
        out = out[:m, :n]
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_dropout(x: jnp.ndarray, key: jax.Array, rate: float) -> jnp.ndarray:
    """Fused dropout on ``x``; ``key`` is a JAX PRNG key (any impl)."""
    return _run(x, _seed_from_key(key), rate)


def _seed_from_key(key: jax.Array) -> jnp.ndarray:
    kd = jax.random.key_data(key).ravel().astype(jnp.uint32)
    seed = kd[0]
    for i in range(1, kd.shape[0]):
        seed = seed ^ kd[i]
    return seed.astype(jnp.int32).reshape(1)


def _fwd(x, key, rate):
    return pallas_dropout(x, key, rate), key


def _bwd(rate, key, g):
    # mask application is linear: vjp(g) = g * mask * 1/(1-rate) — the
    # exact same kernel on the cotangent (same seed -> same bits).
    return _run(g, _seed_from_key(key), rate), None


pallas_dropout.defvjp(_fwd, _bwd)
