"""Fused GEGLU feed-forward for the beam-decode hot path (Pallas TPU).

The decode-step FFN (reference custom_modeling.py:137-152 GEGLU) lowers in
XLA to a loop fusion that feeds linear2's MXU pass from an inline
gelu(linear1) * gate producer — measured 64 us per layer-step at flagship
shapes ((1280, 512) x 2048, round-4 decode trace) where the matmuls alone
run in ~30 us. This kernel runs the whole FFN in one pass: both up
projections, exact-erf gelu, gating, and the down projection, with all
intermediates in VMEM and the weight blocks resident across the row grid.

Numerics: matmuls accumulate f32 and round to bf16 between stages exactly
like the flax Dense(dtype=bf16) path; erf uses the same Cephes-style
rational approximation XLA lowers erf to (max |err| ~1e-6 vs jax.lax.erf —
invisible after bf16 rounding). The kernel only engages for bf16 models on
TPU (models/transformer.py FeedForward.decode_fused), so f32 models and CPU
tests keep XLA semantics bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# XLA ErfImpl32 rational coefficients (x * P(x^2) / Q(x^2), |x| <= 4).
_ERF_ALPHA = (0.00022905065861350646, 0.0034082910107109506,
              0.050955695062380861, 0.18520832239976145, 1.128379143519084)
_ERF_BETA = (-1.1791602954361697e-7, 0.000023547966471313185,
             0.0010179625278914885, 0.014070470171167667,
             0.11098505178285362, 0.49746925110067538, 1.0)
_INV_SQRT2 = 0.7071067811865476


def _poly(coeffs, x):
    r = jnp.full_like(x, coeffs[0])
    for c in coeffs[1:]:
        r = r * x + c
    return r


def _erf(x):
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    return x * _poly(_ERF_ALPHA, x2) / _poly(_ERF_BETA, x2)


def _gelu_exact_f32(x):
    """0.5 * x * (1 + erf(x / sqrt(2))) in f32."""
    return 0.5 * x * (1.0 + _erf(x * _INV_SQRT2))


def _ffn_kernel(x_ref, w1_ref, b1_ref, wg_ref, bg_ref, w2_ref, b2_ref,
                o_ref, *, gated: bool):
    x = x_ref[...]                                        # (Mb, D) bf16
    h1 = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h1 = h1.astype(jnp.bfloat16) + b1_ref[...]            # flax Dense rounding
    act = _gelu_exact_f32(h1.astype(jnp.float32)).astype(jnp.bfloat16)
    if gated:
        g = jnp.dot(x, wg_ref[...], preferred_element_type=jnp.float32)
        act = act * (g.astype(jnp.bfloat16) + bg_ref[...])
    y = jnp.dot(act, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (y.astype(jnp.bfloat16) + b2_ref[...]).astype(o_ref.dtype)


def geglu_ffn(
    x: jnp.ndarray,            # (M, D) bf16, M % block == 0
    w1: jnp.ndarray,           # (D, F)
    b1: jnp.ndarray,           # (F,)
    wg,                        # (D, F) | None (ungated)
    bg,                        # (F,)   | None
    w2: jnp.ndarray,           # (F, D)
    b2: jnp.ndarray,           # (D,)
    block_rows: int = 256,
) -> jnp.ndarray:
    """Fused (gated) gelu FFN; returns (M, D) in x.dtype."""
    m, d = x.shape
    f = w1.shape[1]
    gated = wg is not None
    while m % block_rows != 0:
        block_rows //= 2
    grid = (m // block_rows,)
    bf = jnp.bfloat16
    if not gated:
        wg = jnp.zeros((1, 1), bf)
        bg = jnp.zeros((1, 1), bf)
    operands = [
        x.astype(bf),
        w1.astype(bf), b1.astype(bf).reshape(1, f),
        wg.astype(bf), bg.astype(bf).reshape(1, -1),
        w2.astype(bf), b2.astype(bf).reshape(1, d),
    ]
    in_specs = [
        pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
        pl.BlockSpec(w1.shape, lambda i: (0, 0)),
        pl.BlockSpec((1, f), lambda i: (0, 0)),
        pl.BlockSpec(operands[3].shape, lambda i: (0, 0)),
        pl.BlockSpec(operands[4].shape, lambda i: (0, 0)),
        pl.BlockSpec(w2.shape, lambda i: (0, 0)),
        pl.BlockSpec((1, d), lambda i: (0, 0)),
    ]
    return pl.pallas_call(
        functools.partial(_ffn_kernel, gated=gated),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=jax.default_backend() == "cpu",
    )(*operands)
