"""Fused flash attention (Pallas TPU kernel).

Tiled online-softmax attention for the long-sequence encoder configs
(run-length-encoded / text-spectrum sources reach ~4k tokens,
reference text_spectrum.py:459). For the short patch-IR sequences XLA's
fused attention is already optimal — ``flash_attention`` falls back to the
XLA path when shapes don't qualify.

Scope: encoder self-attention with a key-padding mask. The mask travels as a
compact (B, Lk) additive bias row (never materialized at (B, H, Lq, Lk)).
Decoder attention (<=128 tokens, causal) stays on the XLA path.

Design:
  * grid (B*H, Lq/BLK_Q); each program streams K/V blocks with a
    ``fori_loop`` carrying running max / denominator (online softmax);
  * fp32 accumulation on the MXU (``preferred_element_type``);
  * backward recomputes per-block attention from the saved logsumexp
    (flash-attention-2 style) in a second kernel, wired via
    ``jax.custom_vjp``; per-q-block dK/dV partials are reduced outside.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode only on CPU (tests / dry
    # runs). The real device platform here is "axon" (a TPU relay), where
    # Mosaic compiles natively — checking != "tpu" (round 1 / ADVICE r1)
    # silently interpreted the kernel on the actual TPU.
    return jax.default_backend() == "cpu"

NEG_INF = -1e9

BLK_Q = 256
BLK_K = 256


def _attention_reference(q, k, v, bias):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, blk_k: int):
    """One Q block against all K/V blocks with online softmax.

    Ref blocks: q (1, BLK_Q, D), k/v (1, Lk, D), bias (1, 1, Lk).
    Outputs: o (1, BLK_Q, D), lse (1, BLK_Q, 1).
    """
    q = q_ref[0].astype(jnp.float32)
    scale = q.shape[-1] ** -0.5
    q = q * scale
    lk = k_ref.shape[1]
    n_blocks = pl.cdiv(lk, blk_k)

    blk_q = q.shape[0]
    acc = jnp.zeros((blk_q, q.shape[1]), dtype=jnp.float32)
    row_max = jnp.full((blk_q,), NEG_INF, dtype=jnp.float32)
    denom = jnp.zeros((blk_q,), dtype=jnp.float32)

    def body(i, carry):
        acc, row_max, denom = carry
        start = i * blk_k
        k_blk = k_ref[0, pl.ds(start, blk_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(start, blk_k), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = logits + bias_ref[0, 0, pl.ds(start, blk_k)][None, :].astype(jnp.float32)

        blk_max = jnp.max(logits, axis=-1)
        new_max = jnp.maximum(row_max, blk_max)
        correction = jnp.exp(row_max - new_max)
        probs = jnp.exp(logits - new_max[:, None])
        denom_new = denom * correction + jnp.sum(probs, axis=-1)
        acc_new = acc * correction[:, None] + jax.lax.dot_general(
            probs, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, new_max, denom_new

    acc, row_max, denom = jax.lax.fori_loop(0, n_blocks, body, (acc, row_max, denom))
    safe_denom = jnp.where(denom > 0, denom, 1.0)
    o_ref[0] = (acc / safe_denom[:, None]).astype(o_ref.dtype)
    lse_ref[0] = (row_max + jnp.log(safe_denom))[:, None]


def _fwd(q, k, v, bias_row, blk_q: int, blk_k: int):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    qf = q.reshape(b * h, lq, d)
    kf = k.reshape(b * h, lk, d)
    vf = v.reshape(b * h, lk, d)
    # (B*H, 1, Lk): the singleton middle keeps the block's trailing dims
    # equal to the array dims (Mosaic block-shape rule).
    biasf = jnp.repeat(bias_row, h, axis=0)[:, None, :]

    grid = (b * h, pl.cdiv(lq, blk_q))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, blk_k=blk_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, lk), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, blk_q, 1), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, lq, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(qf, kf, vf, biasf)
    return out.reshape(b, h, lq, d), lse.reshape(b, h, lq)


# ---------------------------------------------------------------------------
# Backward kernel (recompute per block)
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, blk_k: int):
    q = q_ref[0].astype(jnp.float32)
    scale = q.shape[-1] ** -0.5
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, 0]
    lk = k_ref.shape[1]
    n_blocks = pl.cdiv(lk, blk_k)

    delta = jnp.sum(do * o, axis=-1)  # (BLK_Q,)
    dq = jnp.zeros_like(q)

    def body(i, dq):
        start = i * blk_k
        k_blk = k_ref[0, pl.ds(start, blk_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(start, blk_k), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q * scale, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias_ref[0, 0, pl.ds(start, blk_k)][None, :].astype(jnp.float32)
        probs = jnp.exp(logits - lse[:, None])

        dprobs = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dlogits = probs * (dprobs - delta[:, None])

        dq = dq + jax.lax.dot_general(
            dlogits, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dk_blk = jax.lax.dot_general(
            dlogits, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dv_blk = jax.lax.dot_general(
            probs, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_ref[0, 0, pl.ds(start, blk_k), :] = dk_blk.astype(dk_ref.dtype)
        dv_ref[0, 0, pl.ds(start, blk_k), :] = dv_blk.astype(dv_ref.dtype)
        return dq

    dq = jax.lax.fori_loop(0, n_blocks, body, dq)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd(blk_q, blk_k, res, do):
    q, k, v, bias_row, out, lse = res
    b, h, lq, d = q.shape
    lk = k.shape[2]
    qf = q.reshape(b * h, lq, d)
    kf = k.reshape(b * h, lk, d)
    vf = v.reshape(b * h, lk, d)
    of = out.reshape(b * h, lq, d)
    dof = do.reshape(b * h, lq, d)
    lsef = lse.reshape(b * h, lq, 1)
    biasf = jnp.repeat(bias_row, h, axis=0)[:, None, :]

    n_q_blocks = pl.cdiv(lq, blk_q)
    grid = (b * h, n_q_blocks)
    dq, dk_part, dv_part = pl.pallas_call(
        functools.partial(_bwd_kernel, blk_k=blk_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, lk), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, blk_q, 1), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, lk, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, lk, d), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n_q_blocks, lk, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, n_q_blocks, lk, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(qf, kf, vf, biasf, of, lsef, dof)

    dk = dk_part.sum(axis=1).astype(k.dtype).reshape(b, h, lk, d)
    dv = dv_part.sum(axis=1).astype(v.dtype).reshape(b, h, lk, d)
    dq = dq.reshape(b, h, lq, d)
    return dq, dk, dv, None


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, bias_row, blk_q, blk_k):
    out, _ = _fwd(q, k, v, bias_row, blk_q, blk_k)
    return out


def _flash_fwd(q, k, v, bias_row, blk_q, blk_k):
    out, lse = _fwd(q, k, v, bias_row, blk_q, blk_k)
    return out, (q, k, v, bias_row, out, lse)


_flash.defvjp(_flash_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """(B, H, Lq, Dh) attention with a key-padding bias.

    Routes to the Pallas kernel only for self-attention-shaped inputs with a
    (B, 1, 1, Lk) bias and tile-aligned dims; everything else (short
    sequences, causal decoder, cross-attention with per-query bias) uses the
    XLA path, which is optimal there.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    # Engage where the kernel measurably wins (v5e, B8 H8 D64 L4096:
    # fwd 18.9 -> 15.8 ms, bwd 50.9 -> 33.0 ms vs the XLA path, which
    # materializes the (B, H, L, L) logits). Short sequences (patch IR,
    # decoder) stay on XLA, where it is optimal.
    # head_dim 64 covers the whole model family (d_model 512-1024 / 8-16
    # heads). Round 1 required d % 128 == 0, which no shipped config
    # satisfies (ADVICE r1), and required L % 256 == 0, which real
    # tokenized spectra never are — ragged tails are now padded internally.
    qualifies = (
        lq >= 2048 and lq == lk and d % 64 == 0
        and (bias is None or (bias.shape[-2] == 1 and bias.ndim == 4))
    )
    if not qualifies:
        return _attention_reference(q, k, v, bias)
    if bias is None:
        bias_row = jnp.zeros((b, lk), dtype=jnp.float32)
    else:
        bias_row = jnp.broadcast_to(bias[:, 0, 0, :], (b, lk)).astype(jnp.float32)
    # Pad sequence dims up to block multiples; padded keys are masked via
    # the bias row, padded query rows are sliced off the output.
    pad_q = (-lq) % BLK_Q
    pad_k = (-lk) % BLK_K
    if pad_q or pad_k:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        bias_row = jnp.pad(bias_row, ((0, 0), (0, pad_k)),
                           constant_values=NEG_INF)
    out = _flash(q, k, v, bias_row, BLK_Q, BLK_K)
    return out[:, :, :lq, :]
