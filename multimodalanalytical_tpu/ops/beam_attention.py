"""Fused lazy-ancestry beam-decode attention (Pallas TPU kernel).

The XLA formulation of the lazy beam attention (ops/attention.py
beam_decode_self_attention) materializes two (B, K, H, K', L) intermediates
per layer per step (~100 MB at flagship scale) for the ancestor-selection
einsums; measured on v5e they cost ~5 ms/step on top of ~4.7 ms for the
q.K contraction (benchmarks/profile_decode.py lazy_pieces). This kernel
fuses the whole read path — q.K over all slots, ancestry select, softmax,
probability spread, probs.V — into one pass over the KV cache, so per-step
HBM traffic drops to the mandatory cache read plus O(B*K*D) in/out.

Mosaic-layout notes: slot-count-minor shapes like (.., L, K'=10) do not
vectorize (lane dim must be 128-aligned), so all slot bookkeeping runs on
FLAT (.., L*K') arrays. The per-timestep reduce (sum over slots) and spread
(broadcast over slots) are expressed as matmuls against a constant 0/1
"time-grouping" matrix S (L*K', L) with S[f, l] = (f // K' == l) — tiny
MXU work instead of unsupported reshapes. Several batch rows share one
program (ROWS_PER_PROGRAM, G-batched matmuls): one program per row leaves
the pipeline latency-bound on ~100k tiny programs per decode.

Layout contract (matches Seq2SeqModel.init_beam_cache):
  cache: (2, B, L*K, D) bf16 slot-flattened (flat index l*K + s = beam-slot
         s's time-l row), rows already updated for this step (the (B, K, D)
         dynamic_update_slice happens OUTSIDE the kernel — it is small and
         XLA performs it in place inside the while_loop). Flat layout means
         the kernel's (G, L*K, D) blocks need NO in-kernel relayout — the
         (2, L, B, K, D) layout's transpose ran the kernel at 126 GB/s.
  q:     (B, K, D)  current-step queries (post q_proj, pre head-split)
  onehot:(B, K, L*K') bf16 flattened ancestry one-hot
         (onehot[b, n, l*K'+s] = 1 iff slot s holds beam n's time-l K/V)
  out:   (B, K, D)  attention output (pre out_proj)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

# Target VMEM budget per cache block (double-buffered by the pipeline).
_BLOCK_BUDGET_BYTES = 12 * 2**20


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _rows_per_program(batch: int, row_bytes: int) -> int:
    """Largest divisor of `batch` whose cache block fits the VMEM budget."""
    best = 1
    for g in range(1, batch + 1):
        if batch % g == 0 and g * row_bytes <= _BLOCK_BUDGET_BYTES:
            best = g
    return best


def _kernel(pos_ref, q_ref, onehot_ref, cache_ref, out_ref, *,
            num_heads: int, slots: int):
    """G batch rows: fused select-attention over all beam slots."""
    pos = pos_ref[0]
    k_t = cache_ref[0]                        # (G, L*K', D) bf16
    v_t = cache_ref[1]
    q = q_ref[...]                            # (G, K, D)
    onehot = onehot_ref[...]                  # (G, K, L*K') bf16

    rows, flat, d_model = k_t.shape
    beams = q.shape[1]
    length = flat // slots
    head_dim = d_model // num_heads
    scale = head_dim ** -0.5

    # Constant time-grouping matrix: S[f, l] = 1 iff f // K' == l.
    f_iota = jax.lax.broadcasted_iota(jnp.int32, (flat, length), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (flat, length), 1)
    group = (f_iota // slots) == l_iota                      # (L*K', L)

    # Valid positions: l <= pos (broadcast over rows/beams).
    l_pos = jax.lax.broadcasted_iota(jnp.int32, (rows, beams, length), 2)
    valid = l_pos <= pos

    onehot_f32 = onehot.astype(jnp.float32)
    group_f32 = group.astype(jnp.float32)
    group_bf16 = group.astype(jnp.bfloat16)

    def bdot(lhs, rhs, contract_lhs, contract_rhs, batched: bool):
        dims = (((contract_lhs,), (contract_rhs,)),
                (((0,), (0,)) if batched else ((), ())))
        return jax.lax.dot_general(lhs, rhs, dims,
                                   preferred_element_type=jnp.float32)

    head_outs = []
    for h in range(num_heads):
        lo = h * head_dim
        q_h = (q[:, :, lo:lo + head_dim] * scale).astype(jnp.bfloat16)
        k_h = k_t[:, :, lo:lo + head_dim]
        qk = bdot(q_h, k_h, 2, 2, batched=True)              # (G, K, L*K')
        # select ancestors, reduce per timestep: (G, K, L*K') @ (L*K', L)
        logits = bdot(qk * onehot_f32, group_f32, 2, 0, batched=False)
        logits = jnp.where(valid, logits, NEG_INF)           # (G, K, L)
        row_max = jnp.max(logits, axis=-1, keepdims=True)
        probs = jnp.exp(logits - row_max)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
        # spread per-timestep probs back over slots: (G, K, L) @ (L*K', L)^T
        pw = bdot(probs.astype(jnp.bfloat16), group_bf16, 2, 1,
                  batched=False).astype(jnp.bfloat16) * onehot
        v_h = v_t[:, :, lo:lo + head_dim]
        o_h = bdot(pw, v_h, 2, 1, batched=True)              # (G, K, Dh)
        head_outs.append(o_h)
    out_ref[...] = jnp.concatenate(head_outs, axis=-1).astype(out_ref.dtype)


def beam_select_attention(
    q: jnp.ndarray,          # (B, K, D)
    cache: jnp.ndarray,      # (2, L, B, K, D), rows for `position` present
    ancestry: jnp.ndarray,   # (B, K, L) int32
    position,                # scalar int32 step index
    num_heads: int,
) -> jnp.ndarray:
    """Returns (B, K, D) fused beam attention output (pre out_proj)."""
    two, batch, flat_total, d_model = cache.shape
    beams = ancestry.shape[1]
    length = flat_total // beams
    pos = jnp.asarray(position, jnp.int32).reshape((1,))

    flat = length * beams
    row_bytes = 2 * flat * d_model * cache.dtype.itemsize
    rows = _rows_per_program(batch, row_bytes)

    # Flattened ancestry one-hot, built in XLA (cheap; CSE'd across layers).
    onehot = (
        ancestry[:, :, :, None] == jnp.arange(beams)[None, None, None, :]
    ).astype(jnp.bfloat16).reshape(batch, beams, length * beams)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch // rows,),
        in_specs=[
            pl.BlockSpec((rows, beams, d_model), lambda i, pos: (i, 0, 0)),
            pl.BlockSpec((rows, beams, length * beams),
                         lambda i, pos: (i, 0, 0)),
            pl.BlockSpec((2, rows, length * beams, d_model),
                         lambda i, pos: (0, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, beams, d_model),
                               lambda i, pos: (i, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, slots=beams),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, beams, d_model), q.dtype),
        # Double-buffered cache blocks plus kernel temporaries exceed the
        # default 16M scoped-vmem limit.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=_interpret(),
    )(pos, q, onehot, cache)
