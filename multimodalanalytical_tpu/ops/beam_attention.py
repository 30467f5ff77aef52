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
    _kernel_impl(pos_ref, q_ref, onehot_ref, cache_ref, None, out_ref,
                 num_heads=num_heads, slots=slots)


def _kernel_q8(pos_ref, q_ref, onehot_ref, cache_ref, scale_ref, out_ref, *,
               num_heads: int, slots: int):
    """int8-cache variant: cache_ref int8, scale_ref (2, G, H, L*K') fp32."""
    _kernel_impl(pos_ref, q_ref, onehot_ref, cache_ref, scale_ref, out_ref,
                 num_heads=num_heads, slots=slots)


def _kernel_impl(pos_ref, q_ref, onehot_ref, cache_ref, scale_ref, out_ref, *,
                 num_heads: int, slots: int):
    """Block-diagonal head packing.

    The per-head formulation (one (K, Dh) x (Dh, L*K') matmul per head) pads
    M = K = 10 rows into 128-row MXU tiles (~8% utilization) and repeats the
    select/spread matmuls once per head — measured on v5e the kernel was
    MXU-bound, not HBM-bound (int8 halved the bytes and saved nothing).
    Instead all (beam, head) pairs are stacked into M = K*H rows:

      * q_bd (G, K*H, D): row n*H+h holds q's head-h slice, zeros elsewhere.
        Contracting the FULL D against the cache computes every head in ONE
        matmul — the zero blocks kill cross-head terms exactly, and the 2x
        redundant FLOPs cost ~3x fewer MXU tiles than the padded per-head
        form (M 80 vs 8x10, plus D-dim tiling amortized).
      * select/spread ((.., L*K') @ (L*K', L) and transpose) run ONCE over
        the stacked rows instead of once per head — 8x fewer tiles.
      * probs.V likewise contracts the stacked (G, K*H, L*K') against the
        full (L*K', D) value block; row n*H+h's head-h output slice is
        extracted with the same block-diagonal mask (a cheap VPU reduce).

    int8 cache: the block is converted to bf16 in ONE aligned full-width
    pass (no 64-offset int8 slicing), and the per-(slot, head) dequant
    scales — constant across each contracted head block — are applied to
    the small stacked qk / pw tensors instead of the cache.
    """
    pos = pos_ref[0]
    k_t = cache_ref[0]                        # (G, L*K', D) bf16 | int8
    v_t = cache_ref[1]
    q = q_ref[...]                            # (G, K, D)
    onehot = onehot_ref[...]                  # (G, K, L*K') bf16

    rows, flat, d_model = k_t.shape
    beams = q.shape[1]
    length = flat // slots
    head_dim = d_model // num_heads
    kh = beams * num_heads
    scale = head_dim ** -0.5

    # Constant time-grouping matrix: S[f, l] = 1 iff f // K' == l.
    f_iota = jax.lax.broadcasted_iota(jnp.int32, (flat, length), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (flat, length), 1)
    group = (f_iota // slots) == l_iota                      # (L*K', L)

    # Block-diagonal head mask: (H, D), mask[h, c] = 1 iff c // Dh == h.
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (num_heads, d_model), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (num_heads, d_model), 1)
    head_mask = (c_iota // head_dim) == h_iota

    # Valid positions: l <= pos (broadcast over rows/beams/heads).
    l_pos = jax.lax.broadcasted_iota(jnp.int32, (rows, kh, length), 2)
    valid = l_pos <= pos

    group_f32 = group.astype(jnp.float32)
    group_bf16 = group.astype(jnp.bfloat16)

    def bdot(lhs, rhs, contract_lhs, contract_rhs, batched: bool):
        dims = (((contract_lhs,), (contract_rhs,)),
                (((0,), (0,)) if batched else ((), ())))
        return jax.lax.dot_general(lhs, rhs, dims,
                                   preferred_element_type=jnp.float32)

    # Stack (beam, head) into M: row n*H + h. The (K, H) <-> K*H sublane
    # reshapes below are free (H = native sublane-tile granularity), but
    # reshapes whose LANE dim is the flat slot axis are only supported when
    # flat % 128 == 0 — short decode stages (e.g. 32*10 = 320) break that,
    # so every flat-lane expansion runs as a tiny constant-matrix matmul
    # instead (beam-replication rep / head-replication sel, ~10 MXU tiles).
    m_iota_k = jax.lax.broadcasted_iota(jnp.int32, (kh, beams), 0)
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (kh, beams), 1)
    rep = ((m_iota_k // num_heads) == n_iota)                # (K*H, K)
    rep_b = jnp.broadcast_to(
        rep.astype(jnp.bfloat16)[None], (rows, kh, beams)
    )

    q_bd = (
        (q * scale).astype(jnp.bfloat16)[:, :, None, :]
        * head_mask[None, None].astype(jnp.bfloat16)
    ).reshape(rows, kh, d_model)                             # (G, K*H, D)
    # onehot_kh[g, n*H+h, f] = onehot[g, n, f] for every h.
    onehot_kh_f32 = bdot(rep_b, onehot, 2, 1, batched=True)  # (G, K*H, L*K')
    onehot_kh = onehot_kh_f32.astype(jnp.bfloat16)

    if scale_ref is not None:
        # Head-replication: s_rep[g, n*H+h, f] = s[g, h, f] for every n.
        m_iota_h = jax.lax.broadcasted_iota(jnp.int32, (kh, num_heads), 0)
        h_iota2 = jax.lax.broadcasted_iota(jnp.int32, (kh, num_heads), 1)
        sel = ((m_iota_h % num_heads) == h_iota2)            # (K*H, H)
        sel_b = jnp.broadcast_to(
            sel.astype(jnp.float32)[None], (rows, kh, num_heads)
        )

    k_bf = k_t.astype(jnp.bfloat16)
    qk = bdot(q_bd, k_bf, 2, 2, batched=True)                # (G, K*H, L*K')
    if scale_ref is not None:
        # k dequant scale s_k (G, H, L*K'): same for every beam row.
        qk = qk * bdot(sel_b, scale_ref[0], 2, 1, batched=True)

    # Ancestor select + per-timestep reduce, all heads at once.
    logits = bdot(qk * onehot_kh_f32, group_f32, 2, 0, batched=False)
    logits = jnp.where(valid, logits, NEG_INF)               # (G, K*H, L)
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits - row_max)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    # Spread per-timestep probs back over slots, all heads at once.
    pw = bdot(probs.astype(jnp.bfloat16), group_bf16, 2, 1, batched=False)
    if scale_ref is not None:
        # Fold the v dequant scale of head h into row (n, h): only that
        # row's head-h output slice is kept, so scaling the whole row by
        # s_v[h] dequantizes exactly the slice that survives.
        pw = pw * bdot(sel_b, scale_ref[1], 2, 1, batched=True)
    pw = pw.astype(jnp.bfloat16) * onehot_kh

    v_bf = v_t.astype(jnp.bfloat16)
    out_bd = bdot(pw, v_bf, 2, 1, batched=True)              # (G, K*H, D)
    out = jnp.sum(
        out_bd.reshape(rows, beams, num_heads, d_model)
        * head_mask[None, None].astype(jnp.float32),
        axis=2,
    )
    out_ref[...] = out.astype(out_ref.dtype)


def beam_select_attention(
    q: jnp.ndarray,          # (B, K, D)
    cache: jnp.ndarray,      # (2, B, L*K, D), rows for `position` present
    ancestry: jnp.ndarray,   # (B, K, L) int32
    position,                # scalar int32 step index
    num_heads: int,
    scales: jnp.ndarray = None,  # (2, B, H, L*K) fp32 when cache is int8
) -> jnp.ndarray:
    """Returns (B, K, D) fused beam attention output (pre out_proj)."""
    two, batch, flat_total, d_model = cache.shape
    beams = ancestry.shape[1]
    length = flat_total // beams
    pos = jnp.asarray(position, jnp.int32).reshape((1,))

    flat = length * beams
    row_bytes = 2 * flat * d_model * cache.dtype.itemsize
    if scales is not None:
        row_bytes += 2 * num_heads * flat * scales.dtype.itemsize
    rows = _rows_per_program(batch, row_bytes)

    # Flattened ancestry one-hot, built in XLA (cheap; CSE'd across layers).
    onehot = (
        ancestry[:, :, :, None] == jnp.arange(beams)[None, None, None, :]
    ).astype(jnp.bfloat16).reshape(batch, beams, length * beams)

    in_specs = [
        pl.BlockSpec((rows, beams, d_model), lambda i, pos: (i, 0, 0)),
        pl.BlockSpec((rows, beams, length * beams),
                     lambda i, pos: (i, 0, 0)),
        pl.BlockSpec((2, rows, length * beams, d_model),
                     lambda i, pos: (0, i, 0, 0)),
    ]
    operands = [pos, q, onehot, cache]
    kernel = _kernel
    if scales is not None:
        in_specs.append(
            pl.BlockSpec((2, rows, num_heads, length * beams),
                         lambda i, pos: (0, i, 0, 0))
        )
        operands.append(scales)
        kernel = _kernel_q8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch // rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, beams, d_model),
                               lambda i, pos: (i, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(kernel, num_heads=num_heads, slots=beams),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, beams, d_model), q.dtype),
        # Double-buffered cache blocks plus kernel temporaries exceed the
        # default 16M scoped-vmem limit.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=_interpret(),
    )(*operands)
