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
  cache: (2, B, L*K, D) bf16|int8 slot-flattened (flat index l*K + s =
         beam-slot s's time-l row). In the production update kernels the
         rows for `position` are appended IN-KERNEL (quantized for int8)
         via an aligned-window DMA through an ANY-space aliased output;
         the read-only kernels expect them already stored. Flat layout
         means the kernel's (G, L*K, D) blocks need NO in-kernel relayout
         — the (2, L, B, K, D) layout's transpose ran at 126 GB/s.
  q:     (B*K, D) FLAT current-step queries (post q_proj, pre head-split)
         in the update kernels ((B, K, D) in the read-only test kernels);
         2D keeps the XLA-side projection layouts on clean (8,128) tiles.
  onehot:(B, K, L*K') bf16 flattened ancestry one-hot
         (onehot[b, n, l*K'+s] = 1 iff slot s holds beam n's time-l K/V)
  out:   same layout as q, attention output (pre out_proj)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

# Target VMEM budget per cache block (double-buffered by the pipeline).
# A/B'd at 12 vs 20 MB on v5e (round 4): bigger blocks (fewer programs)
# measured ~1% slower end-to-end — the pipeline prefers more, smaller
# programs here.
_BLOCK_BUDGET_BYTES = 12 * 2**20


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _rows_per_program(batch: int, row_bytes: int, beams: int = 0) -> int:
    """Largest divisor of `batch` whose cache block fits the VMEM budget.

    With ``beams`` given (the update kernel's flat-2D q/k/v/out blocks,
    shape (rows*beams, d_model)), the block's second-minor dim must satisfy
    Mosaic tiling: (rows*beams) % 8 == 0 or rows == batch. Returns 0 when
    no divisor satisfies both — the caller must take the XLA path then."""
    best = 0 if beams else 1
    for g in range(1, batch + 1):
        if batch % g or g * row_bytes > _BLOCK_BUDGET_BYTES:
            continue
        if beams and (g * beams) % 8 and g != batch:
            continue
        best = g
    return best


def update_kernel_rows(batch: int, beams: int, length: int, d_model: int,
                       num_heads: int, itemsize: int, quantized: bool) -> int:
    """Rows-per-program the update kernel would use for this shape; 0 means
    the shape has no tile-legal blocking and callers must fall back to XLA
    (ops/attention.py consults this in its kernel_ok gate)."""
    flat = length * beams
    row_bytes = 2 * flat * d_model * itemsize
    if quantized:
        row_bytes += 2 * num_heads * flat * 4  # f32 scale prefix
    return _rows_per_program(batch, row_bytes, beams=beams)


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


def _kernel_upd(pos_ref, q_ref, kn_ref, vn_ref, onehot_ref, cache_ref,
                out_ref, cache_out_ref, stage_ref, sem, *,
                num_heads: int, slots: int):
    """Fused attention + cache append (bf16 cache)."""
    _kernel_impl(pos_ref, q_ref, onehot_ref, cache_ref, None, out_ref,
                 num_heads=num_heads, slots=slots,
                 kn_ref=kn_ref, vn_ref=vn_ref,
                 cache_out_ref=cache_out_ref, stage_ref=stage_ref, sem=sem,
                 flat_io=True)


def _kernel_upd_q8(pos_ref, q_ref, kn_ref, vn_ref, onehot_ref, cache_ref,
                   scale_ref, sc_hk_ref, s_sel_ref, out_ref, cache_out_ref,
                   scale_out_ref, stage_ref, sem, sstage_ref, ssem, *,
                   num_heads: int, slots: int):
    """int8-cache append: kn/vn arrive PRE-quantized (int8) with their
    scales in two lane-padded operands (h-major for the scale buffer,
    row-stacked for the self terms) — quantization happens XLA-side, fused
    with the kv projection."""
    _kernel_impl(pos_ref, q_ref, onehot_ref, cache_ref, scale_ref, out_ref,
                 num_heads=num_heads, slots=slots,
                 kn_ref=kn_ref, vn_ref=vn_ref,
                 sc_hk_ref=sc_hk_ref, s_sel_ref=s_sel_ref,
                 cache_out_ref=cache_out_ref, scale_out_ref=scale_out_ref,
                 stage_ref=stage_ref, sem=sem,
                 sstage_ref=sstage_ref, ssem=ssem, flat_io=True)


def _kernel_impl(pos_ref, q_ref, onehot_ref, cache_ref, scale_ref, out_ref, *,
                 num_heads: int, slots: int, kn_ref=None, vn_ref=None,
                 sc_hk_ref=None, s_sel_ref=None,
                 cache_out_ref=None, scale_out_ref=None,
                 stage_ref=None, sem=None, sstage_ref=None, ssem=None,
                 flat_io: bool = False):
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

    Update mode (kn_ref/vn_ref/cache_out_ref given): the kernel ALSO appends
    this step's K/V rows to the cache via an aliased output block at the
    position-dependent offset — the separate XLA dynamic_update_slice was a
    10-row scatter across every batch row, a partial-tile RMW measured at
    63 us per layer per step on v5e (plus ~0.4 ms/step of quantize fusions,
    now folded in here). The cache block then holds STALE rows at `pos`, so
    cache logits are masked to l < pos and the l == pos term is computed
    directly from the fresh rows (each beam attends its own slot at write
    time by construction — ancestry[:, :, t] = arange). For the int8 cache
    the fresh-row term uses quantize-dequantized values so results are
    IDENTICAL to the store-then-read path.
    """
    pos = pos_ref[0]
    update = kn_ref is not None
    k_t = cache_ref[0]                        # (G, L*K', D) bf16 | int8
    v_t = cache_ref[1]
    q = q_ref[...]                            # (G, K, D) | flat (G*K, D)
    onehot = onehot_ref[...]                  # (G, K, L*K') bf16

    rows, flat, d_model = k_t.shape
    if flat_io:
        # Flat 2D q/out at the XLA boundary (clean (8,128) tile layouts);
        # the (G*K, D) -> (G, K, D) sublane split is free here.
        q = q.reshape(rows, q.shape[0] // rows, d_model)
    beams = q.shape[1]
    length = flat // slots
    head_dim = d_model // num_heads
    kh = beams * num_heads
    scale = head_dim ** -0.5

    # Block-diagonal head mask: (H, D), mask[h, c] = 1 iff c // Dh == h.
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (num_heads, d_model), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (num_heads, d_model), 1)
    head_mask = (c_iota // head_dim) == h_iota

    # Flat-slot validity: slot f holds time l = f // K'. Cache rows
    # participate for l <= pos (l < pos in update mode — the pos rows in
    # the block are stale; the fresh-row term is added separately below).
    fl_iota = jax.lax.broadcasted_iota(jnp.int32, (kh, flat), 1) // slots
    f_valid = (fl_iota < pos) if update else (fl_iota <= pos)  # (K*H, L*K')

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
    # onehot_kh[g, n*H+h, f] = onehot[g, n, f] for every h. Combined with
    # f_valid it is the full flat-slot attention mask: softmax runs directly
    # over the FLAT slot axis (each time group has exactly one ancestor
    # slot, so flat softmax == per-time softmax of the selected logits) —
    # this removed the f32 select matmul and the bf16 spread matmul that
    # made the kernel MXU-bound (round-3 profile: int8 saved nothing).
    onehot_kh_f32 = bdot(rep_b, onehot, 2, 1, batched=True)  # (G, K*H, L*K')
    slot_mask = (onehot_kh_f32 > 0.5) & f_valid[None]        # (G, K*H, L*K')

    # ---- fresh-row (l == pos) term + cache append --------------------
    # The append rides a manual DMA into the ANY-space aliased cache ref.
    # HBM memref slices must be tile-aligned on tiled axes, so a raw
    # (K'=10)-row write at flat offset pos*K' is inexpressible; instead the
    # fresh rows are spliced (tiny permutation matmul + select — in-VMEM
    # dynamic_update_slice is unsupported) into a 32-aligned 64-row WINDOW
    # of the already-loaded cache block, and the window is DMA'd back. The
    # copy overlaps the attention matmuls below; waits land at the end.
    self_k = self_v = None
    pending_copies = []
    deferred_appends = []
    if update:
        i_prog = pl.program_id(0)
        k_new = kn_ref[...]                                  # (G, K, D)
        v_new = vn_ref[...]
        if flat_io:
            k_new = k_new.reshape(rows, beams, d_model)
            v_new = v_new.reshape(rows, beams, d_model)
        # Window geometry: W rows aligned to W/2 (alignment strictly finer
        # than the width so a fresh-row span straddling an alignment
        # boundary always fits: off <= W/2 - 1, off + slots <= W for
        # slots <= W/2 + 1 — the host picks W accordingly, see
        # beam_select_attention_update).
        w_rows = stage_ref.shape[2]
        half = w_rows // 2
        w0 = pl.multiple_of(
            jnp.minimum((pos * slots) // half * half, flat - w_rows), half)
        off = pos * slots - w0
        r_io = jax.lax.broadcasted_iota(jnp.int32, (w_rows, slots), 0)
        n_io = jax.lax.broadcasted_iota(jnp.int32, (w_rows, slots), 1)
        perm_w = jnp.broadcast_to(
            (r_io == off + n_io).astype(jnp.float32)[None],
            (rows, w_rows, slots),
        )                                                    # (G, W, K')
        rd_io = jax.lax.broadcasted_iota(jnp.int32, (w_rows, d_model), 0)
        in_win = (rd_io >= off) & (rd_io < off + slots)      # (W, D)

        def _queue_append_dma(k_store, v_store):
            """int8 path: read the current window rows straight from the
            in-place aliased cache output ref, splice, write home. The
            matmul extraction this replaces had to dequantize the whole
            int8 block to bf16 a second time; the window DMA is ~0.03 MB
            and overlaps the attention matmuls (wait + splice + write-back
            land after the output is computed). Measured on v5e: update
            kernel 3.03 -> 2.45 ms/step at flagship shapes."""
            read_copy = pltpu.make_async_copy(
                cache_out_ref.at[:, pl.ds(i_prog * rows, rows),
                                 pl.ds(w0, w_rows), :],
                stage_ref, sem,
            )
            read_copy.start()

            def _finish():
                read_copy.wait()
                for idx, x_store in ((0, k_store), (1, v_store)):
                    spread = bdot(perm_w, x_store.astype(jnp.float32), 2, 1,
                                  batched=True)              # (G, W, D)
                    if stage_ref.dtype == jnp.int8:
                        fresh = jnp.round(spread).astype(jnp.int8)
                    else:
                        fresh = spread.astype(stage_ref.dtype)
                    stage_ref[idx] = jnp.where(
                        in_win[None], fresh, stage_ref[idx])
                write_copy = pltpu.make_async_copy(
                    stage_ref,
                    cache_out_ref.at[:, pl.ds(i_prog * rows, rows),
                                     pl.ds(w0, w_rows), :],
                    sem,
                )
                write_copy.start()
                pending_copies.append(write_copy)
            deferred_appends.append(_finish)

        def _append_inline(k_store, v_store):
            """bf16 path: extract the window from the already-loaded block
            with a selector matmul and start the write DMA immediately so
            it overlaps the attention matmuls (the deferred DMA-read
            variant serializes wait+splice+write at program end, which
            measured SLOWER for bf16 — 3.03 -> 3.21 ms/step — because the
            bf16 grid runs 2x the programs of int8; the extraction matmul
            reads VMEM already paid for)."""
            wr_io = jax.lax.broadcasted_iota(jnp.int32, (w_rows, flat), 0)
            wf_io = jax.lax.broadcasted_iota(jnp.int32, (w_rows, flat), 1)
            wsel_b = jnp.broadcast_to(
                (wf_io == w0 + wr_io).astype(jnp.bfloat16)[None],
                (rows, w_rows, flat),
            )                                                # (G, W, L*K')

            def _splice(store, new_rows):
                win_old = bdot(wsel_b, store.astype(jnp.bfloat16), 2, 1,
                               batched=True)                 # (G, W, D) f32
                spread = bdot(perm_w, new_rows.astype(jnp.float32), 2, 1,
                              batched=True)                  # (G, W, D)
                return jnp.where(in_win[None], spread, win_old)

            stage_ref[0] = _splice(k_t, k_store).astype(stage_ref.dtype)
            stage_ref[1] = _splice(v_t, v_store).astype(stage_ref.dtype)
            copy = pltpu.make_async_copy(
                stage_ref,
                cache_out_ref.at[:, pl.ds(i_prog * rows, rows),
                                 pl.ds(w0, w_rows), :],
                sem,
            )
            copy.start()
            pending_copies.append(copy)

        # n-major (beam-major) replication: row n*H+h = x[n].
        k_new_rep = bdot(rep_b, k_new.astype(jnp.bfloat16), 2, 1,
                         batched=True)                       # (G, K*H, D) f32
        v_new_rep = bdot(rep_b, v_new.astype(jnp.bfloat16), 2, 1,
                         batched=True)
        if scale_ref is None:
            # bf16 storage: the self term reads what will be stored.
            self_k = k_new_rep.astype(jnp.bfloat16).astype(jnp.float32)
            self_v = v_new_rep.astype(jnp.bfloat16).astype(jnp.float32)
            _append_inline(k_new, v_new)
        else:
            # Per-(row, head) symmetric int8 — same formulas as the XLA
            # quantize_kv_heads (ops/attention.py) so results match the
            # store-then-read path exactly.
            # Fresh rows arrive PRE-quantized (int8) with scales in two
            # lane-padded operands — quantization moved XLA-side where it
            # fuses with the kv projection (the in-kernel absmax/round/rep2
            # stacking was ~cache-length-independent work that dominated
            # the staged average). int8 values are exact in bf16, so the
            # replicated rows times the row scale reproduce the
            # quantize-dequantize values bit-for-bit.
            # s_sel arrives batch-major ((B, 2, pad(K*H)) f32) so the
            # per-program block is (rows, 2, S) with `rows` in the LEADING
            # dim — the (2, rows, S) layout put rows second-minor, which
            # violates Mosaic's (8, 128) tiling whenever rows < 8 (long
            # stages / K=30), and a dynamic ref slice crashed the Mosaic
            # compiler outright.
            s_sel = s_sel_ref[...]                          # (G, 2, S)
            s_sel_k = s_sel[:, 0, :kh].astype(jnp.float32)  # (G, K*H)
            s_sel_v = s_sel[:, 1, :kh].astype(jnp.float32)
            self_k = k_new_rep * s_sel_k[:, :, None]         # (G, K*H, D)
            self_v = v_new_rep * s_sel_v[:, :, None]
            _queue_append_dma(k_new, v_new)
            # Scale append: f32 lane tiles are 128-wide, so the window
            # start must be 128-aligned — and the window must be WIDER
            # than the alignment (256 lanes) or a step whose K' fresh
            # lanes straddle a 128 boundary (e.g. pos*K' = 120..129) falls
            # partly outside it. Same alignment<width rule as the 64-row
            # data window above. Small flat_pad (<256) uses the whole
            # axis (the scale buffer pads flat to a 128 multiple, so the
            # fresh lanes always fit then).
            flat_pad = scale_ref.shape[-1]
            swin = min(256, flat_pad)
            sw0 = pl.multiple_of(
                jnp.minimum((pos * slots) // 128 * 128, flat_pad - swin),
                128)
            soff = pos * slots - sw0
            sc_io = jax.lax.broadcasted_iota(jnp.int32, (slots, swin), 1)
            sn_io = jax.lax.broadcasted_iota(jnp.int32, (slots, swin), 0)
            perm_s = (sc_io == soff + sn_io).astype(jnp.float32)
            hc_io = jax.lax.broadcasted_iota(
                jnp.int32, (num_heads, swin), 1)
            s_in_win = (hc_io >= soff) & (hc_io < soff + slots)  # (H, swin)
            # Lane-window extraction as a selector matmul (same reason as
            # wsel_b above).
            sf_io = jax.lax.broadcasted_iota(jnp.int32, (flat_pad, swin), 0)
            sc2_io = jax.lax.broadcasted_iota(
                jnp.int32, (flat_pad, swin), 1)
            wsel_l = (sf_io == sw0 + sc2_io).astype(jnp.float32)
            for idx in (0, 1):
                s_hk = sc_hk_ref[idx][:, :, :slots].astype(jnp.float32)
                spread = bdot(s_hk, perm_s, 2, 0, batched=False)
                old_win = bdot(scale_ref[idx], wsel_l, 2, 0, batched=False)
                sstage_ref[idx] = jnp.where(s_in_win[None], spread, old_win)
            scopy = pltpu.make_async_copy(
                sstage_ref,
                scale_out_ref.at[:, pl.ds(i_prog * rows, rows), :,
                                 pl.ds(sw0, swin)],
                ssem,
            )
            scopy.start()
            pending_copies.append(scopy)

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
        # k dequant scale s_k (G, H, L*K'): same for every beam row (the
        # scale buffer's flat axis may carry 128-alignment padding).
        qk = qk * bdot(sel_b, scale_ref[0][..., :flat], 2, 1, batched=True)

    # Flat-slot softmax: non-ancestor / out-of-range slots -> -inf; the
    # surviving slot per time group carries exactly the selected logit.
    logits = jnp.where(slot_mask, qk, NEG_INF)               # (G, K*H, L*K')
    if update:
        # Each beam attends its own freshly written row at flat slot
        # pos*K' + n (row m = n*H + h of the stack).
        self_logit = jnp.sum(
            q_bd.astype(jnp.float32) * self_k, axis=-1, keepdims=True
        )                                                    # (G, K*H, 1)
        f_io = jax.lax.broadcasted_iota(jnp.int32, (kh, flat), 1)
        m_io = jax.lax.broadcasted_iota(jnp.int32, (kh, flat), 0)
        self_slot = f_io == pos * slots + m_io // num_heads  # (K*H, L*K')
        logits = jnp.where(self_slot[None], self_logit, logits)
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits - row_max)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)   # (G, K*H, L*K')

    pw = probs
    if scale_ref is not None:
        # Fold the v dequant scale of head h into row (n, h): only that
        # row's head-h output slice is kept, so scaling the whole row by
        # s_v[h] dequantizes exactly the slice that survives.
        pw = pw * bdot(sel_b, scale_ref[1][..., :flat], 2, 1, batched=True)
    if update:
        # Zero the fresh-row slots for the cache V matmul (their rows in
        # the block are stale); the fresh contribution is added below.
        pw = pw * f_valid[None].astype(jnp.float32)

    v_bf = v_t.astype(jnp.bfloat16)
    out_bd = bdot(pw.astype(jnp.bfloat16), v_bf, 2, 1, batched=True)
    if update:
        p_pos = jnp.sum(
            probs * self_slot[None].astype(jnp.float32), axis=-1,
            keepdims=True,
        )                                                    # (G, K*H, 1)
        out_bd = out_bd + p_pos * self_v                     # (G, K*H, D)
    out = jnp.sum(
        out_bd.reshape(rows, beams, num_heads, d_model)
        * head_mask[None, None].astype(jnp.float32),
        axis=2,
    )
    if flat_io:
        out = out.reshape(rows * beams, d_model)
    out_ref[...] = out.astype(out_ref.dtype)
    for fn in deferred_appends:
        fn()
    for c in pending_copies:
        c.wait()


def _cross_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                  num_heads: int, beams: int):
    """Fused beam cross-attention: qk + bias + softmax + probs.V.

    XLA lowers the (B, K, H, Ls) einsum/softmax formulation to tiles with
    both minors tiny (Ls~26 lanes x K=10 sublanes, ~2.5% occupancy) plus
    relayouts between them — measured 186 us per layer per step on v5e,
    the single largest non-self-attention decode cost. Here the same
    block-diagonal (beam, head) row packing as _kernel_impl keeps every
    matmul M = K*H and every VPU op on (K*H, Ls)/(K*H, D) shapes, all in
    VMEM, one HBM pass over K/V.
    """
    k = k_ref[...]                            # (G, Ls, D)
    v = v_ref[...]
    bias = bias_ref[...]                      # (G, Ls) f32
    # Matmuls run in the K/V storage dtype (bf16 in production; f32 models
    # keep f32 so the kernel matches the XLA fallback bit-for-bit-ish).
    mm_dtype = k.dtype

    rows, _, d_model = k.shape
    # Flat 2D q/out at the XLA boundary (see _kernel_impl flat_io).
    q = q_ref[...].reshape(rows, beams, d_model)
    head_dim = d_model // num_heads
    kh = beams * num_heads
    scale = head_dim ** -0.5

    h_iota = jax.lax.broadcasted_iota(jnp.int32, (num_heads, d_model), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (num_heads, d_model), 1)
    head_mask = (c_iota // head_dim) == h_iota

    def bdot(lhs, rhs, contract_lhs, contract_rhs):
        dims = (((contract_lhs,), (contract_rhs,)), ((0,), (0,)))
        return jax.lax.dot_general(lhs, rhs, dims,
                                   preferred_element_type=jnp.float32)

    q_bd = (
        (q * scale).astype(mm_dtype)[:, :, None, :]
        * head_mask[None, None].astype(mm_dtype)
    ).reshape(rows, kh, d_model)              # (G, K*H, D)

    # Bias broadcast (G, Ls) -> (G, K*H, Ls) as a degenerate matmul: the
    # implicit sublane 1 -> K*H broadcast is unsupported by Mosaic on the
    # (K*H, Ls~26) tile shape (crashes), the K=1 matmul is not.
    ones = jnp.ones((rows, kh, 1), jnp.float32)
    logits = bdot(q_bd, k, 2, 2) + bdot(ones, bias[:, None, :], 2, 1)
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits - row_max)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

    out_bd = bdot(probs.astype(mm_dtype), v, 2, 1)           # (G, K*H, D)
    out = jnp.sum(
        out_bd.reshape(rows, beams, num_heads, d_model)
        * head_mask[None, None].astype(jnp.float32),
        axis=2,
    )
    out_ref[...] = out.reshape(rows * beams, d_model).astype(out_ref.dtype)


def beam_cross_attention(
    q: jnp.ndarray,          # (B*K, D) FLAT post q_proj
    k: jnp.ndarray,          # (B, Ls, D) flat encoder K (beam-invariant)
    v: jnp.ndarray,          # (B, Ls, D) flat encoder V
    bias: jnp.ndarray,       # (B, Ls) f32 additive padding bias
    num_heads: int,
    beams: int,
) -> jnp.ndarray:
    """Returns (B*K, D) fused cross-attention output (pre out_proj)."""
    batch, ls, d_model = k.shape
    # K/V blocks are small (~50 KB/row); cap the block well under VMEM so
    # the grid keeps >= ~8 programs and the pipeline overlaps DMA/compute.
    row_bytes = 2 * ls * d_model * k.dtype.itemsize
    rows = 1
    for g in range(1, batch + 1):
        if batch % g == 0 and g * row_bytes <= 2 * 2**20:
            rows = g

    grid = (batch // rows,)
    return pl.pallas_call(
        functools.partial(_cross_kernel, num_heads=num_heads, beams=beams),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows * beams, d_model), lambda i: (i, 0)),
            pl.BlockSpec((rows, ls, d_model), lambda i: (i, 0, 0)),
            pl.BlockSpec((rows, ls, d_model), lambda i: (i, 0, 0)),
            pl.BlockSpec((rows, ls), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rows * beams, d_model), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((batch * beams, d_model), q.dtype),
        interpret=_interpret(),
    )(q, k, v, bias)


def beam_select_attention_update(
    q: jnp.ndarray,          # (B*K, D) FLAT queries
    k_new: jnp.ndarray,      # (B*K, D) this step's K rows (pre-store;
    v_new: jnp.ndarray,      #   int8 pre-quantized when `scales` is given)
    cache: jnp.ndarray,      # (2, B, L*K, D); rows at `position` STALE
    ancestry: jnp.ndarray,   # (B, K, L) int32
    position,                # scalar int32 step index
    num_heads: int,
    scales: jnp.ndarray = None,  # (2, B, H, >=L*K) fp32 when cache is int8
    fresh_scales: jnp.ndarray = None,      # (2, B, H, 128) h-major, lane-pad
    fresh_row_scales: jnp.ndarray = None,  # (B, 2, >=K*H) row-stacked, pad
):
    """Fused attention + in-place cache append.

    q/k_new/v_new arrive FLAT (B*K, D) and out returns flat — 2D keeps the
    XLA-side projection layouts on clean (8,128) tiles (3D (B, 10, D)
    operands force relayout copies at the kernel boundary). int8 caches take
    PRE-quantized fresh rows plus their scales in two lane-padded layouts
    (quantization fuses with the kv projection XLA-side).

    Returns (out (B*K, D), cache', scales' | None) with cache'/scales'
    aliased in-place (donated) — the new rows land at flat offset
    position*K via an in-kernel aligned-window DMA instead of a separate
    dynamic_update_slice scatter.
    """
    two, batch, flat_total, d_model = cache.shape
    beams = ancestry.shape[1]
    # Prefix staging: the stage length comes from the ancestry slice; the
    # cache buffer may be longer (beam_search allocates max_length once) —
    # blocked inputs read only the flat prefix, the aliased output writes
    # land at prefix offsets of the full buffer.
    length = ancestry.shape[2]
    pos = jnp.asarray(position, jnp.int32).reshape((1,))

    flat = length * beams
    row_bytes = 2 * flat * d_model * cache.dtype.itemsize
    if scales is not None:
        row_bytes += 2 * num_heads * flat * scales.dtype.itemsize
    rows = _rows_per_program(batch, row_bytes, beams=beams)
    assert rows > 0, (
        "no tile-legal rows-per-program for this shape; callers must gate "
        "on update_kernel_rows(...) > 0 (ops/attention.py kernel_ok)"
    )

    onehot = (
        ancestry[:, :, :, None] == jnp.arange(beams)[None, None, None, :]
    ).astype(jnp.bfloat16).reshape(batch, beams, length * beams)

    in_specs = [
        pl.BlockSpec((rows * beams, d_model), lambda i, pos: (i, 0)),
        pl.BlockSpec((rows * beams, d_model), lambda i, pos: (i, 0)),
        pl.BlockSpec((rows * beams, d_model), lambda i, pos: (i, 0)),
        pl.BlockSpec((rows, beams, flat), lambda i, pos: (i, 0, 0)),
        pl.BlockSpec((2, rows, flat, d_model), lambda i, pos: (0, i, 0, 0)),
    ]
    # The appended rows land via an in-kernel DMA (VMEM staging scratch ->
    # dynamic flat offset of the ANY-space aliased cache ref): a (K', D)
    # block write at offset pos*K' is not expressible as a blocked output
    # (K'=10 violates Mosaic's second-minor divisibility), and the manual
    # DMA overlaps the attention matmuls.
    out_specs = [
        pl.BlockSpec((rows * beams, d_model), lambda i, pos: (i, 0)),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((batch * beams, d_model), q.dtype),
        jax.ShapeDtypeStruct(cache.shape, cache.dtype),
    ]
    # Append-window size: W = 2 x half with half the smallest multiple of
    # the dtype's sublane tile (16 bf16 / 32 int8) satisfying
    # beams <= half + 1, so any fresh-row span fits a half-aligned W-row
    # window; W is kept minimal because the window is DMA'd back AND forth
    # every call (read-splice-write).
    tile = 32 if cache.dtype == jnp.int8 else 16
    half = tile
    while half + 1 < beams:
        half += tile
    w_rows = min(2 * half, flat)
    scratch_shapes = [
        pltpu.VMEM((2, rows, w_rows, d_model), cache.dtype),
        pltpu.SemaphoreType.DMA,
    ]
    operands = [pos, q, k_new, v_new, onehot, cache]
    # Operand indices include the scalar-prefetch arg (pos = 0).
    aliases = {5: 1}
    kernel = _kernel_upd
    if scales is not None:
        assert fresh_scales is not None and fresh_row_scales is not None, (
            "int8 cache append needs pre-quantized rows + scale operands"
        )
        # Stage prefix of the scale buffer, 128-lane aligned.
        flat_pad = min(-(-flat // 128) * 128, scales.shape[-1])
        in_specs.extend([
            pl.BlockSpec((2, rows, num_heads, flat_pad),
                         lambda i, pos: (0, i, 0, 0)),
            pl.BlockSpec((2, rows) + fresh_scales.shape[2:],
                         lambda i, pos: (0, i, 0, 0)),
            # Batch-major (B, 2, S): rows blocks the LEADING dim (no tile
            # constraint there); the minor (2, S) dims equal the array's.
            pl.BlockSpec((rows,) + fresh_row_scales.shape[1:],
                         lambda i, pos: (i, 0, 0)),
        ])
        out_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))
        out_shapes.append(jax.ShapeDtypeStruct(scales.shape, scales.dtype))
        scratch_shapes.extend([
            pltpu.VMEM((2, rows, num_heads, min(256, flat_pad)),
                       scales.dtype),
            pltpu.SemaphoreType.DMA,
        ])
        operands.extend([scales, fresh_scales, fresh_row_scales])
        aliases[6] = 2
        kernel = _kernel_upd_q8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch // rows,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    outs = pl.pallas_call(
        functools.partial(kernel, num_heads=num_heads, slots=beams),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=_interpret(),
    )(*operands)
    if scales is not None:
        return outs[0], outs[1], outs[2]
    return outs[0], outs[1], None


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
    length = ancestry.shape[2]   # stage prefix (see prefix staging above)
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
        flat_pad = min(-(-flat // 128) * 128, scales.shape[-1])
        in_specs.append(
            pl.BlockSpec((2, rows, num_heads, flat_pad),
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
