"""Multi-head attention with functional KV caching.

Replaces torch ``nn.MultiheadAttention`` inside the reference's encoder/
decoder layers (reference modeling/custom_modeling.py:108-199) with a
TPU-friendly implementation:

  * batch-first (B, L, D) throughout; head split/merge via reshape,
  * additive mask bias computed once per batch,
  * a *functional* KV cache (explicit pytree threaded through decode steps)
    so jitted beam search can update it with ``lax.dynamic_update_slice`` —
    the reference disables its HF cache entirely (wrapper.py:450),
  * optional fused Pallas flash-attention kernel on TPU for the quadratic
    part (ops/flash_attention.py); XLA fallback elsewhere.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative bias (bf16-safe; true -inf breaks softmax grads)


def quantize_kv_heads(x: jnp.ndarray, num_heads: int):
    """Per-(row, head) symmetric int8 quantization of K/V rows.

    ``x``: (..., D) new cache rows. Returns (q int8 same shape,
    scales (..., H) fp32) with ``x ≈ q * scales`` per 64/128-wide head block.
    Head granularity keeps one outlier dim from wrecking the whole row while
    staying cheap to apply post-matmul (the scale is constant across the
    contracted head dims, so it commutes out of q.K and probs.V)."""
    head_dim = x.shape[-1] // num_heads
    xh = x.reshape(x.shape[:-1] + (num_heads, head_dim)).astype(jnp.float32)
    scales = jnp.maximum(jnp.max(jnp.abs(xh), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(xh / scales[..., None]), -127, 127).astype(jnp.int8)
    return q.reshape(x.shape), scales


def dequantize_kv(data: jnp.ndarray, scale: jnp.ndarray, num_heads: int):
    """Inverse of the cache quantization for the XLA fallback path.

    ``data``: (2, B, F, D) int8, ``scale``: (2, B, H, F) fp32 ->
    (2, B, F, D) bf16."""
    two, b, f, d = data.shape
    head_dim = d // num_heads
    x = data.reshape(two, b, f, num_heads, head_dim).astype(jnp.float32)
    s = scale.transpose(0, 1, 3, 2)[..., None]        # (2, B, F, H, 1)
    return (x * s).astype(jnp.bfloat16).reshape(two, b, f, d)


def make_attention_bias(keep_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, L) keep-mask (1 = attend) -> (B, 1, 1, L) additive bias."""
    return jnp.where(keep_mask[:, None, None, :] > 0, 0.0, NEG_INF).astype(dtype)


def make_causal_bias(seq_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 1, L, L) additive causal bias."""
    mask = jnp.tril(jnp.ones((seq_len, seq_len), dtype=bool))
    return jnp.where(mask, 0.0, NEG_INF).astype(dtype)[None, None, :, :]


def dot_product_attention(
    q: jnp.ndarray,  # (B, H, Lq, Dh)
    k: jnp.ndarray,  # (B, H, Lk, Dh)
    v: jnp.ndarray,  # (B, H, Lk, Dh)
    bias: Optional[jnp.ndarray],
    use_flash: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    # The flash kernel bakes the 1/sqrt(Dh) scale; unscaled attention
    # (T5 fidelity, scale=1.0) takes the XLA path instead.
    if use_flash and scale is None:
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, bias)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def _block_xavier(n_blocks: int):
    """Xavier-uniform applied per output block of a fused projection, so a
    fused (D, n*D) kernel initializes identically-distributed to n separate
    (D, D) kernels."""
    base = nn.initializers.xavier_uniform()

    def init(key, shape, dtype):
        in_dim, out_total = shape
        block = out_total // n_blocks
        keys = jax.random.split(key, n_blocks)
        return jnp.concatenate(
            [base(k, (in_dim, block), dtype) for k in keys], axis=1
        )

    return init


class MultiHeadAttention(nn.Module):
    """Projection + attention; supports cached incremental decoding.

    ``mode`` selects the projection fusion: "self" fuses q/k/v into ONE
    matmul (they share the input; 3 separate matmuls cost 2 extra kernel
    launches per layer per decode step), "cross" keeps q separate and fuses
    k/v (they share the encoder input).
    """

    num_heads: int
    d_model: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    use_beam_kernel: bool = True
    mode: str = "self"             # "self" (fused qkv) | "cross" (q + fused kv)
    use_bias: bool = True          # HF T5 projections are bias-free
    scale_qk: bool = True          # HF T5 skips the 1/sqrt(Dh) logits scale

    def setup(self) -> None:
        init = nn.initializers.xavier_uniform()
        if self.mode == "self":
            self.qkv_proj = nn.Dense(3 * self.d_model, dtype=self.dtype,
                                     use_bias=self.use_bias,
                                     kernel_init=_block_xavier(3))
        else:
            self.q_proj = nn.Dense(self.d_model, dtype=self.dtype,
                                   use_bias=self.use_bias, kernel_init=init)
            self.kv_proj = nn.Dense(2 * self.d_model, dtype=self.dtype,
                                    use_bias=self.use_bias,
                                    kernel_init=_block_xavier(2))
        self.out_proj = nn.Dense(self.d_model, dtype=self.dtype,
                                 use_bias=self.use_bias, kernel_init=init)

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, _ = x.shape
        head_dim = self.d_model // self.num_heads
        return x.reshape(b, l, self.num_heads, head_dim).transpose(0, 2, 1, 3)

    def _qkv(self, x: jnp.ndarray):
        """Fused q/k/v projection (flat (B, L, D) each)."""
        fused = self.qkv_proj(x)
        return jnp.split(fused, 3, axis=-1)

    def project_kv(self, kv_input: jnp.ndarray):
        """Project encoder K/V once for reuse across all decode steps."""
        k, v = jnp.split(self.kv_proj(kv_input), 2, axis=-1)
        return self._split(k), self._split(v)

    def project_kv_flat(self, kv_input: jnp.ndarray):
        """Encoder K/V kept FLAT (B, Ls, D) — no head split.

        The fused beam cross-attention kernel contracts the full channel
        axis with block-diagonal head masking (ops/beam_attention.py
        _cross_kernel), so channel c of q meets channel c of k directly and
        the head-split transpose never has to exist."""
        k, v = jnp.split(self.kv_proj(kv_input), 2, axis=-1)
        return k, v

    def decode_self_attention(
        self,
        x: jnp.ndarray,               # (B, 1, D) current-token hidden
        cache_kv: jnp.ndarray,        # (2, B, L_max, D) fused batch-major K/V
        position,                     # scalar step index
        extra_bias=None,              # optional (1, H, 1, L) additive bias
    ):
        """Single-token cached self-attention.

        Cache layout (k/v, batch, time, d_model): the per-step attention
        READS stream the whole cache, so the time x feature block of one
        batch row must be contiguous (a time-major layout makes those reads
        ~1KB strided gathers at a few % of HBM bandwidth). The per-step
        WRITE of one (B, 1, D) row is strided but only ~MBs. Returns
        (out (B, 1, D), updated cache).
        """
        head_dim = self.d_model // self.num_heads
        batch = x.shape[0]
        q_flat, k_new, v_new = self._qkv(x)
        q = self._split(q_flat)[:, :, 0, :]                # (B, H, Dh)
        new_rows = jnp.stack([k_new, v_new])               # (2, B, 1, D)
        cache_kv = jax.lax.dynamic_update_slice(
            cache_kv, new_rows.astype(cache_kv.dtype), (0, 0, position, 0)
        )
        length = cache_kv.shape[2]
        k = cache_kv[0].reshape(batch, length, self.num_heads, head_dim)
        v = cache_kv[1].reshape(batch, length, self.num_heads, head_dim)

        # Keep cache operands in their storage dtype (bf16); fp32
        # accumulation comes from preferred_element_type.
        scale = head_dim ** -0.5 if self.scale_qk else 1.0
        logits = jnp.einsum(
            "bhd,blhd->bhl", (q * scale).astype(k.dtype), k,
            preferred_element_type=jnp.float32,
        )
        if extra_bias is not None:
            logits = logits + extra_bias[0, :, 0, :][None]   # (1, H, L)
        slots = jnp.arange(length)[None, None, :]
        logits = jnp.where(slots <= position, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhl,blhd->bhd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.reshape(batch, 1, self.d_model)
        return self.out_proj(out), cache_kv

    def beam_decode_self_attention(
        self,
        x: jnp.ndarray,            # (B*K, D) FLAT current-token hidden
        cache_kv: jnp.ndarray,     # (2, B, L*K, D) slot-flattened, UN-permuted
        ancestry: jnp.ndarray,     # (B, K, L) int32 slot table
        position,                  # scalar step index
        extra_bias=None,           # optional (1, H, 1, L) additive bias
    ):
        """Lazy-ancestry cached self-attention for beam search.

        Beam search reorders beams every step; physically permuting the KV
        cache costs a full read+write of the cache per step (measured 12-16
        ms/step at B=128 K=10 L=128 d=512 — the round-1 decode bottleneck).
        Instead rows stay where they were written (slot = beam index at write
        time) and an ancestry table maps (new beam n, time l) -> slot k.

        Attention contracts q of EVERY live beam against the cache of EVERY
        slot (a real matmul with M = K*H instead of the M=1 matvec of
        per-beam cached attention — MXU-friendly), then selects each beam's
        ancestor per time step. Extra compute is K x the minimal FLOPs
        (~10 GFLOP/step at flagship scale — noise on an MXU). Two paths:
        the fused Pallas kernel (ops/beam_attention.py, default on TPU)
        does the whole read in one pass; the XLA fallback materializes two
        (B,K,H,K',L) selection intermediates (~100 MB/layer, measured
        ~10 ms/step at flagship scale vs ~3 ms mandatory cache read).

        x stays FLAT 2D end to end on the kernel path — (B, K=10, D) 3D
        forms force 10-sublane tile layouts on every projection epilogue
        (measured ~4x their floor), and the kernels split/merge the beam
        axis internally for free.

        Returns (out (B*K, D), updated cache).
        """
        batch, beams = ancestry.shape[0], ancestry.shape[1]
        head_dim = self.d_model // self.num_heads
        q_flat, k_new, v_new = self._qkv(x)              # (B*K, D) each

        # int8-quantized cache: {"data": (2, B, L*K, D) int8,
        # "scale": (2, B, H, L*K) fp32} (see ModelConfig.kv_cache_dtype).
        quantized = isinstance(cache_kv, dict)
        probe = cache_kv["data"] if quantized else cache_kv
        # Stage length comes from the (stage-sliced) ancestry table, not the
        # cache: beam_search allocates full-length cache buffers once and
        # each decode stage reads only the flat prefix it has decoded into
        # (prefix staging — no buffer growth copies at stage boundaries).
        length = ancestry.shape[2]

        # The fused kernel pays off when the slot axis is real; greedy
        # (beams == 1) has no selection problem and the XLA path is already
        # near the traffic floor there. Relative-bias models (T5 preset)
        # take the XLA path — the kernel targets the flagship CustomModel.
        # Shape gate: Mosaic needs lane-aligned minors (d_model % 128) and
        # a lane-sized flat slot axis; tiny test models fall back to XLA.
        kernel_ok = (
            beams >= 4
            # The append window is 2 x half rows aligned to half (half = a
            # multiple of the dtype sublane tile with beams <= half + 1);
            # beams <= 32 bounds the window at 64 rows (ADVICE r1).
            and beams <= 32
            and self.d_model % 128 == 0
            and head_dim % 64 == 0
            # Window alignment + clean block tiling need the flat slot axis
            # to be a multiple of 32 (covers the int8 (32, 128) tile and
            # every half used by the append window) and >= one window.
            and (length * beams) % 32 == 0
            and length * beams >= 64
            # The in-kernel append splices fresh rows into a 64-row window
            # and writes the window back THROUGH bf16 — fine for bf16/int8
            # caches (identical round-trip), silently lossy for an f32
            # cache, which stays on the XLA fallback.
            and (quantized or probe.dtype == jnp.bfloat16)
        )
        if kernel_ok and beams > 1:
            # Blocking legality: the flat (rows*beams, D) q/k/v/out blocks
            # need a rows-per-program with (rows*beams) % 8 == 0 inside the
            # VMEM budget; wide beams at long stages (e.g. K=30 past
            # ~180 staged steps) have none and must take the XLA path.
            from .beam_attention import update_kernel_rows

            kernel_ok = update_kernel_rows(
                batch, beams, length, self.d_model, self.num_heads,
                probe.dtype.itemsize, quantized,
            ) > 0
        if (beams > 1 and kernel_ok and extra_bias is None
                and self.use_beam_kernel and self.scale_qk
                and jax.default_backend() != "cpu"):
            # Fused attention + cache append (+ quantize): the kernel owns
            # the whole cache round-trip — no XLA dynamic_update_slice, no
            # separate quantize pass (see beam_attention._kernel_impl).
            from .beam_attention import beam_select_attention_update

            if quantized:
                # Quantize the fresh rows HERE (fuses with the kv projection
                # epilogue) and hand the kernel pre-quantized rows plus two
                # lane-padded scale operands: the in-kernel quantize path
                # (absmax + round + rep2 stacking per layer per step) cost
                # ~0.5 ms/step of VPU/MXU work that is cache-length
                # independent and dominated the staged average.
                H = self.num_heads
                k_q, k_s = quantize_kv_heads(k_new, H)  # (B*K, D), (B*K, H)
                v_q, v_s = quantize_kv_heads(v_new, H)
                kh = beams * H

                pad_kh = -(-kh // 128) * 128

                def _scale_ops(s):  # (B*K, H) -> h-major + row-stacked
                    s_bkh = s.reshape(batch, beams, H)
                    hk = jnp.transpose(s_bkh, (0, 2, 1))     # (B, H, K')
                    hk = jnp.pad(hk, ((0, 0), (0, 0), (0, 128 - beams)))
                    # Row-stacked order m = n*H + h for the self terms.
                    sel = s_bkh.reshape(batch, kh)           # (B, K*H)
                    sel = jnp.pad(sel, ((0, 0), (0, pad_kh - kh)))
                    return hk, sel

                k_hk, k_sel = _scale_ops(k_s)
                v_hk, v_sel = _scale_ops(v_s)
                out, data, scale = beam_select_attention_update(
                    q_flat.astype(jnp.bfloat16), k_q, v_q,
                    cache_kv["data"], ancestry, position, H,
                    scales=cache_kv["scale"],
                    fresh_scales=jnp.stack([k_hk, v_hk]),
                    # Batch-major (B, 2, pad(K*H)): keeps the per-program
                    # kernel block's minor dims equal to the array's (any
                    # rows-per-program is then tile-legal).
                    fresh_row_scales=jnp.stack([k_sel, v_sel], axis=1),
                )
                out = out.astype(x.dtype)
                return self.out_proj(out), {"data": data, "scale": scale}
            out, data, _ = beam_select_attention_update(
                q_flat.astype(jnp.bfloat16), k_new, v_new, cache_kv,
                ancestry, position, self.num_heads,
            )
            return self.out_proj(out.astype(x.dtype)), data

        # XLA fallback works on (B, K, D) views of the flat rows.
        k_new = k_new.reshape(batch, beams, self.d_model)
        v_new = v_new.reshape(batch, beams, self.d_model)
        scales = None
        if quantized:
            k_q, k_s = quantize_kv_heads(k_new, self.num_heads)
            v_q, v_s = quantize_kv_heads(v_new, self.num_heads)
            data = jax.lax.dynamic_update_slice(
                cache_kv["data"], jnp.stack([k_q, v_q]),
                (0, 0, position * beams, 0),
            )
            scales = jax.lax.dynamic_update_slice(
                cache_kv["scale"],
                jnp.stack([k_s, v_s]).transpose(0, 1, 3, 2),  # (2, B, H, K)
                (0, 0, 0, position * beams),
            )
            cache_kv = {"data": data, "scale": scales}
            kv_store = data
        else:
            new_rows = jnp.stack([k_new, v_new])         # (2, B, K, D)
            # Time-l rows live at flat offset l*K .. l*K+K-1: one contiguous
            # (K, D) block per batch row per step.
            cache_kv = jax.lax.dynamic_update_slice(
                cache_kv, new_rows.astype(cache_kv.dtype),
                (0, 0, position * beams, 0),
            )
            kv_store = cache_kv

        # Prefix staging: attend only over the stage prefix of the
        # (possibly longer) cache buffer.
        kv_store = kv_store[:, :, : length * beams]
        if quantized:
            # XLA fallback (CPU tests / ineligible shapes): dequantize and
            # run the bf16 formulation below.
            kv_store = dequantize_kv(
                # The scale flat axis may carry 128-alignment padding.
                kv_store, scales[..., : kv_store.shape[2]], self.num_heads
            )

        q = q_flat.reshape(batch, beams, self.num_heads, head_dim)
        anc_onehot = (
            ancestry[:, :, :, None]
            == jnp.arange(beams)[None, None, None, :]
        ).astype(jnp.float32)                            # (B, K, L, K')
        kv = kv_store.reshape(
            2, batch, length, beams, self.num_heads, head_dim
        )

        scale = head_dim ** -0.5 if self.scale_qk else 1.0
        # (B, N, H, K', L): q of each live beam vs the cache of each slot.
        qk_all = jnp.einsum(
            "bnhd,blkhd->bnhkl", (q * scale).astype(kv.dtype), kv[0],
            preferred_element_type=jnp.float32,
        )
        # Ancestry select: logits[b,n,h,l] = qk_all[b,n,h,anc[b,n,l],l].
        logits = jnp.einsum("bnhkl,bnlk->bnhl", qk_all, anc_onehot)
        if extra_bias is not None:
            logits = logits + extra_bias[0, :, 0, :][None, None]  # (H, L)
        slots = jnp.arange(length)[None, None, None, :]
        logits = jnp.where(slots <= position, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        # Spread probs back over slots (bf16, matching the V dtype) and
        # contract V over (slot, time) in one matmul.
        pw = jnp.einsum(
            "bnhl,bnlk->bnhlk", probs.astype(kv.dtype),
            anc_onehot.astype(kv.dtype),
        )
        out = jnp.einsum(
            "bnhlk,blkhd->bnhd", pw, kv[1],
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.reshape(batch * beams, self.d_model)
        return self.out_proj(out), cache_kv

    def beam_decode_cross_attention(
        self,
        x: jnp.ndarray,                          # (B*K, D) FLAT
        kv: Tuple[jnp.ndarray, jnp.ndarray],     # UN-tiled FLAT (B, Ls, D)
        bias: Optional[jnp.ndarray],             # (B, 1, 1, Ls)
    ) -> jnp.ndarray:
        """Beam cross-attention against batch-sized (beam-invariant) K/V.

        The encoder K/V never differ across beams; keeping them at batch
        size instead of tiling x K cuts cross-attention cache traffic
        K-fold. K/V arrive FLAT (project_kv_flat) for the fused kernel;
        the XLA fallback re-splits heads (the (B, K, H, Ls) einsum/softmax
        shapes lower to ~2.5%-occupancy tiles on TPU — 186 us/layer/step
        measured on v5e — which is exactly why the kernel path exists).
        x stays flat 2D (see beam_decode_self_attention); returns (B*K, D).
        """
        batch = kv[0].shape[0]
        beams = x.shape[0] // batch
        head_dim = self.d_model // self.num_heads
        q_flat = self.q_proj(x)                  # (B*K, D)

        kernel_ok = (self.d_model % 128 == 0 and head_dim % 64 == 0
                     and self.scale_qk)
        if (kernel_ok and self.use_beam_kernel
                and jax.default_backend() != "cpu"):
            from .beam_attention import beam_cross_attention

            if bias is None:
                bias2d = jnp.zeros(
                    (batch, kv[0].shape[1]), dtype=jnp.float32)
            else:
                bias2d = bias[:, 0, 0, :].astype(jnp.float32)
            out = beam_cross_attention(
                q_flat.astype(kv[0].dtype), kv[0], kv[1], bias2d,
                self.num_heads, beams,
            ).astype(x.dtype)
            return self.out_proj(out)

        q = q_flat.reshape(batch, beams, self.num_heads, head_dim)
        ls = kv[0].shape[1]
        k = kv[0].reshape(batch, ls, self.num_heads, head_dim)
        v = kv[1].reshape(batch, ls, self.num_heads, head_dim)
        scale = head_dim ** -0.5 if self.scale_qk else 1.0
        logits = jnp.einsum(
            "bkhd,blhd->bkhl", (q * scale).astype(k.dtype), k,
            preferred_element_type=jnp.float32,
        )
        if bias is not None:
            # bias (B, 1, 1, Ls) broadcasts over (B, K, H, Ls).
            logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bkhl,blhd->bkhd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return self.out_proj(out.reshape(batch * beams, self.d_model))

    def decode_cross_attention(
        self,
        x: jnp.ndarray,                              # (B, 1, D)
        kv: Tuple[jnp.ndarray, jnp.ndarray],         # precomputed (B, H, Ls, Dh)
        bias: Optional[jnp.ndarray],                 # (B, 1, 1, Ls)
    ) -> jnp.ndarray:
        q = self._split(self.q_proj(x))              # (B, H, 1, Dh)
        out = dot_product_attention(
            q, kv[0], kv[1], bias, scale=None if self.scale_qk else 1.0)
        batch = x.shape[0]
        out = out.transpose(0, 2, 1, 3).reshape(batch, 1, self.d_model)
        return self.out_proj(out)

    def __call__(
        self,
        query_input: jnp.ndarray,                  # (B, Lq, D)
        kv_input: Optional[jnp.ndarray],           # (B, Lk, D) or None
        bias: Optional[jnp.ndarray] = None,        # broadcastable (B, H, Lq, Lk)
        cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        cache_index: Optional[jnp.ndarray] = None,
        precomputed_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        """Returns (output (B, Lq, D), updated_cache | None).

        Cache protocol (decode): ``cache`` is (k_cache, v_cache) each
        (B, H, L_max, Dh); the new key/value rows for this step are written at
        ``cache_index`` and attention runs over the full cache (masked by
        ``bias``). ``precomputed_kv`` short-circuits the K/V projections for
        cross-attention (encoder K/V projected once per sequence).
        """
        if self.mode == "self":
            q_flat, k_flat, v_flat = self._qkv(query_input)
            q = self._split(q_flat)
            k = self._split(k_flat)
            v = self._split(v_flat)
        else:
            q = self._split(self.q_proj(query_input))
            if precomputed_kv is not None:
                k, v = precomputed_kv
            else:
                k, v = jnp.split(self.kv_proj(kv_input), 2, axis=-1)
                k = self._split(k)
                v = self._split(v)

        new_cache = None
        if cache is not None:
            k_cache, v_cache = cache
            k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, 0, cache_index, 0))
            v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, 0, cache_index, 0))
            k, v = k_cache, v_cache
            new_cache = (k_cache, v_cache)

        out = dot_product_attention(q, k, v, bias, use_flash=self.use_flash,
                                    scale=None if self.scale_qk else 1.0)
        b, h, lq, dh = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, h * dh)
        return self.out_proj(out), new_cache
