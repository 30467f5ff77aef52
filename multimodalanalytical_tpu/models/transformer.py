"""Transformer encoder/decoder stacks.

One Flax layer family with pre/post-LN and optional gated (GEGLU) FFN,
covering the reference's CustomEncoderLayer/CustomDecoderLayer
(reference modeling/custom_modeling.py:108-199, which subclass torch
nn.TransformerEncoderLayer/DecoderLayer).

TPU design notes:
  * batch-first (B, L, D), static shapes;
  * attention masks are precomputed additive biases;
  * decoder layers thread a functional KV cache for jitted incremental
    decoding (self-attention cache + precomputed cross-attention K/V);
  * compute dtype is configurable (bf16 on TPU), LayerNorms run in fp32.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import MultiHeadAttention
from ..ops.dropout import Dropout
from ..ops.positional import RelativePositionBias

_ACTIVATIONS = {
    "gelu": lambda x: nn.gelu(x, approximate=False),
    # HF ACT2FN["gelu_new"]: the tanh approximation (NewGELUActivation) —
    # T5Config maps feed_forward_proj="gated-gelu" to dense_act_fn
    # "gelu_new", so gated checkpoints must run the approx variant.
    "gelu_new": lambda x: nn.gelu(x, approximate=True),
    "relu": nn.relu,
}


class FeedForward(nn.Module):
    d_model: int
    ffn_dim: int
    dropout: float
    activation: str = "gelu"
    gated_linear: bool = False
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True          # HF T5's DenseReluDense is bias-free

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        init = nn.initializers.xavier_uniform()
        act = _ACTIVATIONS[self.activation]
        hidden = act(nn.Dense(self.ffn_dim, dtype=self.dtype, kernel_init=init,
                              use_bias=self.use_bias, name="linear1")(x))
        if self.gated_linear:
            # GEGLU (reference custom_modeling.py:137-152).
            gate = nn.Dense(self.ffn_dim, dtype=self.dtype, kernel_init=init,
                            use_bias=self.use_bias, name="gate")(x)
            hidden = hidden * gate
        hidden = Dropout(self.dropout, deterministic=deterministic)(hidden)
        out = nn.Dense(self.d_model, dtype=self.dtype, kernel_init=init,
                       use_bias=self.use_bias, name="linear2")(hidden)
        return Dropout(self.dropout, deterministic=deterministic)(out)

    def decode_fused(self, x: jnp.ndarray) -> jnp.ndarray:
        """Decode-path FFN: one fused Pallas pass (ops/decode_ffn.py) when
        the shapes/dtype allow — XLA's loop fusion feeds linear2's MXU pass
        from an inline gelu*gate producer at ~2x its cost (round-4 decode
        trace). bf16 + TPU only; everything else keeps the XLA path, so f32
        models (tests, goldens) are bit-identical."""
        kernel_ok = (
            self.dtype == jnp.bfloat16
            and self.use_bias
            and self.activation == "gelu"
            and x.ndim == 2
            and self.d_model % 128 == 0
            and self.ffn_dim % 128 == 0
            and x.shape[0] % 128 == 0
            and jax.default_backend() != "cpu"
        )
        if not kernel_ok:
            return self(x, deterministic=True)
        from ..ops.decode_ffn import geglu_ffn

        p = self.variables["params"]
        gate = p.get("gate") if self.gated_linear else None
        return geglu_ffn(
            x,
            p["linear1"]["kernel"], p["linear1"]["bias"],
            gate["kernel"] if gate is not None else None,
            gate["bias"] if gate is not None else None,
            p["linear2"]["kernel"], p["linear2"]["bias"],
        )


def _norm(name: str, norm_type: str = "layernorm"):
    """LayerNorm (default) or RMSNorm (T5 fidelity), always fp32.

    LayerNorm eps = 1e-5 matches torch's default (the reference's layers are
    torch built-ins); flax's 1e-6 default measurably diverges post-LN stacks
    (~5e-4 on fp32 logits, tests/test_reference_model_parity.py). RMSNorm
    keeps 1e-6 = T5's layer_norm_epsilon."""
    if norm_type == "rmsnorm":
        return nn.RMSNorm(dtype=jnp.float32, name=name)
    return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)


class EncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float
    activation: str = "gelu"
    gated_linear: bool = False
    norm_first: bool = True
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    norm_type: str = "layernorm"
    attention_bias: bool = True
    attention_scale: bool = True
    ffn_bias: bool = True

    @nn.compact
    def __call__(self, x, bias, deterministic: bool):
        attn = MultiHeadAttention(self.num_heads, self.d_model, dtype=self.dtype,
                                  use_flash=self.use_flash,
                                  use_bias=self.attention_bias,
                                  scale_qk=self.attention_scale,
                                  name="self_attn")
        ff = FeedForward(self.d_model, self.ffn_dim, self.dropout, self.activation,
                         self.gated_linear, dtype=self.dtype,
                         use_bias=self.ffn_bias, name="ff")
        drop = Dropout(self.dropout, deterministic=deterministic)

        if self.norm_first:
            normed = _norm("norm1", self.norm_type)(x).astype(self.dtype)
            h, _ = attn(normed, normed, bias)
            x = x + drop(h)
            x = x + ff(_norm("norm2", self.norm_type)(x).astype(self.dtype),
                       deterministic)
        else:
            h, _ = attn(x, x, bias)
            x = _norm("norm1", self.norm_type)(x + drop(h)).astype(self.dtype)
            x = _norm("norm2", self.norm_type)(x + ff(x, deterministic)).astype(self.dtype)
        return x


class DecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float
    activation: str = "gelu"
    gated_linear: bool = False
    norm_first: bool = True
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    use_beam_kernel: bool = True
    norm_type: str = "layernorm"
    attention_bias: bool = True
    attention_scale: bool = True
    ffn_bias: bool = True

    def setup(self) -> None:
        self.self_attn = MultiHeadAttention(
            self.num_heads, self.d_model, dtype=self.dtype,
            use_flash=self.use_flash, use_beam_kernel=self.use_beam_kernel,
            use_bias=self.attention_bias, scale_qk=self.attention_scale,
            name="self_attn",
        )
        self.cross_attn = MultiHeadAttention(
            self.num_heads, self.d_model, dtype=self.dtype, mode="cross",
            use_bias=self.attention_bias, scale_qk=self.attention_scale,
            name="cross_attn",
        )
        self.ff = FeedForward(
            self.d_model, self.ffn_dim, self.dropout, self.activation,
            self.gated_linear, dtype=self.dtype, use_bias=self.ffn_bias,
            name="ff",
        )
        self.norm1 = _norm("norm1", self.norm_type)
        self.norm2 = _norm("norm2", self.norm_type)
        self.norm3 = _norm("norm3", self.norm_type)
        self.residual_dropout = Dropout(self.dropout)

    def project_cross_kv(self, encoder_hidden: jnp.ndarray, flat: bool = False):
        if flat:
            # Beam decode: flat (B, Ls, D) for the fused cross kernel.
            return self.cross_attn.project_kv_flat(encoder_hidden)
        return self.cross_attn.project_kv(encoder_hidden)

    def decode_step(
        self,
        x: jnp.ndarray,              # (B, 1, D)
        self_cache: jnp.ndarray,     # (2, L_max, B, D) fused time-major
        cross_kv,                    # precomputed (k, v)
        cross_bias,
        position,
        extra_bias=None,             # optional (1, H, 1, L) additive bias
    ):
        """Single-token cached decode through this layer.

        Returns (x, updated self_cache)."""
        if self.norm_first:
            normed = self.norm1(x).astype(self.dtype)
            h, self_cache = self.self_attn.decode_self_attention(
                normed, self_cache, position, extra_bias=extra_bias
            )
            x = x + h
            h = self.cross_attn.decode_cross_attention(
                self.norm2(x).astype(self.dtype), cross_kv, cross_bias
            )
            x = x + h
            x = x + self.ff(self.norm3(x).astype(self.dtype), deterministic=True)
        else:
            h, self_cache = self.self_attn.decode_self_attention(
                x, self_cache, position, extra_bias=extra_bias
            )
            x = self.norm1(x + h).astype(self.dtype)
            h = self.cross_attn.decode_cross_attention(x, cross_kv, cross_bias)
            x = self.norm2(x + h).astype(self.dtype)
            x = self.norm3(x + self.ff(x, deterministic=True)).astype(self.dtype)
        return x, self_cache

    def beam_decode_step(
        self,
        x: jnp.ndarray,              # (B, K, D)
        self_cache: jnp.ndarray,     # (2, L, B, K, D) time-major, un-permuted
        ancestry: jnp.ndarray,       # (B, K, L) int32 slot table
        cross_kv,                    # UN-tiled precomputed (k, v)
        cross_bias,                  # (B, 1, 1, Ls)
        position,
        extra_bias=None,             # optional (1, H, 1, L) additive bias
    ):
        """Lazy-ancestry beam decode through this layer (see
        ops/attention.py beam_decode_self_attention). Returns (x, cache).

        The whole step — norms, FFN, residuals, projections, and the
        attention kernels' q/out — runs on FLAT (B*K, D) 2D arrays: the
        (B, K=10, D) 3D forms give XLA 10-sublane tile layouts whose
        epilogue fusions measured ~4x their floor on v5e, and 3D kernel
        operands forced relayout copies at the custom-call boundary. Only
        the ancestry table / KV caches carry the beam structure.
        """
        if self.norm_first:
            h, self_cache = self.self_attn.beam_decode_self_attention(
                self.norm1(x).astype(self.dtype), self_cache, ancestry,
                position, extra_bias=extra_bias,
            )
            x = x + h
            x = x + self.cross_attn.beam_decode_cross_attention(
                self.norm2(x).astype(self.dtype), cross_kv, cross_bias,
            )
            x = x + self.ff.decode_fused(self.norm3(x).astype(self.dtype))
        else:
            h, self_cache = self.self_attn.beam_decode_self_attention(
                x, self_cache, ancestry, position, extra_bias=extra_bias
            )
            x = self.norm1(x + h).astype(self.dtype)
            h = self.cross_attn.beam_decode_cross_attention(
                x, cross_kv, cross_bias
            )
            x = self.norm2(x + h).astype(self.dtype)
            x = self.norm3(
                x + self.ff.decode_fused(x)
            ).astype(self.dtype)
        return x, self_cache

    def __call__(
        self,
        x: jnp.ndarray,
        encoder_hidden: Optional[jnp.ndarray],
        self_bias: Optional[jnp.ndarray],
        cross_bias: Optional[jnp.ndarray],
        deterministic: bool,
        cache: Optional[Dict[str, Any]] = None,
        cache_index=None,
    ):
        """Returns (x, updated_cache | None). ``cache`` keys: "self_kv"
        (k,v arrays) and "cross_kv" (precomputed encoder K/V)."""
        drop = lambda h: self.residual_dropout(h, deterministic=deterministic)  # noqa: E731
        new_cache: Optional[Dict[str, Any]] = None
        self_kv_cache = cache.get("self_kv") if cache else None
        cross_kv = cache.get("cross_kv") if cache else None

        if self.norm_first:
            normed = self.norm1(x).astype(self.dtype)
            h, updated_self = self.self_attn(
                normed, normed,
                self_bias, cache=self_kv_cache, cache_index=cache_index,
            )
            x = x + drop(h)
            h, _ = self.cross_attn(
                self.norm2(x).astype(self.dtype), encoder_hidden, cross_bias,
                precomputed_kv=cross_kv,
            )
            x = x + drop(h)
            x = x + self.ff(self.norm3(x).astype(self.dtype), deterministic)
        else:
            h, updated_self = self.self_attn(
                x, x, self_bias, cache=self_kv_cache, cache_index=cache_index,
            )
            x = self.norm1(x + drop(h)).astype(self.dtype)
            h, _ = self.cross_attn(x, encoder_hidden, cross_bias, precomputed_kv=cross_kv)
            x = self.norm2(x + drop(h)).astype(self.dtype)
            x = self.norm3(x + self.ff(x, deterministic)).astype(self.dtype)

        if cache is not None:
            new_cache = dict(cache)
            new_cache["self_kv"] = updated_self
        return x, new_cache


class Encoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float
    activation: str = "gelu"
    gated_linear: bool = False
    norm_first: bool = True
    final_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    norm_type: str = "layernorm"
    relative_bias: bool = False
    attention_bias: bool = True
    attention_scale: bool = True
    ffn_bias: bool = True

    @nn.compact
    def __call__(self, x, bias, deterministic: bool):
        if self.relative_bias:
            # T5: bidirectional bucketed bias, shared across layers.
            positions = jnp.arange(x.shape[1])
            bias = bias + RelativePositionBias(
                self.num_heads, bidirectional=True, name="rel_bias",
            )(positions, positions)
        for i in range(self.num_layers):
            x = EncoderLayer(
                self.d_model, self.num_heads, self.ffn_dim, self.dropout,
                self.activation, self.gated_linear, self.norm_first,
                dtype=self.dtype, use_flash=self.use_flash,
                norm_type=self.norm_type,
                attention_bias=self.attention_bias,
                attention_scale=self.attention_scale,
                ffn_bias=self.ffn_bias, name=f"layer_{i}",
            )(x, bias, deterministic)
        if self.final_norm:
            x = _norm("final_norm", self.norm_type)(x).astype(self.dtype)
        return x


class Decoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float
    activation: str = "gelu"
    gated_linear: bool = False
    norm_first: bool = True
    final_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    use_beam_kernel: bool = True
    norm_type: str = "layernorm"
    relative_bias: bool = False
    attention_bias: bool = True
    attention_scale: bool = True
    ffn_bias: bool = True

    def setup(self) -> None:
        self.layers = [
            DecoderLayer(
                self.d_model, self.num_heads, self.ffn_dim, self.dropout,
                self.activation, self.gated_linear, self.norm_first,
                dtype=self.dtype, use_flash=self.use_flash,
                use_beam_kernel=self.use_beam_kernel,
                norm_type=self.norm_type,
                attention_bias=self.attention_bias,
                attention_scale=self.attention_scale,
                ffn_bias=self.ffn_bias, name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]
        if self.final_norm:
            self.out_norm = _norm("final_norm", self.norm_type)
        if self.relative_bias:
            self.rel_bias = RelativePositionBias(
                self.num_heads, bidirectional=False, name="rel_bias",
            )

    def project_cross_kv(self, encoder_hidden: jnp.ndarray, flat: bool = False):
        """Precompute per-layer cross-attention K/V from encoder output."""
        return [
            layer.project_cross_kv(encoder_hidden, flat=flat)
            for layer in self.layers
        ]

    def decode_step(self, x, self_caches, cross_kvs, cross_bias, position):
        """Single-token cached decode through the stack.

        ``self_caches``: list of per-layer (2, L_max, B, D) fused buffers.
        Returns (hidden (B, 1, D), updated self_caches)."""
        extra_bias = None
        if self.relative_bias:
            length = self_caches[0].shape[2]
            extra_bias = self.rel_bias(
                jnp.asarray(position)[None], jnp.arange(length)
            )                                   # (1, H, 1, L)
        new_caches = []
        for layer, cache, cross_kv in zip(self.layers, self_caches, cross_kvs):
            x, cache = layer.decode_step(x, cache, cross_kv, cross_bias,
                                         position, extra_bias=extra_bias)
            new_caches.append(cache)
        if self.final_norm:
            x = self.out_norm(x).astype(self.dtype)
        return x, new_caches

    def beam_decode_step(self, x, self_caches, ancestry, cross_kvs,
                         cross_bias, position):
        """Lazy-ancestry beam decode through the stack.

        ``x``: FLAT (B*K, D) — the whole beam-decode stack is 2D (see
        DecoderLayer.beam_decode_step). ``self_caches``: per-layer
        slot-flattened un-permuted buffers.
        Returns (hidden (B*K, D), updated self_caches)."""
        extra_bias = None
        if self.relative_bias:
            length = ancestry.shape[2]
            extra_bias = self.rel_bias(
                jnp.asarray(position)[None], jnp.arange(length)
            )                                   # (1, H, 1, L)
        new_caches = []
        for layer, cache, cross_kv in zip(self.layers, self_caches, cross_kvs):
            x, cache = layer.beam_decode_step(
                x, cache, ancestry, cross_kv, cross_bias, position,
                extra_bias=extra_bias,
            )
            new_caches.append(cache)
        if self.final_norm:
            x = self.out_norm(x).astype(self.dtype)
        return x, new_caches

    def __call__(
        self,
        x: jnp.ndarray,
        encoder_hidden: Optional[jnp.ndarray],
        self_bias,
        cross_bias,
        deterministic: bool,
        cache=None,
        cache_index=None,
    ):
        if self.relative_bias and x.shape[1] > 1:
            positions = jnp.arange(x.shape[1])
            self_bias = self_bias + self.rel_bias(positions, positions)
        new_caches = [] if cache is not None else None
        for i, layer in enumerate(self.layers):
            layer_cache = cache[i] if cache is not None else None
            x, updated = layer(
                x, encoder_hidden, self_bias, cross_bias, deterministic,
                cache=layer_cache, cache_index=cache_index,
            )
            if cache is not None:
                new_caches.append(updated)
        if self.final_norm:
            x = self.out_norm(x).astype(self.dtype)
        return x, new_caches
