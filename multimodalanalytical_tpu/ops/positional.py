"""Positional encodings.

The sinusoid table uses the reference's *interleaved* sin/cos layout
([sin(p/w0), cos(p/w0), sin(p/w1), cos(p/w1), ...]) rather than the
half-split layout, for checkpoint-level parity with
reference modeling/utils.py:226-239.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sincos_table(max_seq_len: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """(max_seq_len, d_model) interleaved sin/cos table (precomputed on host)."""
    exponents = np.arange(0, d_model, 2) / d_model
    inv_freq = 1.0 / (10000.0 ** exponents)          # (d_model/2,)
    pos = np.arange(max_seq_len)[:, None]            # (L, 1)
    angles = pos * inv_freq[None, :]                 # (L, d/2)
    interleaved = np.stack([np.sin(angles), np.cos(angles)], axis=2)
    table = interleaved.reshape(max_seq_len, -1)[:, :d_model]
    return jnp.asarray(table, dtype=dtype)


class SinCosPositionalEncoding(nn.Module):
    d_model: int
    max_seq_len: int = 1024
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        self.table = sincos_table(self.max_seq_len, self.d_model, self.dtype)

    def __call__(self, inputs: jnp.ndarray, positions: jnp.ndarray | None = None) -> jnp.ndarray:
        """Positional encodings for ``inputs`` (B, L, D).

        ``positions`` (B, L) optionally selects explicit table rows (used by
        peak-positional-encoding modalities and incremental decoding).
        """
        if positions is not None:
            return jnp.take(self.table, jnp.clip(positions, 0, self.max_seq_len - 1), axis=0)
        seq_len = inputs.shape[1]
        return self.table[None, :seq_len, :]


class LearnedPositionalEncoding(nn.Module):
    d_model: int
    max_seq_len: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, positions: jnp.ndarray | None = None) -> jnp.ndarray:
        table = nn.Embed(
            self.max_seq_len, self.d_model,
            embedding_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, name="pos_embed",
        )
        if positions is None:
            positions = jnp.arange(inputs.shape[1])[None, :]
        enc = table(jnp.clip(positions, 0, self.max_seq_len - 1))
        # Reference normalises learned positional encodings
        # (modeling/utils.py:255, 271).
        # eps 1e-5 = torch default (reference modeling/utils.py:255).
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pos_norm")(enc)


POS_ENC_REGISTRY = {
    "sin_cos": SinCosPositionalEncoding,
    "learned": LearnedPositionalEncoding,
}


def t5_relative_bucket(
    relative_position: jnp.ndarray,
    bidirectional: bool,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    """T5's relative-position bucketing (HF t5 _relative_position_bucket):
    half the buckets for exact small offsets, the rest log-spaced."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + jnp.where(n < 0, num_buckets, 0)
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class RelativePositionBias(nn.Module):
    """T5-style bucketed relative attention bias (HF modeling_t5
    T5Attention.compute_bias): one (num_buckets, heads) table per stack,
    shared across layers like T5's has_relative_attention_bias block-0
    sharing."""

    num_heads: int
    bidirectional: bool
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, query_positions: jnp.ndarray,
                 key_positions: jnp.ndarray) -> jnp.ndarray:
        """(Lq,), (Lk,) int positions -> (1, H, Lq, Lk) additive bias."""
        table = nn.Embed(
            self.num_buckets, self.num_heads,
            embedding_init=nn.initializers.normal(stddev=1.0),
            dtype=jnp.float32, name="rel_bias",
        )
        rel = key_positions[None, :] - query_positions[:, None]
        buckets = t5_relative_bucket(
            rel, self.bidirectional, self.num_buckets, self.max_distance
        )
        bias = table(buckets)                       # (Lq, Lk, H)
        return bias.transpose(2, 0, 1)[None]        # (1, H, Lq, Lk)
