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
        return nn.LayerNorm(dtype=jnp.float32, name="pos_norm")(enc)


POS_ENC_REGISTRY = {
    "sin_cos": SinCosPositionalEncoding,
    "learned": LearnedPositionalEncoding,
}
