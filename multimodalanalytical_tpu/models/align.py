"""Encoder-alignment head: reconstruct the pure-compound IR spectrum from the
mean-pooled encoder state (mixture paper). Reference behavior:
modeling/custom_modeling.py:363-396 (networks) and 455-475 (loss).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import AlignConfig


def kl_div_batchmean(p: jnp.ndarray, q: jnp.ndarray, eps: float = 1e-16) -> jnp.ndarray:
    p = jnp.clip(p, eps, None)
    q = jnp.clip(q, eps, None)
    return jnp.sum(p * jnp.log(p / q)) / p.shape[0]


def sid(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Spectral information divergence (reference modeling/utils.py:8-22)."""
    return kl_div_batchmean(x, y) + kl_div_batchmean(y, x)


ALIGN_LOSSES = {
    "mse": lambda pred, target: jnp.mean((pred - target) ** 2),
    "mae": lambda pred, target: jnp.mean(jnp.abs(pred - target)),
    "sid": sid,
}


class AlignNetwork(nn.Module):
    config: AlignConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        """(B, d_model) mean-pooled encoder state -> (B, output_dimension)."""
        cfg = self.config
        init = nn.initializers.xavier_uniform()
        x = nn.relu(nn.Dense(cfg.hidden_dimension, dtype=self.dtype,
                             kernel_init=init, name="fc1")(pooled))
        if cfg.align_network == "convolutional":
            x = nn.Dense(cfg.hidden_dimension, dtype=self.dtype,
                         kernel_init=init, name="fc2")(x)
            # Reference applies Conv1d over a singleton spatial axis
            # (custom_modeling.py:372-386): (B, hidden) -> (B, hidden, 1).
            # With kernel k and padding k//2 only the center tap sees data,
            # but we reproduce the op faithfully with a spatial conv.
            x = x[:, None, :]  # (B, 1, C) NWC
            x = nn.Conv(cfg.conv_channels, kernel_size=(cfg.kernel_size,),
                        padding=[(cfg.kernel_size // 2, cfg.kernel_size // 2)],
                        dtype=self.dtype, kernel_init=init, name="conv1")(x)
            # Padded length-1 input convolved with kernel k yields a single
            # output position (1 + 2*(k//2) - k + 1 = 1 for odd k).
            x = nn.relu(x[:, 0, :])
            x = nn.Dense(cfg.output_dimension, dtype=self.dtype,
                         kernel_init=init, name="conv2")(x)
            return jax.nn.sigmoid(x)
        if cfg.align_network == "mlp":
            x = nn.Dense(cfg.output_dimension, dtype=self.dtype,
                         kernel_init=init, name="fc2")(x)
            return jax.nn.sigmoid(x)
        raise ValueError(f"Unknown align network {cfg.align_network}")
