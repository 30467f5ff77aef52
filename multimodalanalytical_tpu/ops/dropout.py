"""Key-saving dropout: regenerate the mask in backward instead of storing it.

Under ``jax.value_and_grad`` the standard ``flax.linen.Dropout`` leaves the
backward pass needing the forward's mask, and on TPU XLA chooses to save the
raw u32 ``rng-bit-generator`` output for it. At flagship train shapes
(b128 / d512 / 6+6 layers) that materialized ~755 MB/step of u32 bit copies
— 36 x u32[128,48,512] + 6 x u32[128,48,2048] in the compiled HLO, ~20% of
the whole step's device time (PROFILE.md round 5).

``Dropout`` below is a drop-in ``nn.Dropout`` replacement whose mask
application is a ``jax.custom_vjp`` that saves ONLY the PRNG key: backward
re-runs the (cheap, counter-based) rbg/threefry generator and rebuilds the
mask. Forward/backward masks are identical by construction (same key, same
``random.bernoulli`` call as flax, flax.linen.stochastic.Dropout.__call__),
so results are bit-identical to ``nn.Dropout`` — only the saved residual
changes. The class is intentionally named ``Dropout`` so flax auto-naming
assigns the same module paths ("Dropout_0", ...) and the ``make_rng``
streams match checkpoints/tests produced with ``nn.Dropout``.

Reference equivalent: torch ``nn.Dropout`` inside the custom layers
(reference modeling/custom_modeling.py:108-199); torch stores the mask too —
this is a TPU-side improvement, not a semantic deviation.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax, random


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def rng_dropout(x: jnp.ndarray, key: jax.Array, rate: float) -> jnp.ndarray:
    """``x`` masked with keep-prob ``1-rate`` and rescaled; saves only ``key``."""
    keep_prob = 1.0 - rate
    mask = random.bernoulli(key, p=keep_prob, shape=x.shape)
    return lax.select(mask, x / keep_prob, jnp.zeros_like(x))


def _fwd(x, key, rate):
    return rng_dropout(x, key, rate), key


def _bwd(rate, key, g):
    keep_prob = 1.0 - rate
    mask = random.bernoulli(key, p=keep_prob, shape=g.shape)
    return lax.select(mask, g / keep_prob, jnp.zeros_like(g)), None


rng_dropout.defvjp(_fwd, _bwd)


class Dropout(nn.Module):
    """``nn.Dropout``-compatible module on :func:`rng_dropout`.

    Supports the subset of the flax API this codebase uses (no
    ``broadcast_dims`` — asserted, so silent divergence is impossible).
    """

    rate: float
    broadcast_dims: Sequence[int] = ()
    deterministic: Optional[bool] = None
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, inputs, deterministic: Optional[bool] = None,
                 rng: Optional[jax.Array] = None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if self.rate == 0.0 or deterministic:
            return inputs
        if self.rate == 1.0:
            return jnp.zeros_like(inputs)
        assert not self.broadcast_dims, (
            "broadcast_dims is not supported by the key-saving Dropout"
        )
        if rng is None:
            rng = self.make_rng(self.rng_collection)
        return rng_dropout(inputs, rng, self.rate)
