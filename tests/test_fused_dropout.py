"""Fused (Pallas) dropout: determinism, mask-consistency and stats.

On the CPU test backend the module uses its jax.random fallback (the
Pallas interpreter has no TPU-PRNG lowering); the contract under test —
deterministic mask given (key, shape), identical fwd/bwd masks, correct
keep fraction and scaling — is backend-independent. The kernel path is
exercised on the real chip by benchmarks/exp_remat.py pallasdrop.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalanalytical_tpu.ops.fused_dropout import pallas_dropout


def test_deterministic_and_key_sensitive():
    x = jnp.ones((64, 48, 512), jnp.bfloat16)
    k1, k2 = jax.random.PRNGKey(7), jax.random.PRNGKey(8)
    y1 = pallas_dropout(x, k1, 0.1)
    assert bool((pallas_dropout(x, k1, 0.1) == y1).all())
    assert not bool((pallas_dropout(x, k2, 0.1) == y1).all())


def test_keep_fraction_and_scaling():
    x = jnp.ones((128, 2048), jnp.float32)
    for rate in (0.1, 0.5):
        y = pallas_dropout(x, jax.random.PRNGKey(0), rate)
        frac = float((y != 0).mean())
        assert abs(frac - (1.0 - rate)) < 0.02, (rate, frac)
        kept = np.asarray(y[y != 0])
        np.testing.assert_allclose(kept, 1.0 / (1.0 - rate), rtol=1e-6)


def test_backward_mask_matches_forward():
    x = jnp.ones((32, 300), jnp.float32)  # ragged: exercises the pad path
    key = jax.random.PRNGKey(3)

    def f(t):
        return pallas_dropout(t, key, 0.25).sum()

    y = pallas_dropout(x, key, 0.25)
    g = jax.grad(f)(x)
    assert (np.asarray(y != 0) == np.asarray(g != 0)).all()
    kept_g = np.asarray(g[g != 0])
    np.testing.assert_allclose(kept_g, 1.0 / 0.75, rtol=1e-6)


def test_jit_matches_eager_and_dtype_preserved():
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 26, 512)).astype(
        jnp.bfloat16)
    key = jax.random.PRNGKey(5)
    eager = pallas_dropout(x, key, 0.1)
    jitted = jax.jit(lambda t, k: pallas_dropout(t, k, 0.1))(x, key)
    assert eager.dtype == jnp.bfloat16
    assert bool((eager == jitted).all())
