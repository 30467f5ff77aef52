"""Flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalanalytical_tpu.ops.flash_attention import (
    _attention_reference,
    flash_attention,
)


@pytest.fixture(scope="module")
def qkv():
    B, H, L, D = 2, 4, 512, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    keep = np.ones((B, L))
    keep[:, 400:] = 0
    bias = jnp.asarray(np.where(keep[:, None, None, :] > 0, 0.0, -1e9), jnp.float32)
    return q, k, v, bias


def test_forward_matches_reference(qkv):
    q, k, v, bias = qkv
    out = flash_attention(q, k, v, bias)
    ref = _attention_reference(q, k, v, bias)
    assert float(jnp.abs(out - ref).max()) < 1e-4


def test_backward_matches_reference(qkv):
    q, k, v, bias = qkv

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v, bias) ** 2)

    grads_flash = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss(_attention_reference), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(grads_flash, grads_ref):
        assert float(jnp.abs(a - b).max()) < 1e-3


def test_small_shapes_fall_back(qkv):
    # Short sequences route to the XLA path (identical results by definition);
    # just confirm no error and correct shape.
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 4, 26, 64)), jnp.float32)
    out = flash_attention(q, q, q, None)
    assert out.shape == q.shape


def test_flash_ragged_length_padding():
    """Real tokenized spectra are not block multiples; the kernel pads
    internally and must match the XLA reference at a ragged length."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodalanalytical_tpu.ops.flash_attention import (
        _attention_reference, flash_attention,
    )

    B, H, L, D = 2, 2, 2100, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, L, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, L, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, L, D), jnp.float32)
    keep = jnp.ones((B, L), jnp.int32).at[:, L - 50:].set(0)
    bias = jnp.where(keep[:, None, None, :] > 0, 0.0, -1e9)

    want = np.asarray(_attention_reference(q, k, v, bias))
    got = np.asarray(flash_attention(q, k, v, bias))
    assert got.shape == want.shape
    err = np.abs(want - got).max()
    assert err < 2e-3, err
