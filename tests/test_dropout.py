"""Key-saving dropout (ops/dropout.py) equivalence with flax nn.Dropout."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalanalytical_tpu.ops.dropout import Dropout, rng_dropout


@pytest.mark.parametrize("rate", [0.1, 0.5])
def test_forward_matches_flax(rate):
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    ours = Dropout(rate).apply({}, x, deterministic=False,
                               rngs={"dropout": key})
    theirs = nn.Dropout(rate).apply({}, x, deterministic=False,
                                    rngs={"dropout": key})
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(theirs))


def test_backward_matches_flax_grad():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 32))

    def loss_ours(x):
        return jnp.sum(Dropout(0.3).apply(
            {}, x, deterministic=False, rngs={"dropout": key}) ** 2)

    def loss_flax(x):
        return jnp.sum(nn.Dropout(0.3).apply(
            {}, x, deterministic=False, rngs={"dropout": key}) ** 2)

    g_ours = jax.grad(loss_ours)(x)
    g_flax = jax.grad(loss_flax)(x)
    np.testing.assert_array_equal(np.asarray(g_ours), np.asarray(g_flax))


def test_deterministic_and_edge_rates():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5))
    key = jax.random.PRNGKey(9)
    np.testing.assert_array_equal(
        np.asarray(Dropout(0.4).apply({}, x, deterministic=True)),
        np.asarray(x),
    )
    np.testing.assert_array_equal(
        np.asarray(Dropout(0.0).apply({}, x, deterministic=False,
                                      rngs={"dropout": key})),
        np.asarray(x),
    )
    np.testing.assert_array_equal(
        np.asarray(Dropout(1.0).apply({}, x, deterministic=False,
                                      rngs={"dropout": key})),
        np.zeros_like(np.asarray(x)),
    )


def test_rbg_key_impl_supported():
    # The train step re-keys its dropout stream through the rbg generator
    # in-graph (training/trainer.py); the custom VJP must accept those keys.
    base = jax.random.PRNGKey(5)
    rbg = jax.random.wrap_key_data(
        jax.random.key_data(jax.random.split(base, 2)).reshape(4)
        .astype(jnp.uint32), impl="rbg")
    x = jax.random.normal(jax.random.PRNGKey(4), (6, 8))
    v, g = jax.value_and_grad(
        lambda x: rng_dropout(x, rbg, 0.25).sum())(x)
    # grad is mask/keep_prob: entries are 0 or 1/0.75
    vals = np.unique(np.asarray(g))
    assert all(
        np.isclose(v, 0.0) or np.isclose(v, 1 / 0.75, rtol=1e-6)
        for v in vals
    )
    # value consistent with the same mask
    np.testing.assert_allclose(float(v), float(jnp.sum(x * g)), rtol=1e-6)


def test_under_jit_and_vmap():
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 4, 8))

    @jax.jit
    def f(x):
        return rng_dropout(x, key, 0.2)

    eager = rng_dropout(x, key, 0.2)
    # jit may lower x/keep_prob as a reciprocal multiply — same mask,
    # values equal to float rounding.
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(eager),
                               rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(f(x)) == 0.0, np.asarray(eager) == 0.0)


def test_model_level_swap_is_bit_identical_to_flax():
    """The transformer layers use ops.dropout.Dropout; loss AND grads must
    be bit-identical to flax nn.Dropout for the same rng stream (the class
    is named Dropout so flax auto-naming keeps the same make_rng paths)."""
    import flax.linen as flax_nn

    import multimodalanalytical_tpu.models.transformer as tr
    from __graft_entry__ import _example_batch, _flagship

    model = _flagship(d_model=64, layers=2, ffn=128, vocab=50,
                      dtype="float32")
    batch = _example_batch(batch=4, n_patches=6, patch=25, formula_len=5,
                           target_len=12, vocab=50)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["encoder_inputs"], batch["encoder_mask"], batch["decoder_ids"],
        batch["decoder_mask"], batch["labels"], deterministic=True)

    def loss(v, drop_cls):
        orig = tr.Dropout
        tr.Dropout = drop_cls
        try:
            out = model.apply(
                v, batch["encoder_inputs"], batch["encoder_mask"],
                batch["decoder_ids"], batch["decoder_mask"], batch["labels"],
                deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(42)})
        finally:
            tr.Dropout = orig
        return out["loss"]

    assert float(loss(variables, tr.Dropout)) == float(
        loss(variables, flax_nn.Dropout))
    g_ours = jax.grad(lambda v: loss(v, tr.Dropout))(variables)
    g_flax = jax.grad(lambda v: loss(v, flax_nn.Dropout))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(g_ours),
                    jax.tree_util.tree_leaves(g_flax)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
