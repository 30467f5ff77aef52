"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as graft

    fn, args = graft.entry()
    loss, logits = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert logits.shape[0] == args[1]["Formula"].shape[0]


def test_dp_equals_single_device_loss():
    """Data-parallel loss must match the unsharded loss bitwise-closely."""
    import __graft_entry__ as graft
    from multimodalanalytical_tpu.parallel.mesh import make_mesh, shard_batch
    from multimodalanalytical_tpu.training.trainer import (
        Trainer, _device_batch,
    )

    model = graft._flagship(d_model=64, layers=1, ffn=128)
    batch = dict(graft._example_batch(batch=8), n_valid=8)

    class _Tok:
        def batch_decode(self, ids, skip_special_tokens=True):
            return ["C"] * len(ids)

    losses = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_data=n_dev, n_model=1, devices=jax.devices()[:n_dev])
        trainer = Trainer(model, _Tok(), num_steps=4, lr=1e-3, mesh=mesh, seed=0)
        state = trainer.init_state(batch)
        db = shard_batch(_device_batch(batch), mesh)

        def loss_fn(params, b):
            out = model.apply(
                {"params": params}, b["encoder_inputs"], b["encoder_mask"],
                b["decoder_ids"], b["decoder_mask"], b["labels"],
                deterministic=True,
            )
            return out["loss"]

        losses[n_dev] = float(jax.jit(loss_fn)(state.params, db))

    assert abs(losses[1] - losses[8]) < 1e-5, losses
