"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import os
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


def test_tp_equals_dp_train_step():
    """One optimizer step under TP(model=2) x DP(data=4) must match pure
    DP(data=8) numerically (GSPMD correctness of the TP param rules)."""
    import __graft_entry__ as graft
    from multimodalanalytical_tpu.parallel.mesh import (
        make_mesh, param_shardings, shard_batch,
    )
    from multimodalanalytical_tpu.training.trainer import (
        Trainer, _device_batch, _modality_segments,
    )

    model = graft._flagship(d_model=64, layers=2, ffn=128)
    batch = dict(graft._example_batch(batch=8), n_valid=8)

    class _Tok:
        def batch_decode(self, ids, skip_special_tokens=True):
            return ["C"] * len(ids)

    results = {}
    for n_data, n_model in ((8, 1), (4, 2), (2, 4)):
        mesh = make_mesh(n_data=n_data, n_model=n_model,
                         devices=jax.devices()[: n_data * n_model])
        trainer = Trainer(model, _Tok(), num_steps=4, lr=1e-3, mesh=mesh,
                          seed=0)
        state = trainer.init_state(batch)
        if n_model > 1:
            shardings = param_shardings(state.params, mesh)
            params = jax.tree_util.tree_map(
                jax.device_put, state.params, shardings)
            state = state.replace(params=params)
        db = shard_batch(_device_batch(batch), mesh)
        step = trainer._build_train_step(
            _modality_segments(db["encoder_inputs"]))
        new_state, metrics = step(state, db)
        # compare the loss and a parameter slice after the update
        leaf = jax.tree_util.tree_leaves(new_state.params)[0]
        results[(n_data, n_model)] = (
            float(metrics["loss"]), np.asarray(leaf, np.float32).ravel()[:64],
        )

    loss_dp, leaf_dp = results[(8, 1)]
    for shape in ((4, 2), (2, 4)):  # 2-way and 4-way head/FFN splits
        loss_tp, leaf_tp = results[shape]
        assert abs(loss_dp - loss_tp) < 1e-5, (shape, loss_dp, loss_tp)
        np.testing.assert_allclose(leaf_dp, leaf_tp, rtol=2e-4, atol=2e-5,
                                   err_msg=f"mesh {shape}")


def test_multihost_two_process_cpu():
    """2-process jax.distributed smoke over localhost (VERDICT r1 #9):
    both processes initialize the coordination service, build a global mesh
    spanning 2 processes x 4 local CPU devices, and run one sharded
    computation with a cross-process reduction."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        import os, sys
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax.experimental import multihost_utils

        proc = int(sys.argv[1])
        jax.distributed.initialize(
            coordinator_address="localhost:12397",
            num_processes=2, process_id=proc,
        )
        assert jax.process_count() == 2
        assert len(jax.devices()) == 8  # 4 local x 2 processes
        from multimodalanalytical_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_data=8, n_model=1)
        x = multihost_utils.host_local_array_to_global_array(
            jnp.ones((4, 16)) * (proc + 1), mesh, P("data"))
        total = jax.jit(
            lambda a: jnp.sum(a),
            out_shardings=NamedSharding(mesh, P()),
        )(x)
        # rows: 4 from proc0 (ones) + 4 from proc1 (twos) => 16*(4*1+4*2)
        expected = 16.0 * 12.0
        assert abs(float(total) - expected) < 1e-6, float(total)
        print(f"proc{proc} ok", flush=True)
    """)
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-2000:]}"
        assert f"proc{i} ok" in out


def test_multihost_trainer_fit_two_process_cpu(tmp_path):
    """VERDICT r1 #1 (Done criterion): the FULL Trainer — fit (2 epochs with
    checkpointing) + validate + beam predict — runs under 2 processes x 4
    CPU devices and matches the 1-process x 8-device run: same val metrics,
    same avg predict loss, and the rank-ordered concat of per-rank
    predictions equals the single-process predictions. Covers per-process
    DataLoader sharding (incl. the zero-row dummy shard of the final
    17-row batch), host_local_array_to_global_array batch assembly,
    local-row decode gathering, count-based cross-process metric reduction,
    and process-0-only async checkpointing."""
    import json
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_fit_worker.py")
    repo = os.path.dirname(here)

    def launch(proc_id, num_procs, local_devices, out, workdir):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            PYTHONPATH=repo,
            XLA_FLAGS=f"--xla_force_host_platform_device_count={local_devices}",
        )
        return subprocess.Popen(
            [sys.executable, worker, str(proc_id), str(num_procs),
             str(out), str(workdir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=repo,
        )

    # Single-process reference run.
    single_dir = tmp_path / "single"
    single_dir.mkdir()
    p = launch(0, 1, 8, tmp_path / "single.json", single_dir)
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, out.decode()[-3000:]
    single = json.loads((tmp_path / "single.json").read_text())

    # 2-process run over the same global 8-device mesh.
    multi_dir = tmp_path / "multi"
    multi_dir.mkdir()
    procs = [
        launch(i, 2, 4, tmp_path / f"rank{i}.json", multi_dir)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank{i} failed:\n{out[-3000:]}"
    ranks = [json.loads((tmp_path / f"rank{i}.json").read_text())
             for i in range(2)]

    # Metrics are computed from cross-process count reductions and must be
    # identical on every rank, and match the single-process run.
    for key, val in single["val"].items():
        for r in ranks:
            assert abs(r["val"][key] - val) < 1e-4, (key, r["val"], single["val"])
    for r in ranks:
        assert abs(r["avg_loss"] - single["avg_loss"]) < 1e-4

    # Rank-ordered concat of local predictions == single-process predictions
    # (process p feeds the p-th contiguous chunk of every global batch; with
    # 17 rows and batch 8 the per-batch chunks are rank0=[0:4],rank1=[4:8]).
    combined, combined_targets = [], []
    n_batches = 3  # 8, 8, 1 rows
    offsets = [0, 0]
    for b in range(n_batches):
        for r in range(2):
            rows = ranks[r]["predictions"]
            tgts = ranks[r]["targets"]
            # per-batch local row counts: batch 0/1 -> 4+4, batch 2 -> 1+0
            count = 4 if b < 2 else (1 if r == 0 else 0)
            combined.extend(rows[offsets[r]:offsets[r] + count])
            combined_targets.extend(tgts[offsets[r]:offsets[r] + count])
            offsets[r] += count
    assert combined_targets == single["targets"]
    assert combined == single["predictions"]

    # Only rank 0 writes checkpoints.
    assert ranks[0]["ckpt_last"] or ranks[1]["ckpt_last"]
    assert (multi_dir / "ckpt" / "last").exists()


def test_shard_batch_accepts_bf16_numpy():
    """The bf16 input-shipping path (trainer._device_batch) hands
    ml_dtypes.bfloat16 numpy arrays to shard_batch; they must shard over
    the data axis like any other leaf."""
    import ml_dtypes
    import numpy as np

    from multimodalanalytical_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    out = shard_batch({"a": x.astype(ml_dtypes.bfloat16)}, mesh)
    assert str(out["a"].dtype) == "bfloat16"
    assert "data" in str(out["a"].sharding.spec)
    np.testing.assert_array_equal(
        np.asarray(out["a"], dtype=np.float32), x)


def test_dp_scaling_arithmetic():
    """Auditable basis for the projected v5e-8 numbers (PROFILE.md
    'Multi-chip projection'): under dp=N the per-device batch split, the
    tokens/step arithmetic, and the compiled per-device FLOPs must all
    scale as 1/N — i.e. the dp-8 program really does 1/8 of the work per
    chip, plus only the gradient all-reduce."""
    import __graft_entry__ as graft
    from multimodalanalytical_tpu.parallel.mesh import make_mesh, shard_batch
    from multimodalanalytical_tpu.training.trainer import (
        Trainer, _device_batch, _modality_segments,
    )

    class _Tok:
        def batch_decode(self, ids, skip_special_tokens=True):
            return ["C"] * len(ids)

    model = graft._flagship(d_model=64, layers=1, ffn=128)
    global_batch = 8
    flops = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_data=n_dev, n_model=1,
                         devices=jax.devices()[:n_dev])
        batch = dict(graft._example_batch(batch=global_batch),
                     n_valid=global_batch)
        trainer = Trainer(model, _Tok(), num_steps=4, lr=1e-3, mesh=mesh,
                          seed=0)
        state = trainer.init_state(batch)
        db = shard_batch(_device_batch(batch), mesh)

        # Per-device batch split: every addressable shard of every batched
        # leaf holds exactly global_batch / n_dev rows.
        for leaf in jax.tree_util.tree_leaves(db):
            if getattr(leaf, "ndim", 0) == 0:
                continue
            for shard in leaf.addressable_shards:
                assert shard.data.shape[0] == global_batch // n_dev, (
                    leaf.shape, shard.data.shape)

        # Tokens/step is a GLOBAL invariant: mesh shape never changes it.
        dec_tokens = db["decoder_ids"].shape[0] * db["decoder_ids"].shape[1]
        assert dec_tokens == global_batch * db["decoder_ids"].shape[1]

        step = trainer._build_train_step(
            _modality_segments(db["encoder_inputs"]))
        compiled = step.lower(state, db).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops[n_dev] = float(analysis["flops"])

    # cost_analysis reports the per-device program. dp=8 must be ~1/8 the
    # single-device FLOPs; the all-reduce adds no flops to speak of, XLA
    # rewrites add a little slack.
    ratio = flops[1] / flops[8]
    assert 6.0 < ratio <= 8.5, flops
