"""Fault-survivable training supervisor (cli/train_supervisor.py).

The round-4 40M-sample run died twice mid-run (RESULTS.md); resume was
unit-tested but nothing relaunched the process. Pins:

  * a SIGKILL mid-run is survived: the supervisor relaunches with resume
    from ``checkpoints/last`` and the finished run's parameters match an
    uninterrupted control run (schedule-correct + loader-epoch-correct
    continuation — bit-level determinism on CPU);
  * the restart budget is enforced.
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

TEST_DATA = Path(__file__).parent / "test_data" / "ir_dataset"
REPO = Path(__file__).resolve().parents[1]

SMALL_MODEL = [
    "data=ir/patches",
    "data.IR.preprocessor_arguments.patch_size=125",
    "data.Formula.column=molecular_formula",
    "model=custom_model",
    "molecules=True",
    "trainer.epochs=8",
    "model.d_model=64",
    "model.encoder_layers=1",
    "model.decoder_layers=1",
    "model.encoder_ffn_dim=128",
    "model.decoder_ffn_dim=128",
    "model.encoder_attention_heads=4",
    "model.decoder_attention_heads=4",
    "model.batch_size=8",
    "model.n_beams=2",
    "model.dtype=float32",
]


@pytest.fixture(scope="module")
def fixture_dataset():
    if not (TEST_DATA / "ir_data.parquet").exists():
        sys.path.insert(0, str(Path(__file__).parent))
        from make_fixture import main

        main(TEST_DATA)
    return TEST_DATA


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    return env


def _train_args(run_dir, job, fixture):
    return [f"working_dir={run_dir}", f"job_name={job}",
            f"data_path={fixture}", *SMALL_MODEL]


def _params(run_dir, job):
    from multimodalanalytical_tpu.training.checkpoint import restore_params

    return restore_params(Path(run_dir) / job / "checkpoints" / "last")


@pytest.mark.e2e
def test_supervisor_survives_midrun_kill_and_matches_control(
    fixture_dataset, tmp_path
):
    # Control: uninterrupted run.
    rc = subprocess.call(
        [sys.executable, "-m", "multimodalanalytical_tpu.cli.training",
         *_train_args(tmp_path, "control", fixture_dataset)],
        env=_env(), cwd=REPO,
    )
    assert rc == 0

    # Supervised run, killed mid-training.
    sup = subprocess.Popen(
        [sys.executable, "-m", "multimodalanalytical_tpu.cli.train_supervisor",
         "--max-restarts", "2", "--no-probe", "--backoff-s", "0.5", "--",
         *_train_args(tmp_path, "victim", fixture_dataset)],
        env=_env(), cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    log = tmp_path / "victim" / "training.log"
    pid_file = tmp_path / "victim" / "train.pid"
    killed = False
    deadline = time.time() + 600
    while time.time() < deadline:
        if log.exists() and "epoch 2 done" in log.read_text():
            os.kill(int(pid_file.read_text()), signal.SIGKILL)
            killed = True
            break
        if sup.poll() is not None:
            break
        time.sleep(0.5)
    assert killed, "training finished before the kill could land"
    out, _ = sup.communicate(timeout=600)
    assert sup.returncode == 0, out[-3000:]
    assert "Training died" in out

    control = _params(tmp_path, "control")
    victim = _params(tmp_path, "victim")
    import jax

    for c, v in zip(jax.tree_util.tree_leaves(control),
                    jax.tree_util.tree_leaves(victim)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(v),
                                   rtol=1e-6, atol=1e-7)


def test_supervisor_restart_budget(monkeypatch, tmp_path):
    from multimodalanalytical_tpu.cli import train_supervisor as sup

    calls = []

    class FakeChild:
        pid = 4242

        def wait(self):
            return 17

    monkeypatch.setattr(sup.subprocess, "Popen",
                        lambda cmd: calls.append(cmd) or FakeChild())
    rc = sup.run_supervised(
        [f"working_dir={tmp_path}", "job_name=j"],
        max_restarts=2, probe=False, backoff_s=0.0,
    )
    assert rc == 17
    assert len(calls) == 3  # initial + 2 restarts
    assert (tmp_path / "j" / "train.pid").read_text() == "4242"


def test_supervisor_injects_resume_arg(tmp_path):
    from multimodalanalytical_tpu.cli.train_supervisor import _with_resume

    args = ["working_dir=/w", "job_name=j",
            "model.model_checkpoint_path=/stale"]
    out = _with_resume(args, Path("/w/j/checkpoints/last"))
    assert "model.model_checkpoint_path=/stale" not in out
    assert "model.model_checkpoint_path=/w/j/checkpoints/last" in out
