"""Relay-operational hardening: single-instance lock, hang-safe probe,
and bench.py's guaranteed structured-error JSON (VERDICT round 2, item 1)."""

import fcntl
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

from multimodalanalytical_tpu import tpu_guard

REPO = Path(__file__).resolve().parents[1]


def _spawn_lock_holder(lock_path, hold_s=30.0):
    """Child process that flocks the file and sleeps."""
    code = (
        "import fcntl, os, sys, time\n"
        f"fd = os.open({str(lock_path)!r}, os.O_CREAT | os.O_RDWR)\n"
        "fcntl.flock(fd, fcntl.LOCK_EX)\n"
        "print('held', flush=True)\n"
        f"time.sleep({hold_s})\n"
    )
    p = subprocess.Popen([sys.executable, "-c", code], stdout=subprocess.PIPE,
                         text=True)
    assert p.stdout.readline().strip() == "held"
    return p


def test_lock_timeout_when_contended(tmp_path, monkeypatch):
    lock_path = tmp_path / "tpu.lock"
    monkeypatch.setattr(tpu_guard, "LOCK_PATH", str(lock_path))
    monkeypatch.setattr(tpu_guard, "_held_lock_fd", None)
    holder = _spawn_lock_holder(lock_path)
    try:
        t0 = time.monotonic()
        with pytest.raises(tpu_guard.TpuLockTimeout):
            tpu_guard.acquire_tpu_lock(timeout_s=2.0)
        assert time.monotonic() - t0 < 15
    finally:
        holder.kill()
        holder.wait()


def test_lock_acquire_and_reentrant(tmp_path, monkeypatch):
    lock_path = tmp_path / "tpu.lock"
    monkeypatch.setattr(tpu_guard, "LOCK_PATH", str(lock_path))
    monkeypatch.setattr(tpu_guard, "_held_lock_fd", None)
    tpu_guard.acquire_tpu_lock(timeout_s=2.0)
    fd = tpu_guard._held_lock_fd
    assert fd is not None
    tpu_guard.acquire_tpu_lock(timeout_s=2.0)  # re-entrant: same fd
    assert tpu_guard._held_lock_fd == fd
    # a second process must NOT be able to take it
    probe = subprocess.run(
        [sys.executable, "-c",
         "import fcntl, os, sys\n"
         f"fd = os.open({str(lock_path)!r}, os.O_CREAT | os.O_RDWR)\n"
         "try:\n"
         "    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)\n"
         "    sys.exit(0)\n"
         "except BlockingIOError:\n"
         "    sys.exit(7)\n"],
        timeout=30,
    )
    assert probe.returncode == 7
    # cleanup so later tests in this process start fresh
    os.close(fd)
    tpu_guard._held_lock_fd = None


def test_guard_if_tpu_skips_on_cpu():
    # conftest forces jax_platforms=cpu: the guard must not engage (no lock,
    # no backend probe) for CPU-only work.
    assert tpu_guard.guard_if_tpu() is False


def test_probe_subprocess_reports_hang(monkeypatch):
    # Simulate a wedged relay: the probe child hangs; the caller gets a
    # fast (ok=False, hang) verdict rather than hanging itself.
    real_run = subprocess.run

    def fake_run(cmd, **kw):
        return real_run(
            [sys.executable, "-c", "import time; time.sleep(60)"],
            **{**kw, "timeout": kw.get("timeout")},
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    ok, detail = tpu_guard.probe_backend_subprocess(timeout_s=1.0)
    assert not ok
    assert "hung" in detail


def test_probe_subprocess_reports_init_failure(monkeypatch):
    real_run = subprocess.run

    def fake_run(cmd, **kw):
        return real_run(
            [sys.executable, "-c",
             "import sys; print('boom: UNAVAILABLE', file=sys.stderr); "
             "sys.exit(1)"],
            **kw,
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    ok, detail = tpu_guard.probe_backend_subprocess(timeout_s=10.0)
    assert not ok
    assert "rc=1" in detail


def test_ensure_backend_alive_raises_bounded(monkeypatch):
    calls = []

    def fake_probe(timeout_s):
        calls.append(timeout_s)
        return False, "backend init hung >1s (relay wedged?)"

    monkeypatch.setattr(tpu_guard, "probe_backend_subprocess", fake_probe)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    with pytest.raises(tpu_guard.TpuBackendUnavailable):
        tpu_guard.ensure_backend_alive(max_tries=3, probe_timeout_s=1.0)
    assert len(calls) == 3


@pytest.mark.e2e
def test_bench_emits_error_json_on_any_failure(tmp_path):
    """Round-2 regression: bench died as a raw traceback -> parsed: null.

    Hold the lock, run bench.py with a 1 s lock timeout: it must exit
    nonzero AND still print the one structured JSON line."""
    lock_path = tmp_path / "tpu.lock"
    holder = _spawn_lock_holder(lock_path)
    env = dict(
        os.environ,
        AFM_TPU_LOCK=str(lock_path),
        BENCH_LOCK_TIMEOUT_S="1",
        # Simulate the TPU session: guard_if_tpu engages the lock only for
        # an axon-configured run (a JAX_PLATFORMS=cpu smoke run skips it
        # and executes the whole bench, see test below). The lock times out
        # BEFORE any backend init, so no relay contact happens here.
        JAX_PLATFORMS="axon,cpu",
    )
    try:
        r = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            capture_output=True, text=True, timeout=180, env=env,
            cwd=str(REPO),
        )
    finally:
        holder.kill()
        holder.wait()
    assert r.returncode == 1
    json_lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert json_lines, f"no JSON line in stdout:\n{r.stdout}\n{r.stderr}"
    parsed = json.loads(json_lines[-1])
    assert parsed["metric"] == "ir_recipe_spectra_per_sec_per_chip_typical"
    assert "error" in parsed and "TpuLockTimeout" in parsed["error"]


def test_guard_skips_lock_on_cpu_run(tmp_path, monkeypatch):
    """A JAX_PLATFORMS=cpu run must not take the TPU lock or probe the
    relay (review r3: bench.py previously locked+probed unconditionally,
    blocking CPU smoke runs behind TPU jobs and a wedged relay)."""
    import jax

    lock_path = tmp_path / "tpu.lock"
    monkeypatch.setattr(tpu_guard, "LOCK_PATH", str(lock_path))
    monkeypatch.setattr(tpu_guard, "_held_lock_fd", None)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    # conftest already forces the cpu platform; the guard must see it.
    assert tpu_guard.guard_if_tpu(timeout_s=0.1) is False
    assert not lock_path.exists()
    assert jax.config.jax_platforms == "cpu"
