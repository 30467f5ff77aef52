"""Single-instance TPU lock + bounded backend-init retry.

The axon relay is a single-client tunnel: two processes touching the TPU
backend concurrently have raced it into a multi-hour outage (CLAUDE.md,
round 5). Every entry point that initializes the TPU backend should
therefore (a) hold an exclusive inter-process lock for the lifetime of the
process, and (b) treat ``UNAVAILABLE`` backend init as transient and retry
with bounded backoff instead of dying on the first attempt.

The reference has no equivalent (Lightning/NCCL owns its devices per rank);
this is axon-relay operational hardening.
"""

from __future__ import annotations

import fcntl
import os
import time
from typing import Optional

LOCK_PATH = os.environ.get("AFM_TPU_LOCK", "/tmp/mma_tpu.lock")

_held_lock_fd: Optional[int] = None  # keep fd alive; lock dies with process


class TpuLockTimeout(RuntimeError):
    pass


class TpuBackendUnavailable(RuntimeError):
    pass


def acquire_tpu_lock(timeout_s: float = 120.0) -> None:
    """Take the machine-wide exclusive TPU lock, waiting up to ``timeout_s``.

    Held until process exit (never explicitly released: the relay connection
    itself lives as long as the process, so releasing earlier would reopen
    the two-clients race). Re-entrant within a process. No-op when the
    session is CPU-only (``jax_platforms`` resolved to cpu).
    """
    global _held_lock_fd
    if _held_lock_fd is not None:
        return
    fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o666)
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except BlockingIOError:
            if time.monotonic() >= deadline:
                os.close(fd)
                raise TpuLockTimeout(
                    f"another TPU process holds {LOCK_PATH} "
                    f"(waited {timeout_s:.0f}s); refusing to race the "
                    "single-client axon relay - stop the other job first"
                ) from None
            time.sleep(1.0)
    try:
        os.ftruncate(fd, 0)
        os.write(fd, f"pid={os.getpid()}\n".encode())
    except OSError:
        pass
    _held_lock_fd = fd


def honor_platform_env() -> None:
    """Re-assert the JAX_PLATFORMS env choice over the axon sitecustomize.

    The environment's sitecustomize force-sets ``jax_platforms=axon,cpu`` at
    interpreter start, which silently overrides a ``JAX_PLATFORMS=cpu`` env
    request (the config value wins over the env var). Every entry point that
    promises "JAX_PLATFORMS=cpu runs on CPU" must re-assert it AFTER
    importing jax and BEFORE any backend initialization.
    """
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass


def guard_if_tpu(timeout_s: float = 300.0) -> bool:
    """Lock + hang-safe init when the session is configured for the axon TPU.

    Honors a ``JAX_PLATFORMS`` env override first, then inspects
    ``jax.config.jax_platforms`` WITHOUT initializing a backend; a CPU-only
    run (tests, exact-mode guided decode) skips the lock entirely. Returns
    True when the guard engaged.
    """
    import jax

    honor_platform_env()
    try:
        platforms = str(jax.config.jax_platforms or "")
    except Exception:
        platforms = ""
    if not platforms.startswith("axon"):
        return False
    acquire_tpu_lock(timeout_s)
    ensure_backend_alive()
    return True


def init_devices_with_retry(max_tries: int = 4, backoff_s: float = 20.0):
    """``jax.devices()`` with bounded retry on transient UNAVAILABLE.

    The relay's backend init fails with ``Unable to initialize backend
    'axon': UNAVAILABLE`` both when it is briefly restarting (retry helps)
    and when it is down for hours (retry can't). Bounded linear backoff
    (default 20/40/60 s between 4 tries, ~2 min total) covers the former
    without stalling a driver run on the latter.
    """
    import jax

    last_err: Optional[BaseException] = None
    for attempt in range(max_tries):
        if attempt:
            time.sleep(backoff_s * attempt)
        try:
            return jax.devices()
        except RuntimeError as e:  # xla_bridge raises RuntimeError
            if "UNAVAILABLE" not in str(e):
                raise
            last_err = e
    raise TpuBackendUnavailable(
        f"TPU backend still UNAVAILABLE after {max_tries} tries: {last_err}"
    )


def probe_backend_subprocess(timeout_s: float = 240.0) -> tuple:
    """Probe backend init in a THROWAWAY subprocess with a hard timeout.

    A wedged relay makes ``jax.devices()`` hang forever with nothing to
    catch in-process (observed: round-2 outage, and again at round-3 start —
    a 120 s probe died on SIGTERM with zero output). The subprocess isolates
    the hang: on timeout it is killed and the caller can fail fast instead
    of waiting for a 90-minute watchdog. Returns ``(ok, detail)``.
    """
    import subprocess
    import sys

    code = "import jax; print(len(jax.devices()), jax.devices()[0].platform)"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"backend init hung >{timeout_s:.0f}s (relay wedged?)"
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()[-1:]
        return False, f"backend init failed rc={r.returncode}: {tail}"
    return True, r.stdout.strip()


def ensure_backend_alive(max_tries: int = 3, probe_timeout_s: float = 240.0,
                         backoff_s: float = 30.0):
    """Subprocess-probe the backend (hang-safe), then init in-process.

    Combines both failure modes: a hang is caught by the subprocess
    timeout, an UNAVAILABLE by the probe's nonzero exit; both get bounded
    retries before raising ``TpuBackendUnavailable``.
    """
    detail = ""
    for attempt in range(max_tries):
        if attempt:
            time.sleep(backoff_s * attempt)
        ok, detail = probe_backend_subprocess(probe_timeout_s)
        if ok:
            return init_devices_with_retry(max_tries=2, backoff_s=backoff_s)
    raise TpuBackendUnavailable(
        f"TPU backend unresponsive after {max_tries} probes: {detail}"
    )
