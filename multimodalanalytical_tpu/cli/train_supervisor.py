"""Fault-survivable training supervisor (VERDICT r4 item 5).

Long mixture/accuracy runs on the axon relay die for reasons unrelated to
the recipe — transient RESOURCE_EXHAUSTED bursts, relay wedges, session
faults (the round-4 40M-sample run died twice, RESULTS.md). The trainer's
resume path is schedule-correct (OneCycle horizon + optimizer state +
loader epoch order all restore; tests/test_trainer.py, test_supervisor.py)
but nothing relaunched the process. This supervisor does:

  * runs ``python -m multimodalanalytical_tpu.cli.training <args...>`` as a
    child (pid recorded at <working_dir>/<job_name>/train.pid so operators
    can kill BY PID, never by pattern);
  * on nonzero exit: optionally probes the TPU relay with the hang-safe
    subprocess probe (tpu_guard) until it answers, then relaunches with
    ``model.model_checkpoint_path=<ckpt>/last`` so the trainer resumes —
    falling back to a fresh start when no checkpoint landed yet;
  * bounds restarts (``--max-restarts``, default 3) and backs off between
    attempts.

The reference has no equivalent (its Lightning runs die with the process);
this is framework surface earned by the relay's failure modes.

Usage:
  python -m multimodalanalytical_tpu.cli.train_supervisor \
      [--max-restarts N] [--no-probe] [--backoff-s S] -- <training args...>
"""

from __future__ import annotations

import argparse
import logging
import subprocess
import sys
import time
from pathlib import Path
from typing import List, Optional

logger = logging.getLogger("train_supervisor")


def _arg_value(args: List[str], key: str) -> Optional[str]:
    for a in args:
        if a.startswith(key + "="):
            return a.split("=", 1)[1]
    return None


def _with_resume(args: List[str], ckpt: Path) -> List[str]:
    out = [a for a in args if not a.startswith("model.model_checkpoint_path=")]
    out.append(f"model.model_checkpoint_path={ckpt}")
    return out


def _wait_for_relay(timeout_s: float = 240.0, max_wait_s: float = 3600.0) -> bool:
    """Poll the hang-safe probe until the relay answers (bounded)."""
    from ..tpu_guard import probe_backend_subprocess

    deadline = time.time() + max_wait_s
    while time.time() < deadline:
        ok, detail = probe_backend_subprocess(timeout_s=timeout_s)
        if ok:
            logger.info("Relay probe ok: %s", detail)
            return True
        logger.warning("Relay probe failed (%s); retrying in 60 s", detail)
        time.sleep(60)
    return False


def run_supervised(
    train_args: List[str],
    max_restarts: int = 3,
    probe: bool = True,
    backoff_s: float = 10.0,
) -> int:
    working_dir = _arg_value(train_args, "working_dir") or "."
    job_name = _arg_value(train_args, "job_name") or "default"
    job_dir = Path(working_dir) / job_name
    job_dir.mkdir(parents=True, exist_ok=True)
    pid_file = job_dir / "train.pid"
    ckpt_last = job_dir / "checkpoints" / "last"

    attempt = 0
    args = list(train_args)
    while True:
        cmd = [sys.executable, "-m", "multimodalanalytical_tpu.cli.training",
               *args]
        logger.info("Attempt %d: %s", attempt, " ".join(cmd))
        child = subprocess.Popen(cmd)
        pid_file.write_text(str(child.pid))
        rc = child.wait()
        if rc == 0:
            logger.info("Training completed (attempt %d)", attempt)
            return 0
        attempt += 1
        if attempt > max_restarts:
            logger.error("Training failed rc=%d; restart budget exhausted",
                         rc)
            return rc
        logger.warning("Training died rc=%d; restart %d/%d", rc, attempt,
                       max_restarts)
        time.sleep(backoff_s)
        if probe and not _wait_for_relay():
            logger.error("Relay never recovered; giving up")
            return rc
        if ckpt_last.is_dir():
            args = _with_resume(train_args, ckpt_last)
            logger.info("Relaunching with resume from %s", ckpt_last)
        else:
            args = list(train_args)
            logger.info("No checkpoint yet; relaunching fresh")


def main(argv: Optional[List[str]] = None) -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:
        split = argv.index("--")
        own, train_args = argv[:split], argv[split + 1:]
    else:
        own, train_args = [], argv
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-restarts", type=int, default=3)
    ap.add_argument("--no-probe", action="store_true")
    ap.add_argument("--backoff-s", type=float, default=10.0)
    opts = ap.parse_args(own)
    rc = run_supervised(
        train_args,
        max_restarts=opts.max_restarts,
        probe=not opts.no_probe,
        backoff_s=opts.backoff_s,
    )
    sys.exit(rc)


if __name__ == "__main__":
    main()
