"""Shared runtime utilities: seeding, logging setup."""

from __future__ import annotations

import logging
import random
import sys
from pathlib import Path
from typing import Optional

import numpy as np

from .configuration import DEFAULT_SETTINGS


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Persistent XLA compilation cache (big win for repeated CLI runs —
    first TPU compiles take tens of seconds to minutes)."""
    import jax

    if cache_dir is None:
        cache_dir = str(Path(__file__).resolve().parents[1] / ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax
        pass


def seed_everything(seed: Optional[int] = None) -> int:
    """Seed host RNGs (reference utils.py:175-179). JAX keys are derived
    explicitly from this seed by the trainer."""
    if seed is None:
        seed = DEFAULT_SETTINGS.default_seed
    random.seed(seed)
    np.random.seed(seed)
    return seed


def setup_logging(log_file: Optional[Path] = None, level: int = logging.INFO) -> None:
    handlers: list = [logging.StreamHandler(sys.stderr)]
    if log_file is not None:
        log_file = Path(log_file)
        log_file.parent.mkdir(parents=True, exist_ok=True)
        handlers.append(logging.FileHandler(log_file))
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=handlers,
        force=True,
    )
