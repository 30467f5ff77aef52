"""Device mesh + GSPMD sharding rules.

The reference's only distribution strategy is Lightning DDP over NCCL
(reference trainer/trainer.py:58, cli/training.py:49-59). The TPU-native
equivalent is single-controller GSPMD: build a ``Mesh`` over ('data',
'model'), shard the batch over 'data' and (optionally) the wide matmuls over
'model'; XLA inserts the all-reduces over ICI. No hand-written communication,
no barriers, no find-unused-parameters workaround.

Multi-host pods: call ``jax.distributed.initialize()`` before ``make_mesh``
and the same code spans DCN.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost() -> bool:
    """Initialize JAX multi-host (DCN) coordination when the standard env
    (COORDINATOR_ADDRESS / JAX process env or TPU pod metadata) is present.

    Reference equivalent: torch.distributed.init_process_group from torchrun
    env (reference cli/training.py:49-59). Returns True when distributed mode
    was initialized.
    """
    import os

    if os.environ.get("AFM_MULTIHOST", "").lower() not in ("1", "true", "yes"):
        return False
    jax.distributed.initialize()
    return True


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        devices = devices[: n_data * n_model]
    grid = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Batch-axis 'data' sharding for every array leaf.

    Single process: a plain device_put against the global NamedSharding.
    Multi-process (jax.process_count() > 1): each process holds only its
    contiguous row-block of the global batch (DataLoader sharding), so the
    global jax.Array is assembled with host_local_array_to_global_array —
    leading-axis concat in process order (reference equivalent: DDP's
    per-rank batches, trainer/trainer.py:58).
    """
    if jax.process_count() > 1:
        from .multihost import to_global

        return to_global(batch, mesh)
    sharding = batch_sharding(mesh)

    def put(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            return jax.device_put(leaf, sharding)
        return leaf

    return jax.tree_util.tree_map(put, batch)


# Tensor-parallel rules: param path regex -> PartitionSpec. Wide matmuls
# shard their hidden dimension over 'model'; everything else is replicated
# (embeddings and LayerNorms are small at this model scale).
_TP_RULES = [
    # Fused projections shard their (stacked) output dim; the post-matmul
    # split then crosses shard boundaries (GSPMD inserts the reshard) —
    # correct, mildly suboptimal vs head-aligned sharding.
    (re.compile(r"(q_proj|qkv_proj|kv_proj)/kernel$"), P(None, "model")),
    (re.compile(r"(q_proj|qkv_proj|kv_proj)/bias$"), P("model")),
    (re.compile(r"out_proj/kernel$"), P("model", None)),
    (re.compile(r"(linear1|gate)/kernel$"), P(None, "model")),
    (re.compile(r"(linear1|gate)/bias$"), P("model")),
    (re.compile(r"linear2/kernel$"), P("model", None)),
    (re.compile(r"lm_head/kernel$"), P(None, "model")),
    (re.compile(r"lm_head/bias$"), P("model")),
]


def _spec_for_path(path: str, leaf) -> P:
    for pattern, spec in _TP_RULES:
        if pattern.search(path):
            # Only shard if the dimension divides evenly; fall back to
            # replication otherwise (correct, just less parallel).
            dims = [d for d in spec if d is not None]
            if not dims:
                return spec
            axis = list(spec).index(dims[0])
            if leaf.ndim > axis:
                return spec
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for a param pytree: TP rules over 'model',
    replicated over 'data' (pure data parallel keeps everything replicated)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path) -> str:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "name"):
                parts.append(str(p.name))
            else:
                parts.append(str(p))
        return "/".join(parts)

    specs = {}
    for path, leaf in flat:
        key = path_str(path)
        spec = _spec_for_path(key, leaf) if mesh.shape.get("model", 1) > 1 else P()
        # Verify divisibility; replicate if the axis size doesn't divide.
        ok = True
        for dim, axis_name in enumerate(spec):
            if axis_name is not None and leaf.shape[dim] % mesh.shape[axis_name] != 0:
                ok = False
        specs[key] = NamedSharding(mesh, spec if ok else P())

    def map_fn(path, leaf):
        del leaf
        return specs[path_str(path)]

    return jax.tree_util.tree_map_with_path(map_fn, params)
