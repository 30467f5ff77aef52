"""Multi-process (multi-host) execution helpers.

The reference trains multi-device via Lightning DDP (reference
trainer/trainer.py:58, cli/training.py:49-59): one process per device, each
with a rank-sharded dataloader, gradient all-reduce underneath. The
TPU-native equivalent keeps a single jitted GSPMD program and spans host
processes with `jax.distributed`: every process feeds its contiguous slice of
the global batch, `host_local_array_to_global_array` assembles the global
jax.Array, and XLA's collectives do the rest. These helpers are no-ops in the
(common) single-process case so the Trainer code stays one code path.

Row layout contract: process ``p`` contributes the ``p``-th contiguous block
of rows of every global batch (see ``DataLoader`` sharding in
training/loader.py), so ``local_rows`` of a batch-sharded output maps 1:1 to
this process's host-side columns (target strings, n_valid, extra columns).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main() -> bool:
    """True on the process that owns checkpoint/metric/artifact writes."""
    return jax.process_index() == 0


def rank_suffix() -> str:
    """Artifact filename suffix: per-rank files under multi-process runs
    (reference cli/training.py:230-251 writes per-rank pickles)."""
    if jax.process_count() == 1:
        return ""
    return f"_rank{jax.process_index()}"


def to_global(tree: Any, mesh: Mesh, spec: Optional[P] = None) -> Any:
    """Assemble process-local array leaves into global jax.Arrays sharded
    over the mesh 'data' axis (leading-dim concat in process order)."""
    from jax.experimental import multihost_utils

    spec = spec if spec is not None else P("data")

    def put(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            return multihost_utils.host_local_array_to_global_array(
                np.asarray(leaf), mesh, spec
            )
        return leaf

    return jax.tree_util.tree_map(put, tree)


def local_rows(arr: Any) -> np.ndarray:
    """This process's contiguous row-block of a batch-axis-sharded global
    array (inverse of ``to_global``). Requires the array's sharding to
    actually split the leading axis across processes — the Trainer pins
    decode/eval outputs to ``P('data', ...)`` via out_shardings, so the
    addressable shards here are exactly the locally-fed rows."""
    if jax.process_count() == 1 or not hasattr(arr, "addressable_shards"):
        return np.asarray(arr)
    if arr.is_fully_replicated:
        # Replicated outputs carry every process's rows; callers that need
        # local rows must pin an out_sharding. Fail loudly rather than
        # silently misattributing rows.
        raise ValueError(
            "local_rows() on a fully-replicated array under multi-process "
            "execution: pin the output to P('data') via out_shardings"
        )
    blocks = {}
    for shard in arr.addressable_shards:
        start = shard.index[0].start or 0
        if start not in blocks:
            blocks[start] = np.asarray(shard.data)
    return np.concatenate([blocks[s] for s in sorted(blocks)], axis=0)


def sum_across_processes(values: np.ndarray) -> np.ndarray:
    """Element-wise sum of a small numpy array over all processes (metric
    reduction). Identity when single-process; otherwise an allgather so
    every process sees the same totals and takes the same early-stop /
    checkpoint decisions."""
    values = np.asarray(values, dtype=np.float64)
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(values)
    return np.asarray(gathered).reshape((jax.process_count(),) + values.shape).sum(axis=0)


def batch_out_shardings(mesh: Mesh, tree: Any) -> Any:
    """Map a pytree template of PartitionSpecs to NamedShardings."""
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        tree,
        is_leaf=lambda x: isinstance(x, P),
    )
