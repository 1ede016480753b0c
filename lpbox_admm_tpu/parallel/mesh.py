"""Device mesh + sharding helpers.

The reference is strictly single-process/single-device (SURVEY.md
section 2.4: no NCCL/MPI/collectives anywhere).  The TPU framework's
scaling axis is the *instance batch*: problems are embarrassingly
parallel, so the mesh carries one data axis; solver math stays
chip-local and only metric reductions / policy-training gradients cross
ICI (as jit-inserted psums when the batch is sharded).

Layout contract: every (B, ...) array in ``LpProblem``/``LpState``/
trajectory pytrees shards its leading batch axis over ``data``; model
parameters are replicated.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a (B, ...) array: batch split over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place every leaf with a leading batch axis on the mesh, batch axis
    sharded over ``axis``; scalars/rank-0 leaves are replicated."""
    bs = batch_sharding(mesh, axis)
    rep = replicated(mesh)

    def place(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            return jax.device_put(leaf, bs)
        return jax.device_put(leaf, rep)

    return jax.tree_util.tree_map(place, tree)


def replicate_pytree(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda l: jax.device_put(l, rep), tree)


def host_to_global(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Build GLOBAL ``jax.Array``s from identical host-side numpy
    pytrees present in every process (the standard multi-process DP
    ingestion pattern: each process materializes the full batch on
    host -- or at least its own shard rows -- and contributes the
    addressable shards).

    Leaves with a leading batch axis shard over ``axis``; rank-0
    leaves replicate.  In a single-process mesh this degenerates to
    ``shard_batch_pytree``.
    """
    bs = batch_sharding(mesh, axis)
    rep = replicated(mesh)

    def conv(leaf):
        arr = np.asarray(leaf)
        sh = bs if arr.ndim >= 1 else rep
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])

    return jax.tree_util.tree_map(conv, tree)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host initialization (jax.distributed) for pod-slice runs.

    On Cloud TPU pods the arguments are auto-detected; pass them
    explicitly for manual clusters.  After this, ``make_mesh()`` over
    ``jax.devices()`` spans the whole slice and the data-parallel
    sharding in this module scales across hosts (batch metrics and
    policy gradients ride ICI via jit-inserted collectives; SURVEY.md
    section 2.4 notes the reference has no distributed path at all).
    """
    import jax

    kw = {}
    if coordinator is not None:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)
    return jax.devices()
