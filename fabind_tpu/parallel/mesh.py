"""Device mesh + sharding rules.

TPU-native replacement for the reference's accelerate/DDP/NCCL layer
(FABind/fabind/main_fabind.py:194-196, 289-296): a 1-D data-parallel mesh over
ICI; parameters replicated, batch sharded on the leading axis. XLA inserts the
gradient psum from the sharding constraints — the collective surface of the
reference (allreduce on backward) emerges from `jit` instead of NCCL hooks.

Complexes are small (≤ ~1600 nodes), so model parallelism is never needed;
scaling is pure DP, matching the reference's design point (SURVEY.md §2.3).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Leading-axis sharding for any batch pytree leaf."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "dp") -> Any:
    """Shard a host batch pytree over the mesh's leading axis.

    Single-process: a device_put with the dp sharding.

    Multi-process (one process per host, as on TPU pods): each host's Loader
    feeds a DIFFERENT local batch (host_shard strided slice), so the global
    array must be assembled from per-process data —
    `jax.make_array_from_process_local_data` stacks the local batches into a
    global array of leading size local_B * process_count. A plain
    device_put would (wrongly) assume every host passed the same global
    value, silently training on 1/num_hosts of the data.
    """
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        procs = {d.process_index for d in mesh.devices.flat}
        if len(procs) != jax.process_count():
            raise ValueError(
                f"multi-process shard_batch needs a mesh spanning every "
                f"process's devices (mesh covers {len(procs)} of "
                f"{jax.process_count()} processes) — e.g. --dp smaller "
                f"than the pod slices the first host's chips only; build "
                f"the mesh over all devices (make_mesh() with no count)")
        def to_global(x):
            x = np.asarray(x)
            global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(sh, x, global_shape)
        return jax.tree_util.tree_map(to_global, batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
