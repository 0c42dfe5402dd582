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
    """Device_put a batch pytree with the leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
