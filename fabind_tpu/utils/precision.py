"""Shared precision helpers."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_tree_bf16(tree):
    """Cast every float32 leaf of a pytree to bfloat16, leaving ints/bools/
    other dtypes alone. THE bf16 deployment cast — params AND batch floats
    (casting params only is a silent no-op: fp32 inputs re-promote every
    matmul). One implementation shared by the trainer, the serving engine,
    bench, and the perf tools so the cast semantics cannot drift."""
    def cast(x):
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x.astype(jnp.bfloat16)
        return x
    return jax.tree_util.tree_map(cast, tree)
