"""Geometric primitives: radial features, per-sample F-norm, LAS projection.

Replaces the reference's coord2radial (FABind/fabind/models/egnn.py:767-787) and
the in-loop LAS projected-gradient step (egnn.py:433-448) with masked dense ops.
n_channel is 1 throughout the FABind family (model.py:37), so radial is the
scalar squared distance per edge.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array



def safe_div(a: Array, b: Array) -> Array:
    return a / jnp.where(b == 0, 1.0, b)


def las_projection_step(
    x: Array,
    las_ref: Array,
    las_adj: Array,
    step_size: float,
    clamp: float,
    steps: int = 1,
) -> Array:
    """One (or more) LAS projected-gradient corrections on ligand coords.

    Reference (egnn.py:433-448): for every LAS edge (i, j),
      force_ij = 2 * (|x_i - x_j|^2 - |t_i - t_j|^2) * 2 * (x_i - x_j)
      delta_j  = sum_i force_ij           (scatter into edge col j)
      x += clamp(delta * step_size, ±clamp)
    LAS edges live only among ligand atoms; the adjacency is symmetric.

    Args:
      x: [B, Nc, 3] current ligand coords (normalized).
      las_ref: [B, Nc, 3] reference conformer coords (normalized LAS coords).
      las_adj: [B, Nc, Nc] bool, symmetric, zero diagonal.
      clamp: elementwise clamp bound (normalize(15) in-loop; normalize(2) for
        FABind+ only_last_LAS, model.py:359-360).
    """
    ref_d2 = jnp.sum(
        (las_ref[:, :, None, :] - las_ref[:, None, :, :]) ** 2, axis=-1
    )  # [B, Nc, Nc] static per forward

    def one_step(x, _):
        diff = x[:, :, None, :] - x[:, None, :, :]          # x_i - x_j
        cur_d2 = jnp.sum(diff * diff, axis=-1)
        coef = 4.0 * (cur_d2 - ref_d2) * las_adj            # [B, Nc, Nc]
        # delta_j = sum_i coef_ij * diff_ij
        delta = jnp.einsum("bij,bijd->bjd", coef, diff)
        x = x + jnp.clip(delta * step_size, -clamp, clamp)
        return x, None

    x, _ = jax.lax.scan(one_step, x, None, length=steps)
    return x


def masked_mean(v: Array, mask: Array, axis=None) -> Array:
    mask = mask.astype(v.dtype)
    num = jnp.sum(v * mask, axis=axis)
    den = jnp.sum(mask, axis=axis)
    return safe_div(num, den)


def safe_sqrt(d2: Array) -> Array:
    """sqrt with zero (not inf/nan) gradient at 0 — padded pairs sit at
    identical coords, and masked-out infs would still poison the backward
    pass (0 * inf = nan)."""
    pos = d2 > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, d2, 1.0)), 0.0)


def pairwise_dist(a: Array, b: Array) -> Array:
    """[..., M, 3] x [..., N, 3] -> [..., M, N] Euclidean distances."""
    d2 = jnp.sum((a[..., :, None, :] - b[..., None, :, :]) ** 2, axis=-1)
    return safe_sqrt(d2)


def rmsd(pred: Array, true: Array, mask: Array) -> Array:
    """Per-sample ligand RMSD. pred/true: [B, Nc, 3], mask: [B, Nc]."""
    sd = jnp.sum((pred - true) ** 2, axis=-1)
    return jnp.sqrt(masked_mean(sd, mask, axis=1))


def centroid_dist(pred: Array, true: Array, mask: Array) -> Array:
    m = mask[..., None].astype(pred.dtype)
    denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    cp = jnp.sum(pred * m, axis=1) / denom
    ct = jnp.sum(true * m, axis=1) / denom
    return jnp.linalg.norm(cp - ct, axis=-1)
