"""Gumbel-softmax pocket-center selection.

Reference: torch F.gumbel_softmax at train (model.py:153) and the deterministic
no-random variant at eval (FABind/fabind/utils/utils.py:687-699).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def gumbel_softmax(logits: Array, key: jax.Array, tau: float = 1.0,
                   hard: bool = False, axis: int = -1) -> Array:
    """Matches torch.nn.functional.gumbel_softmax semantics."""
    u = jax.random.uniform(key, logits.shape, logits.dtype,
                           minval=jnp.finfo(logits.dtype).tiny, maxval=1.0)
    g = -jnp.log(-jnp.log(u))
    y_soft = jax.nn.softmax((logits + g) / tau, axis=axis)
    if hard:
        idx = jnp.argmax(y_soft, axis=axis)
        y_hard = jax.nn.one_hot(idx, logits.shape[axis], dtype=logits.dtype,
                                axis=axis)
        return y_hard - jax.lax.stop_gradient(y_soft) + y_soft
    return y_soft


def gumbel_softmax_no_random(logits: Array, tau: float = 1.0,
                             hard: bool = False, axis: int = -1) -> Array:
    """Deterministic eval path (utils/utils.py:687-699): plain softmax of
    logits/tau, optionally straight-through hard."""
    y_soft = jax.nn.softmax(logits / tau, axis=axis)
    if hard:
        idx = jnp.argmax(y_soft, axis=axis)
        y_hard = jax.nn.one_hot(idx, logits.shape[axis], dtype=logits.dtype,
                                axis=axis)
        return y_hard - jax.lax.stop_gradient(y_soft) + y_soft
    return y_soft


def pocket_center_from_cls(
    cls_logits: Array,
    coords: Array,
    mask: Array,
    tau: float,
    hard: bool,
    key: jax.Array | None,
) -> Array:
    """Soft pocket center from residue classification logits.

    Reproduces model.py:146-158: p = sigmoid(logit); two-class log-prob
    [log(1-p), log(p)] clamped to [1e-6, 1-1e-6]; (no-)gumbel softmax; center =
    Σ w_i x_i / Σ w_i with w = class-1 weight masked to valid residues.

    Args:
      cls_logits: [B, Nr] (already masked-multiplied like the reference).
      coords: [B, Nr, 3] (unnormalized protein coords).
      mask: [B, Nr].
      key: None -> deterministic no-random variant.
    Returns:
      [B, 3] predicted center.
    """
    p_true = jax.nn.sigmoid(cls_logits)[..., None]
    prob = jnp.concatenate([1.0 - p_true, p_true], axis=-1)
    prob = jnp.clip(prob, 1e-6, 1 - 1e-6)
    log_prob = jnp.log(prob)
    if key is None:
        one_hot = gumbel_softmax_no_random(log_prob, tau=tau, hard=hard)
    else:
        one_hot = gumbel_softmax(log_prob, key, tau=tau, hard=hard)
    w = one_hot[..., 1] * mask.astype(one_hot.dtype)       # [B, Nr]
    num = jnp.sum(w[..., None] * coords, axis=1)
    den = jnp.sum(w, axis=1, keepdims=True)
    from fabind_tpu.ops.geometry import safe_div
    return safe_div(num, den)


def pocket_center_rounded(
    cls_logits: Array,
    coords: Array,
    mask: Array,
    tau: float,
    hard: bool,
) -> Array:
    """Inference-time center (model.py:423-437): mean of residues whose
    sigmoid rounds to 1; fallback to the no-random gumbel center when no
    residue is predicted positive."""
    from fabind_tpu.ops.geometry import safe_div
    pos = (jax.nn.sigmoid(cls_logits) >= 0.5) & mask
    w = pos.astype(coords.dtype)
    den = jnp.sum(w, axis=1, keepdims=True)
    rounded = safe_div(jnp.sum(w[..., None] * coords, axis=1), den)
    fallback = pocket_center_from_cls(cls_logits, coords, mask, tau, hard, None)
    return jnp.where(den > 0, rounded, fallback)
