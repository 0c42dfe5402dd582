"""Gumbel pocket-center selection vs hand computation."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import softmax as sp_softmax

from fabind_tpu.ops.gumbel import (gumbel_softmax, gumbel_softmax_no_random,
                                   pocket_center_from_cls,
                                   pocket_center_rounded)


def test_no_random_matches_reference_semantics():
    """utils/utils.py:687-699: softmax(logits/tau), straight-through hard."""
    rng = np.random.RandomState(0)
    logits = rng.randn(3, 5, 2).astype(np.float32)
    out = np.asarray(gumbel_softmax_no_random(jnp.asarray(logits), tau=0.7))
    np.testing.assert_allclose(out, sp_softmax(logits / 0.7, axis=-1),
                               atol=1e-6)
    hard = np.asarray(gumbel_softmax_no_random(jnp.asarray(logits), tau=0.7,
                                               hard=True))
    np.testing.assert_array_equal(hard.argmax(-1),
                                  sp_softmax(logits / 0.7, -1).argmax(-1))
    assert set(np.unique(hard.round(6))) <= set(
        np.unique(np.concatenate([hard, 0 * hard + 1, 0 * hard])))


def test_gumbel_softmax_is_distribution():
    logits = jnp.zeros((4, 6, 2))
    out = gumbel_softmax(logits, jax.random.PRNGKey(0), tau=1.0)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)
    # randomness present
    out2 = gumbel_softmax(logits, jax.random.PRNGKey(1), tau=1.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_center_weighted_mean():
    """Center = sum(w_i x_i)/sum(w_i) with w from class-1 prob
    (model.py:146-158)."""
    rng = np.random.RandomState(1)
    B, Nr = 2, 7
    logits = rng.randn(B, Nr).astype(np.float32)
    coords = rng.randn(B, Nr, 3).astype(np.float32)
    mask = np.ones((B, Nr), bool)
    mask[1, 5:] = False
    center = np.asarray(pocket_center_from_cls(
        jnp.asarray(logits), jnp.asarray(coords), jnp.asarray(mask),
        tau=1.0, hard=False, key=None))
    for b in range(B):
        p = 1 / (1 + np.exp(-logits[b]))
        prob = np.stack([1 - p, p], -1)
        prob = np.clip(prob, 1e-6, 1 - 1e-6)
        w = sp_softmax(np.log(prob), -1)[:, 1] * mask[b]
        want = (w[:, None] * coords[b]).sum(0) / w.sum()
        np.testing.assert_allclose(center[b], want, atol=1e-5)


def test_rounded_center_and_fallback():
    """model.py:423-437: mean of sigmoid-rounded positives, gumbel fallback."""
    B, Nr = 2, 6
    logits = np.full((B, Nr), -5.0, np.float32)
    logits[0, 1] = 5.0
    logits[0, 3] = 5.0
    coords = np.arange(B * Nr * 3, dtype=np.float32).reshape(B, Nr, 3)
    mask = np.ones((B, Nr), bool)
    center = np.asarray(pocket_center_rounded(
        jnp.asarray(logits), jnp.asarray(coords), jnp.asarray(mask),
        tau=1.0, hard=False))
    np.testing.assert_allclose(center[0], (coords[0, 1] + coords[0, 3]) / 2,
                               atol=1e-5)
    # sample 1 has no positives -> no-random gumbel fallback
    fb = np.asarray(pocket_center_from_cls(
        jnp.asarray(logits), jnp.asarray(coords), jnp.asarray(mask),
        tau=1.0, hard=False, key=None))
    np.testing.assert_allclose(center[1], fb[1], atol=1e-5)
