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


# ------------------------------------------------------- golden vs torch
# Direct golden against the reference's torch implementation (executed in
# place via refshim.load_ref_util — generation_utils.py:42-120). Pins the
# conventions that property tests can silently get wrong: SUM (not mean)
# reduction, LAS mask counted in BOTH edge directions, excluded-volume term
# including the (constant) diagonal, clamp-then-subtract order, and the
# 5e-3*(epoch-500) schedule crossover at exactly epoch 500.

def _ref_gen_utils():
    import pytest
    torch = pytest.importorskip("torch")
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from refshim import REF_BASE, load_ref_util
    return torch, load_ref_util(REF_BASE, "generation_utils")


def test_golden_loss_values_vs_reference():
    torch, gen = _ref_gen_utils()
    y_pred, pkt, gt, las, am, pm = _problem(B=1, seed=11)
    ref_dis = jnp.linalg.norm(gt[:, :, None] - gt[:, None, :], axis=-1)
    x = np.asarray(gt) + np.random.RandomState(0).randn(
        *gt.shape).astype(np.float32) * 2.0

    T = torch.from_numpy
    for mode in (0, 1, 2):
        for epoch in (0.0, 250.0, 500.0, 777.0, 4999.0):
            ours = float(distance_map_loss(
                jnp.asarray(epoch), jnp.asarray(x), y_pred, pkt, ref_dis,
                las, am, pm, dis_thres=10.0, mode=mode)[0])
            ref_loss, (ref_inter, ref_conf) = gen.distance_loss_function(
                int(epoch), T(np.asarray(y_pred)[0]), T(x[0]),
                T(np.asarray(pkt)[0]), T(np.asarray(ref_dis)[0]),
                LAS_distance_constraint_mask=T(np.asarray(las)[0]),
                mode=mode)
            np.testing.assert_allclose(
                ours, float(ref_loss), rtol=2e-4,
                err_msg=f"mode={mode} epoch={epoch}")


def test_golden_trajectory_vs_reference():
    """Same init, 120 Adam steps (crossing nothing — interaction-only
    phase), then 700 steps (crossing the 500-step schedule boundary):
    coords must track the torch optimizer."""
    torch, gen = _ref_gen_utils()
    y_pred, pkt, gt, las, am, pm = _problem(B=1, seed=13)
    x0 = (np.asarray(pkt)[0].mean(0, keepdims=True)
          + np.random.RandomState(5).uniform(
              -5, 5, np.asarray(gt)[0].shape)).astype(np.float32)

    def run_ref(steps):
        T = torch.from_numpy
        xt = T(x0.copy())
        xt.requires_grad = True
        opt = torch.optim.Adam([xt], lr=0.1)
        for epoch in range(steps):
            opt.zero_grad()
            loss, _ = gen.distance_loss_function(
                epoch, T(np.asarray(y_pred)[0]), xt, T(np.asarray(pkt)[0]),
                T(np.linalg.norm(np.asarray(gt)[0][:, None]
                                 - np.asarray(gt)[0][None], axis=-1)),
                LAS_distance_constraint_mask=T(np.asarray(las)[0]), mode=0)
            loss.backward()
            opt.step()
        return xt.detach().numpy()

    # the L1 objective is non-smooth: fp32 rounding flips subgradient signs
    # at |.| kinks and the flips compound through Adam's moments, so
    # per-coordinate agreement is bounded (~0.04 A max at 700 steps,
    # measured), not bit-tight like the smooth model goldens; a convention
    # error (sum vs mean, one-direction LAS, missing diagonal) diverges by
    # ANGSTROMS here, which is what this pins down
    for steps, atol in ((120, 0.06), (700, 0.1)):
        ours, _ = distance_optimize_batch(
            y_pred, pkt, gt, las, am, pm, jax.random.PRNGKey(0),
            steps=steps, x0=jnp.asarray(x0)[None])
        ref = run_ref(steps)
        np.testing.assert_allclose(np.asarray(ours)[0], ref, atol=atol,
                                   err_msg=f"trajectory diverged at {steps}")
        rmsd_ours = float(np.sqrt(
            ((np.asarray(ours)[0] - np.asarray(gt)[0]) ** 2).sum(-1).mean()))
        rmsd_ref = float(np.sqrt(
            ((ref - np.asarray(gt)[0]) ** 2).sum(-1).mean()))
        assert abs(rmsd_ours - rmsd_ref) < 0.05, (rmsd_ours, rmsd_ref)
