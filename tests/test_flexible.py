"""FABFlex-style flexible docking (config.flexible_docking).

FABFlex is linked from the reference (FABind/README.md:55-71) but has no code
in the snapshot; these tests pin down the architectural contract: with
flexible_docking the pocket residues move with the ligand during recycling,
without it the docked pocket is bit-identical to the input pocket.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fabind_tpu.config import preset
from fabind_tpu.data.types import dummy_batch
from fabind_tpu.models.fabind import make_model
from fabind_tpu.train.losses import fabind_losses

from common import TINY


@pytest.fixture(scope="module")
def setup():
    rigid = preset("fabind", **TINY)
    flex = preset("fabflex", **TINY)
    assert flex.model.flexible_docking and not rigid.model.flexible_docking
    batch = dummy_batch(rigid.shapes, batch_size=2, n_lig_valid=8,
                        n_prot_valid=40)
    model_r = make_model(rigid)
    model_f = make_model(flex)
    k = jax.random.PRNGKey(0)
    # parameter structure is identical (the flag only changes the recycle
    # carry mask), so one init serves both models
    variables = jax.jit(lambda: model_r.init(
        {"params": k, "dropout": k, "sample": k}, batch, train=True))()
    return rigid, flex, batch, model_r, model_f, variables


def _gt_pocket(batch, out):
    gt = jax.vmap(lambda xyz, idx: xyz[idx])(batch.prot_xyz, out.pkt_idx)
    return np.asarray(gt * out.pkt_mask[..., None])


def test_rigid_pocket_is_input_pocket(setup):
    rigid, flex, batch, model_r, model_f, variables = setup
    out = jax.jit(lambda v, b: model_r.apply(v, b, train=False, stage=2))(
        variables, batch)
    np.testing.assert_allclose(np.asarray(out.pocket_coords),
                               _gt_pocket(batch, out), atol=1e-5)


def test_flexible_pocket_moves(setup):
    rigid, flex, batch, model_r, model_f, variables = setup
    out = jax.jit(lambda v, b: model_f.apply(v, b, train=False, stage=2))(
        variables, batch)
    gt = _gt_pocket(batch, out)
    moved = np.abs(np.asarray(out.pocket_coords) - gt)
    mask = np.asarray(out.pkt_mask)
    assert bool(np.isfinite(np.asarray(out.pocket_coords)).all())
    assert moved[mask].max() > 1e-4          # pocket actually deformed
    # padding rows stay zeroed
    assert np.abs(np.asarray(out.pocket_coords)[~mask]).max() == 0.0
    # ligand output stays finite and masked
    assert bool(np.isfinite(np.asarray(out.coords)).all())


def test_flex_loss_term_and_grad(setup):
    rigid, flex, batch, model_r, model_f, variables = setup

    def loss_fn(params, key):
        out = model_f.apply({"params": params}, batch, train=True,
                            rngs={"dropout": key, "sample": key})
        total, metrics = fabind_losses(out, batch, flex.model, flex.train)
        return total, metrics

    (total, metrics), g = jax.jit(jax.value_and_grad(
        loss_fn, has_aux=True))(variables["params"], jax.random.PRNGKey(1))
    assert np.isfinite(float(total))
    assert float(metrics["flex_pocket_coord_loss"]) >= 0.0
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0

    # the rigid config reports a zero flex term
    out_r = model_r.apply(variables, batch, train=False, stage=2)
    _, m_r = fabind_losses(out_r, batch, rigid.model, rigid.train)
    assert float(m_r["flex_pocket_coord_loss"]) == 0.0


def test_inference_flexible_shapes(setup):
    rigid, flex, batch, model_r, model_f, variables = setup
    lig, pkt, idx, mask, conf = jax.jit(lambda v, b: model_f.apply(
        v, b, method="inference_flexible"))(variables, batch)
    assert lig.shape == (2, flex.shapes.max_ligand, 3)
    assert pkt.shape == (2, flex.shapes.max_pocket, 3)
    assert idx.shape == mask.shape == (2, flex.shapes.max_pocket)
    assert conf.shape == (2,)
    assert bool(jnp.isfinite(lig).all()) and bool(jnp.isfinite(pkt).all())
