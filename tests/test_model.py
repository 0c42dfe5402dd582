"""Model-level behavior tests (tiny shapes, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fabind_tpu.config import preset
from fabind_tpu.data.types import dummy_batch
from fabind_tpu.models.fabind import make_model

from common import TINY


@pytest.fixture(scope="module", params=["fabind", "fabind_plus"])
def setup(request):
    cfg = preset(request.param, **TINY)
    batch = dummy_batch(cfg.shapes, batch_size=2, n_lig_valid=8,
                        n_prot_valid=40)
    model = make_model(cfg)
    k = jax.random.PRNGKey(0)
    variables = jax.jit(lambda: model.init(
        {"params": k, "dropout": k, "sample": k}, batch, train=True))()
    return cfg, batch, model, variables


def test_forward_shapes_and_finiteness(setup):
    cfg, batch, model, variables = setup
    out = jax.jit(lambda v, b: model.apply(v, b, train=False, stage=2))(
        variables, batch)
    Nc = cfg.shapes.max_ligand
    Np = cfg.shapes.max_pocket
    assert out.coords.shape == (2, Nc, 3)
    assert out.y_pred.shape == (2, Np, Nc)
    assert bool(jnp.isfinite(out.coords).all())
    assert bool(jnp.isfinite(out.y_pred).all())
    assert bool(jnp.isfinite(out.pocket_cls_logits).all())
    # y_pred range: sigmoid * dis_map_thres
    assert float(out.y_pred.max()) <= cfg.model.dis_map_thres + 1e-4
    assert float(out.y_pred.min()) >= 0.0
    # dis_map target clamped
    pv = out.pair_valid
    assert float((out.dis_map_target * pv).max()) <= cfg.model.dis_map_thres + 1e-4


def test_eval_deterministic(setup):
    cfg, batch, model, variables = setup
    f = jax.jit(lambda v, b: model.apply(v, b, train=False, stage=2))
    a = f(variables, batch)
    b = f(variables, batch)
    np.testing.assert_array_equal(np.asarray(a.coords), np.asarray(b.coords))


def test_train_stochastic_and_grad(setup):
    cfg, batch, model, variables = setup
    def run(key):
        return model.apply(variables, batch, train=True,
                           rngs={"dropout": key, "sample": key}).coords
    a = jax.jit(run)(jax.random.PRNGKey(1))
    b = jax.jit(run)(jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(a), np.asarray(b))

    def loss(params, key):
        out = model.apply({"params": params}, batch, train=True,
                          rngs={"dropout": key, "sample": key})
        m = out.lig_mask[..., None]
        return jnp.sum(jnp.abs(out.coords - batch.lig_coords) * m) / jnp.sum(m)

    g = jax.jit(jax.grad(loss))(variables["params"], jax.random.PRNGKey(3))
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_padding_invariance(setup):
    """Growing the protein padding must not change valid outputs."""
    cfg, batch, model, variables = setup
    import dataclasses
    big_shapes = dataclasses.replace(cfg.shapes,
                                     max_protein=cfg.shapes.max_protein + 16)
    pad = 16
    batch2 = batch.replace(
        prot_feat=jnp.pad(batch.prot_feat, ((0, 0), (0, pad), (0, 0))),
        prot_mask=jnp.pad(batch.prot_mask, ((0, 0), (0, pad))),
        prot_xyz=jnp.pad(batch.prot_xyz, ((0, 0), (0, pad), (0, 0))),
        pocket_label=jnp.pad(batch.pocket_label, ((0, 0), (0, pad))),
    )
    f = jax.jit(lambda v, b: model.apply(v, b, train=False, stage=2))
    a = f(variables, batch)
    b = f(variables, batch2)
    # fp32 reduction-order noise is amplified through the recycle loop
    # (float64 agreement is ~1e-13; verified separately), so tolerances here
    # are loose — this test guards against *logic* padding leaks only.
    np.testing.assert_allclose(np.asarray(a.coords), np.asarray(b.coords),
                               atol=5e-2, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(a.pocket_cls_logits[:, :cfg.shapes.max_protein]),
        np.asarray(b.pocket_cls_logits[:, :cfg.shapes.max_protein]),
        atol=5e-2, rtol=1e-2)


def test_inference_matches_eval_stage2_shape(setup):
    cfg, batch, model, variables = setup
    coords, conf = jax.jit(
        lambda v, b: model.apply(v, b, method="inference"))(variables, batch)
    assert coords.shape == (2, cfg.shapes.max_ligand, 3)
    assert bool(jnp.isfinite(coords).all())


def test_reference_init_gains(setup):
    """Coordinate-update heads and the whole-protein embedding layers must
    start xavier(gain=0.001)-small (reference egnn.py:51-52,162-164,
    model.py:74-79) — from-scratch training stability depends on it."""
    cfg, batch, model, variables = setup[:4]
    import numpy as np
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    checked = 0
    for path, leaf in flat:
        names = [getattr(p, "key", "") for p in path]
        if "kernel" not in names:
            continue
        joined = "/".join(names)
        if ("coord_mlp" in joined and "linear2" in joined) or \
                "embedding_shrink" in joined or "embedding_enlarge" in joined:
            fan_in, fan_out = leaf.shape[-2], leaf.shape[-1]
            limit = 0.001 * np.sqrt(6.0 / (fan_in + fan_out))
            assert float(jnp.abs(leaf).max()) <= limit * 1.0001, joined
            checked += 1
    assert checked >= 4, f"only {checked} gain-initialized kernels found"
