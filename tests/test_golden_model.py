"""Full-model golden parity: flax FABind vs the REAL reference top-level
torch model (IaBNet_mean_and_pocket_prediction_cls_coords_dependent,
FABind/fabind/models/model.py:26-580), executed in place with shimmed native
deps and weights converted from the genuine torch state_dict.

Covers: whole-protein pocket prediction, gumbel/rounded pocket centers,
predicted-pocket crop + <5 fallback, stage-1 teacher-forced docking, stage-2
predicted-pocket docking, distmap heads and targets, and the converter over
the complete released-checkpoint key set.
"""
from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from refshim import (REF_BASE, REF_PLUS, base_args, plus_args,
                     load_ref_models, make_full_fixture)

from fabind_tpu.config import preset
from fabind_tpu.data.types import FABindBatch
from fabind_tpu.models.fabind import make_model
from fabind_tpu.train.convert import convert_state_dict

HID, HIDP = 16, 8
SPECS = [{"n_lig": 5, "n_prot": 24}, {"n_lig": 7, "n_prot": 18}]
R = 8.0  # pocket radius for tiny fixtures


def _torch_model(n_layers=2, n_iter=2):
    ref = load_ref_models(REF_BASE)
    args = base_args(
        coordinate_scale=5.0, stage_prob=0.25,
        mean_layers=n_layers, n_iter=n_iter,
        pocket_pred_layers=1, pocket_pred_n_iter=1,
        inter_cutoff=10, intra_cutoff=8,
        use_esm2_feat=False, esm2_concat_raw=False,
        gs_tau=1.0, gs_hard=False, pocket_radius=R,
        center_dist_threshold=4.0, local_eval=False,
        train_pred_pocket_noise=0.0,
        compound_coords_init_mode="pocket_center_rdkit",
        distmap_pred="mlp")
    torch.manual_seed(3)
    m = ref.model.IaBNet_mean_and_pocket_prediction_cls_coords_dependent(
        args, embedding_channels=HID, pocket_pred_embedding_channels=HIDP)
    m.eval()
    return m


def _flax_setup(fl, n_layers=2, n_iter=2):
    Nc = fl["lig_mask"].shape[1]
    Npk = fl["pocket_mask"].shape[1]
    Nr = fl["prot_mask"].shape[1]
    cfg = preset(
        "fabind", hidden_size=HID, pocket_pred_hidden_size=HIDP,
        mean_layers=n_layers, n_iter=n_iter, pocket_pred_layers=1,
        pocket_pred_n_iter=1, use_esm2_feat=False, pocket_radius=R,
        max_ligand=Nc, max_pocket=Npk, max_protein=Nr, bond_k=4,
        ctx_k=Npk, ctx_k_whole=Nr)
    batch = FABindBatch(**{k: jnp.asarray(v) for k, v in fl.items()})
    model = make_model(cfg)
    k = jax.random.PRNGKey(0)
    variables = jax.jit(lambda: model.init(
        {"params": k, "dropout": k, "sample": k}, batch, train=False,
        stage=1))()
    return cfg, model, batch, variables


def _convert(tm, variables):
    params, missing, unused = convert_state_dict(
        tm.state_dict(), variables["params"])
    assert not missing, f"unconverted flax leaves: {missing[:8]}"
    for key in unused:
        assert ".inter_layer." in key, f"unexpectedly unused torch key {key}"
    return params


@pytest.fixture(scope="module")
def setup():
    tm = _torch_model()
    # the reference forward mutates data['complex'] in place during stage-2
    # (model.py:178-300), so torch data must be rebuilt per test
    make_data = lambda: make_full_fixture(7, SPECS, pocket_radius=R)[0]
    _, fl, specs = make_full_fixture(7, SPECS, pocket_radius=R)
    cfg, model, batch, variables = _flax_setup(fl)
    params = _convert(tm, variables)
    return tm, make_data, fl, specs, cfg, model, batch, params


def _per_sample(arr, batch_vec, b):
    return arr[np.asarray(batch_vec) == b]


def test_golden_full_forward_stage2(setup):
    tm, make_data, fl, specs, cfg, model, batch, params = setup
    data = make_data()
    with torch.no_grad():
        (coords_out, compound_batch, y_pred, y_by, cls_pred, cls_true,
         prot_mask_w, prot_coords_w, pred_center, dis_map, less5) = tm(
             data, stage=2, train=False)

    out = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, train=False, stage=2))(params, batch)

    np.testing.assert_allclose(np.asarray(out.pred_pocket_center),
                               pred_center.numpy(), atol=1e-4)
    # pocket cls logits over valid residues
    for b, s in enumerate(specs):
        npr = s["n_prot"]
        np.testing.assert_allclose(
            np.asarray(out.pocket_cls_logits)[b, :npr],
            cls_pred.numpy()[b, :npr], atol=1e-4,
            err_msg=f"cls logits sample {b}")

    cb = compound_batch.numpy()
    coords_ref = coords_out.numpy()
    for b, s in enumerate(specs):
        nl = s["n_lig"]
        np.testing.assert_allclose(
            np.asarray(out.coords)[b, :nl], _per_sample(coords_ref, cb, b),
            atol=5e-4, err_msg=f"stage2 coords sample {b}")

    # distmap head + by-coord + regression target, flattened over valid cells
    got_y, got_by, got_dm = [], [], []
    pm = np.asarray(out.pair_valid)
    for b in range(len(specs)):
        nl = specs[b]["n_lig"]
        npk = int(pm[b].any(axis=1).sum())
        got_y.append(np.asarray(out.y_pred)[b, :npk, :nl].ravel())
        got_by.append(np.asarray(out.y_pred_by_coord)[b, :npk, :nl].ravel())
        got_dm.append(np.asarray(out.dis_map_target)[b, :npk, :nl].ravel())
    np.testing.assert_allclose(np.concatenate(got_y), y_pred.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.concatenate(got_by), y_by.numpy(),
                               atol=2e-3)
    np.testing.assert_allclose(np.concatenate(got_dm), dis_map.numpy(),
                               atol=2e-3)


def test_golden_full_forward_stage1(setup):
    tm, make_data, fl, specs, cfg, model, batch, params = setup
    data = make_data()
    with torch.no_grad():
        (coords_out, compound_batch, y_pred, y_by, cls_pred, cls_true,
         *_rest, dis_map, less5) = tm(data, stage=1, train=False)

    out = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, train=False, stage=1))(params, batch)

    cb = compound_batch.numpy()
    coords_ref = coords_out.numpy()
    for b, s in enumerate(specs):
        nl = s["n_lig"]
        np.testing.assert_allclose(
            np.asarray(out.coords)[b, :nl], _per_sample(coords_ref, cb, b),
            atol=5e-4, err_msg=f"stage1 coords sample {b}")
    # stage-1 dis_map target equals the host-built one
    got_dm = []
    pm = np.asarray(out.pair_valid)
    for b in range(len(specs)):
        nl = specs[b]["n_lig"]
        npk = int(pm[b].any(axis=1).sum())
        got_dm.append(np.asarray(out.dis_map_target)[b, :npk, :nl].ravel())
    np.testing.assert_allclose(np.concatenate(got_dm), dis_map.numpy(),
                               atol=2e-3)
    # cls labels equal the reference's dense keepNode labels
    pm = np.asarray(batch.prot_mask)
    np.testing.assert_array_equal(
        np.asarray(out.pocket_cls_label)[pm],
        cls_true.numpy().astype(np.float32)[pm[:, :cls_true.shape[1]]])


def test_golden_full_inference(setup):
    tm, make_data, fl, specs, cfg, model, batch, params = setup
    data = make_data()
    with torch.no_grad():
        coords_out, compound_batch = tm.inference(data)

    coords, conf = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, method="inference"))(params, batch)

    cb = compound_batch.numpy()
    coords_ref = coords_out.numpy()
    for b, s in enumerate(specs):
        nl = s["n_lig"]
        np.testing.assert_allclose(
            np.asarray(coords)[b, :nl], _per_sample(coords_ref, cb, b),
            atol=5e-4, err_msg=f"inference coords sample {b}")


# ---------------------------------------------------------------- FABind+
BUF, MINR = 2.5, 6.0


def _torch_model_plus(n_layers=2, n_iter=2):
    ref = load_ref_models(REF_PLUS)
    args = plus_args(
        coordinate_scale=5.0, stage_prob=0.5,
        mean_layers=n_layers, n_iter=n_iter,
        pocket_pred_layers=1, pocket_pred_n_iter=1,
        inter_cutoff=10, intra_cutoff=8,
        gs_tau=1.0, gs_hard=False, pocket_radius=20.0,
        train_pred_pocket_noise=0.0,
        pocket_radius_buffer=BUF, min_pocket_radius=MINR,
        force_fix_radius=False, use_for_radius_pred="ligand",
        dis_map_thres=15.0, geom_reg_steps=1,
        confidence_training=False, stack_mlp=False, use_clustering=False)
    torch.manual_seed(4)
    m = ref.model.FABindPlus(args, embedding_channels=HID,
                             pocket_pred_embedding_channels=HIDP)
    m.eval()
    return m


def _flax_setup_plus(fl, n_layers=2, n_iter=2):
    Nc = fl["lig_mask"].shape[1]
    Npk = fl["pocket_mask"].shape[1]
    Nr = fl["prot_mask"].shape[1]
    cfg = preset(
        "fabind_plus", hidden_size=HID, pocket_pred_hidden_size=HIDP,
        mean_layers=n_layers, n_iter=n_iter, pocket_pred_layers=1,
        pocket_pred_n_iter=1, pocket_radius=20.0,
        pocket_radius_buffer=BUF, min_pocket_radius=MINR,
        max_ligand=Nc, max_pocket=Npk, max_protein=Nr, bond_k=4,
        ctx_k=Npk, ctx_k_whole=Nr)
    batch = FABindBatch(**{k: jnp.asarray(v) for k, v in fl.items()})
    model = make_model(cfg)
    k = jax.random.PRNGKey(0)
    variables = jax.jit(lambda: model.init(
        {"params": k, "dropout": k, "sample": k}, batch, train=False,
        stage=1))()
    return cfg, model, batch, variables


@pytest.fixture(scope="module")
def setup_plus():
    tm = _torch_model_plus()
    mk = lambda: make_full_fixture(11, SPECS, esm_dim=1280,
                                   dis_map_clamp=15.0,
                                   pocket_radius_buffer=BUF,
                                   min_pocket_radius=MINR)
    _, fl, specs = mk()
    cfg, model, batch, variables = _flax_setup_plus(fl)
    params = _convert(tm, variables)
    return tm, (lambda: mk()[0]), fl, specs, cfg, model, batch, params


def test_golden_plus_forward_stage2(setup_plus):
    tm, make_data, fl, specs, cfg, model, batch, params = setup_plus
    data = make_data()
    with torch.no_grad():
        (coords_out, compound_batch, y_pred, y_by, cls_pred, cls_true,
         prot_mask_w, prot_coords_w, pred_center, dis_map, less5,
         radius_pred, center_bias) = tm(data, stage=2, train=False)

    out = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, train=False, stage=2))(params, batch)

    np.testing.assert_allclose(np.asarray(out.pred_pocket_center),
                               pred_center.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.pocket_radius_pred),
                               radius_pred.numpy()[:, 0], atol=1e-4)

    # flax returns coords with the pocket-frame bias added back; the torch
    # forward returns pocket-frame coords + the bias separately
    cb = compound_batch.numpy()
    coords_ref = coords_out.numpy()
    bias = center_bias.numpy()
    for b, s in enumerate(specs):
        nl = s["n_lig"]
        np.testing.assert_allclose(
            np.asarray(out.coords)[b, :nl],
            _per_sample(coords_ref, cb, b) + bias[b], atol=1e-3,
            err_msg=f"plus stage2 coords sample {b}")

    got_y, got_dm = [], []
    pm = np.asarray(out.pair_valid)
    for b in range(len(specs)):
        nl = specs[b]["n_lig"]
        npk = int(pm[b].any(axis=1).sum())
        got_y.append(np.asarray(out.y_pred)[b, :npk, :nl].ravel())
        got_dm.append(np.asarray(out.dis_map_target)[b, :npk, :nl].ravel())
    np.testing.assert_allclose(np.concatenate(got_y), y_pred.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.concatenate(got_dm), dis_map.numpy(),
                               atol=2e-3)


def test_golden_plus_forward_stage1(setup_plus):
    tm, make_data, fl, specs, cfg, model, batch, params = setup_plus
    data = make_data()
    with torch.no_grad():
        (coords_out, compound_batch, y_pred, y_by, cls_pred, cls_true,
         *_rest, dis_map, less5, radius_pred, center_bias) = tm(
             data, stage=1, train=False)

    out = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, train=False, stage=1))(params, batch)

    cb = compound_batch.numpy()
    coords_ref = coords_out.numpy()
    # stage-1 torch bias is zero (pocket-frame output); flax adds the
    # pocket_residue_center back
    prc = np.asarray(fl["pocket_residue_center"])
    for b, s in enumerate(specs):
        nl = s["n_lig"]
        np.testing.assert_allclose(
            np.asarray(out.coords)[b, :nl],
            _per_sample(coords_ref, cb, b) + prc[b], atol=1e-3,
            err_msg=f"plus stage1 coords sample {b}")
    got_dm = []
    pm = np.asarray(out.pair_valid)
    for b in range(len(specs)):
        nl = specs[b]["n_lig"]
        npk = int(pm[b].any(axis=1).sum())
        got_dm.append(np.asarray(out.dis_map_target)[b, :npk, :nl].ravel())
    np.testing.assert_allclose(np.concatenate(got_dm), dis_map.numpy(),
                               atol=2e-3)


def test_golden_plus_inference(setup_plus):
    tm, make_data, fl, specs, cfg, model, batch, params = setup_plus
    data = make_data()
    with torch.no_grad():
        coords_out, compound_batch = tm.inference(data)

    coords, conf = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, method="inference"))(params, batch)

    cb = compound_batch.numpy()
    coords_ref = coords_out.numpy()
    for b, s in enumerate(specs):
        nl = s["n_lig"]
        np.testing.assert_allclose(
            np.asarray(coords)[b, :nl], _per_sample(coords_ref, cb, b),
            atol=1e-3, err_msg=f"plus inference coords sample {b}")
