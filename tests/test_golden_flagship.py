"""Flagship-scale golden parity + bf16 accuracy audit (round-2 item).

The released FABind base config (test_fabind.py:182-185): hidden 512 /
pocket-pred 128, mean_layers 4 (+1 out layer), pocket_pred_layers 1,
n_iter 8 recycles, ESM2 features. Round 1 proved parity only at hidden 16 /
2 layers / 2 recycles; accumulated drift across 8 recycles x 5 layers at
real widths is what tiny shapes cannot see — this module runs the REAL
reference torch model at the released width on synthetic complexes (CPU,
fp32) and asserts documented tolerances, then quantifies what bf16 (the
deployment dtype of bench.py/serve.py) costs in pose accuracy.

Measured on this fixture (2 complexes, 5-7 atoms, 18-24 residues):
  fp32 flax vs torch   max |coord delta| ~5e-7 A (stage 1 AND stage 2,
                       8 recycles x 5 layers at hidden 512 — bit-tight;
                       drift does NOT accumulate because recycling
                       re-derives coords each round)
  bf16 vs fp32 flax    mean 0.009 A / max 0.016 A per-atom pose delta
                       (full deployment cast: params + batch, matching
                       DockingEngine; see DESIGN.md "bf16 accuracy");
                       the assertion bounds the mean at < 0.75 A.

The one scale-dependent hazard found while building this: the pocket shape
bucket must cover the PREDICTED-center crop, which can keep more residues
than the GT-centered crop the collator sized for — overflow is counted
(out.pocket_overflow) and drops residues, which reads as coordinate
divergence if unchecked. Hence _pad_pocket_bucket + the overflow==0
precondition.
"""
from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from refshim import REF_BASE, base_args, load_ref_models, make_full_fixture

from fabind_tpu.config import preset
from fabind_tpu.data.types import FABindBatch
from fabind_tpu.models.fabind import make_model
from fabind_tpu.train.convert import convert_state_dict

pytestmark = pytest.mark.slow

HID, HIDP = 512, 128
LAYERS, PP_LAYERS, N_ITER = 4, 1, 8
SPECS = [{"n_lig": 5, "n_prot": 24}, {"n_lig": 7, "n_prot": 18}]
R = 8.0   # pocket radius scaled to the tiny synthetic complexes


def _torch_flagship():
    ref = load_ref_models(REF_BASE)
    args = base_args(
        coordinate_scale=5.0, stage_prob=0.25,
        mean_layers=LAYERS, n_iter=N_ITER,
        pocket_pred_layers=PP_LAYERS, pocket_pred_n_iter=1,
        inter_cutoff=10, intra_cutoff=8,
        use_esm2_feat=True, esm2_concat_raw=False,
        gs_tau=1.0, gs_hard=False, pocket_radius=R,
        center_dist_threshold=4.0, local_eval=False,
        train_pred_pocket_noise=0.0,
        compound_coords_init_mode="pocket_center_rdkit",
        distmap_pred="mlp")
    torch.manual_seed(5)
    m = ref.model.IaBNet_mean_and_pocket_prediction_cls_coords_dependent(
        args, embedding_channels=HID, pocket_pred_embedding_channels=HIDP)
    m.eval()
    return m


def _pad_pocket_bucket(fl, np_new: int):
    """Grow the pocket shape bucket: the fixture sizes Np to the GT-centered
    crop, but the stage-2 PREDICTED-center crop can keep more residues —
    with a too-small bucket the (designed, counted) pocket_overflow drops
    residues the torch reference keeps and parity is vacuously broken."""
    b, np_old = fl["pocket_idx"].shape
    idx = np.zeros((b, np_new), fl["pocket_idx"].dtype)
    msk = np.zeros((b, np_new), bool)
    idx[:, :np_old] = fl["pocket_idx"]
    msk[:, :np_old] = fl["pocket_mask"]
    return dict(fl, pocket_idx=idx, pocket_mask=msk)


@pytest.fixture(scope="module")
def setup_flagship():
    tm = _torch_flagship()
    Nr_bucket = max(s["n_prot"] for s in SPECS)
    mk = lambda: make_full_fixture(13, SPECS, esm_dim=1280, pocket_radius=R)
    _, fl, specs = mk()
    fl = _pad_pocket_bucket(fl, Nr_bucket)   # predicted crop can keep all
    Nc = fl["lig_mask"].shape[1]
    Npk = fl["pocket_mask"].shape[1]
    Nr = fl["prot_mask"].shape[1]
    cfg = preset(
        "fabind", hidden_size=HID, pocket_pred_hidden_size=HIDP,
        mean_layers=LAYERS, n_iter=N_ITER, pocket_pred_layers=PP_LAYERS,
        pocket_pred_n_iter=1, use_esm2_feat=True, pocket_radius=R,
        max_ligand=Nc, max_pocket=Npk, max_protein=Nr, bond_k=4,
        ctx_k=Npk, ctx_k_whole=Nr)
    batch = FABindBatch(**{k: jnp.asarray(v) for k, v in fl.items()})
    model = make_model(cfg)
    k = jax.random.PRNGKey(0)
    variables = jax.jit(lambda: model.init(
        {"params": k, "dropout": k, "sample": k}, batch, train=False,
        stage=1))()
    params, missing, unused = convert_state_dict(
        tm.state_dict(), variables["params"])
    assert not missing, f"unconverted flax leaves: {missing[:8]}"
    for key in unused:
        assert ".inter_layer." in key, f"unexpectedly unused torch key {key}"
    return tm, (lambda: mk()[0]), fl, specs, cfg, model, batch, params


def _per_sample(arr, batch_vec, b):
    return arr[np.asarray(batch_vec) == b]


def test_flagship_stage2_parity(setup_flagship):
    tm, make_data, fl, specs, cfg, model, batch, params = setup_flagship
    data = make_data()
    with torch.no_grad():
        (coords_out, compound_batch, y_pred, y_by, cls_pred, cls_true,
         *_rest, pred_center, dis_map, less5) = tm(data, stage=2,
                                                   train=False)

    out = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, train=False, stage=2))(params, batch)

    # precondition: the pocket bucket held the full predicted crop
    assert int(np.asarray(out.pocket_overflow).sum()) == 0
    np.testing.assert_allclose(np.asarray(out.pred_pocket_center),
                               pred_center.numpy(), atol=5e-4)
    for b, s in enumerate(specs):
        npr = s["n_prot"]
        np.testing.assert_allclose(
            np.asarray(out.pocket_cls_logits)[b, :npr],
            cls_pred.numpy()[b, :npr], atol=1e-3,
            err_msg=f"cls logits sample {b}")

    cb = compound_batch.numpy()
    coords_ref = coords_out.numpy()
    worst = 0.0
    for b, s in enumerate(specs):
        nl = s["n_lig"]
        d = np.abs(np.asarray(out.coords)[b, :nl]
                   - _per_sample(coords_ref, cb, b))
        worst = max(worst, float(d.max()))
        np.testing.assert_allclose(
            np.asarray(out.coords)[b, :nl], _per_sample(coords_ref, cb, b),
            atol=5e-3, err_msg=f"flagship stage2 coords sample {b}")
    print(f"\nflagship stage2 max coord drift vs torch: {worst:.2e} A")

    got_y = []
    pm = np.asarray(out.pair_valid)
    for b in range(len(specs)):
        nl = specs[b]["n_lig"]
        npk = int(pm[b].any(axis=1).sum())
        got_y.append(np.asarray(out.y_pred)[b, :npk, :nl].ravel())
    np.testing.assert_allclose(np.concatenate(got_y), y_pred.numpy(),
                               atol=2e-3)


def test_flagship_inference_parity(setup_flagship):
    tm, make_data, fl, specs, cfg, model, batch, params = setup_flagship
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
            atol=5e-3, err_msg=f"flagship inference coords sample {b}")


# ------------------------------------------------------------- FABind+
# Released plus regression config (test_regression_fabind.py:42): hidden 512
# / pocket-pred 128, mean_layers 5, n_iter 8, --use-ln-mlp --mlp-hidden-scale
# 1, dis_map_thres 15, pocket_radius_buffer 5, min_pocket_radius 20.
# use_ln_mlp=True disables the decomposed edge-MLP fast path
# (models/egnn.py) so a DIFFERENT code path — the fused LayerNormed edge
# MLPs — serves this config; this is the width-level parity evidence the
# toy-scale plus golden (test_golden_model.py, hidden 16) cannot give.
# At the fixture's tiny geometry min_pocket_radius=20 makes the crop keep
# every residue (degenerate crop); selective-crop behavior of the dynamic
# radius is covered at toy width — here the target is numeric drift at
# released width through the ln_mlp path across 8 recycles x 6 layers.
PLUS_LAYERS = 5
PLUS_BUF, PLUS_MINR = 5.0, 20.0


def _torch_flagship_plus():
    from refshim import REF_PLUS, load_ref_models, plus_args
    ref = load_ref_models(REF_PLUS)
    args = plus_args(
        coordinate_scale=5.0, stage_prob=0.5,
        mean_layers=PLUS_LAYERS, n_iter=N_ITER,
        pocket_pred_layers=PP_LAYERS, pocket_pred_n_iter=1,
        inter_cutoff=10, intra_cutoff=8,
        use_esm2_feat=True, esm2_concat_raw=False,
        gs_tau=1.0, gs_hard=False, pocket_radius=20.0,
        train_pred_pocket_noise=0.0,
        pocket_radius_buffer=PLUS_BUF, min_pocket_radius=PLUS_MINR,
        force_fix_radius=False, use_for_radius_pred="ligand",
        dis_map_thres=15.0, geom_reg_steps=1,
        confidence_training=False, stack_mlp=False, use_clustering=False)
    torch.manual_seed(7)
    m = ref.model.FABindPlus(args, embedding_channels=HID,
                             pocket_pred_embedding_channels=HIDP)
    m.eval()
    return m


@pytest.fixture(scope="module")
def setup_flagship_plus():
    tm = _torch_flagship_plus()
    Nr_bucket = max(s["n_prot"] for s in SPECS)
    mk = lambda: make_full_fixture(17, SPECS, esm_dim=1280,
                                   dis_map_clamp=15.0,
                                   pocket_radius_buffer=PLUS_BUF,
                                   min_pocket_radius=PLUS_MINR)
    _, fl, specs = mk()
    # min_pocket_radius=20 keeps every residue: the pocket bucket must hold
    # the whole protein or the (counted) overflow breaks parity vacuously
    fl = _pad_pocket_bucket(fl, Nr_bucket)
    Nc = fl["lig_mask"].shape[1]
    Npk = fl["pocket_mask"].shape[1]
    Nr = fl["prot_mask"].shape[1]
    cfg = preset(
        "fabind_plus", hidden_size=HID, pocket_pred_hidden_size=HIDP,
        mean_layers=PLUS_LAYERS, n_iter=N_ITER,
        pocket_pred_layers=PP_LAYERS, pocket_pred_n_iter=1,
        use_esm2_feat=True, pocket_radius=20.0,
        pocket_radius_buffer=PLUS_BUF, min_pocket_radius=PLUS_MINR,
        max_ligand=Nc, max_pocket=Npk, max_protein=Nr, bond_k=4,
        ctx_k=Npk, ctx_k_whole=Nr)
    batch = FABindBatch(**{k: jnp.asarray(v) for k, v in fl.items()})
    model = make_model(cfg)
    k = jax.random.PRNGKey(0)
    variables = jax.jit(lambda: model.init(
        {"params": k, "dropout": k, "sample": k}, batch, train=False,
        stage=1))()
    params, missing, unused = convert_state_dict(
        tm.state_dict(), variables["params"])
    assert not missing, f"unconverted flax leaves: {missing[:8]}"
    for key in unused:
        assert ".inter_layer." in key, f"unexpectedly unused torch key {key}"
    return tm, (lambda: mk()[0]), fl, specs, cfg, model, batch, params


def test_flagship_plus_stage1_parity(setup_flagship_plus):
    tm, make_data, fl, specs, cfg, model, batch, params = setup_flagship_plus
    data = make_data()
    with torch.no_grad():
        (coords_out, compound_batch, y_pred, y_by, cls_pred, cls_true,
         *_rest, dis_map, less5, radius_pred, center_bias) = tm(
             data, stage=1, train=False)

    out = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, train=False, stage=1))(params, batch)

    cb = compound_batch.numpy()
    coords_ref = coords_out.numpy()
    prc = np.asarray(fl["pocket_residue_center"])
    worst = 0.0
    for b, s in enumerate(specs):
        nl = s["n_lig"]
        d = np.abs(np.asarray(out.coords)[b, :nl]
                   - (_per_sample(coords_ref, cb, b) + prc[b]))
        worst = max(worst, float(d.max()))
        np.testing.assert_allclose(
            np.asarray(out.coords)[b, :nl],
            _per_sample(coords_ref, cb, b) + prc[b], atol=5e-3,
            err_msg=f"flagship plus stage1 coords sample {b}")
    print(f"\nflagship plus stage1 max coord drift vs torch: {worst:.2e} A")
    got_dm = []
    pm = np.asarray(out.pair_valid)
    for b in range(len(specs)):
        nl = specs[b]["n_lig"]
        npk = int(pm[b].any(axis=1).sum())
        got_dm.append(np.asarray(out.dis_map_target)[b, :npk, :nl].ravel())
    np.testing.assert_allclose(np.concatenate(got_dm), dis_map.numpy(),
                               atol=2e-3)


def test_flagship_plus_stage2_parity(setup_flagship_plus):
    tm, make_data, fl, specs, cfg, model, batch, params = setup_flagship_plus
    data = make_data()
    with torch.no_grad():
        (coords_out, compound_batch, y_pred, y_by, cls_pred, cls_true,
         prot_mask_w, prot_coords_w, pred_center, dis_map, less5,
         radius_pred, center_bias) = tm(data, stage=2, train=False)

    out = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, train=False, stage=2))(params, batch)

    assert int(np.asarray(out.pocket_overflow).sum()) == 0
    np.testing.assert_allclose(np.asarray(out.pred_pocket_center),
                               pred_center.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.pocket_radius_pred),
                               radius_pred.numpy()[:, 0], atol=5e-4)

    cb = compound_batch.numpy()
    coords_ref = coords_out.numpy()
    bias = center_bias.numpy()
    worst = 0.0
    for b, s in enumerate(specs):
        nl = s["n_lig"]
        d = np.abs(np.asarray(out.coords)[b, :nl]
                   - (_per_sample(coords_ref, cb, b) + bias[b]))
        worst = max(worst, float(d.max()))
        np.testing.assert_allclose(
            np.asarray(out.coords)[b, :nl],
            _per_sample(coords_ref, cb, b) + bias[b], atol=5e-3,
            err_msg=f"flagship plus stage2 coords sample {b}")
    print(f"\nflagship plus stage2 max coord drift vs torch: {worst:.2e} A")

    got_y = []
    pm = np.asarray(out.pair_valid)
    for b in range(len(specs)):
        nl = specs[b]["n_lig"]
        npk = int(pm[b].any(axis=1).sum())
        got_y.append(np.asarray(out.y_pred)[b, :npk, :nl].ravel())
    np.testing.assert_allclose(np.concatenate(got_y), y_pred.numpy(),
                               atol=2e-3)


def test_flagship_plus_inference_parity(setup_flagship_plus):
    tm, make_data, fl, specs, cfg, model, batch, params = setup_flagship_plus
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
            atol=5e-3, err_msg=f"flagship plus inference coords sample {b}")


def test_bf16_accuracy_audit(setup_flagship):
    """bf16 is the serving/bench dtype; quantify its pose cost vs fp32 at
    the released width. Mirrors the deployment cast exactly (DockingEngine
    dock path: params AND batch floats to bf16, serve.py:129,227-228 — so
    activations genuinely compute in bf16, not fp32-promoted)."""
    tm, make_data, fl, specs, cfg, model, batch, params = setup_flagship

    run = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, method="inference")[0])
    coords32 = np.asarray(run(params, batch))
    p16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    from fabind_tpu.serve import _cast_batch_bf16
    b16 = _cast_batch_bf16(jax.tree_util.tree_map(jnp.asarray, batch))
    coords16 = np.asarray(jax.tree_util.tree_map(
        lambda x: x.astype(np.float32), run(p16, b16)))

    deltas = []
    for b, s in enumerate(specs):
        nl = s["n_lig"]
        d = np.linalg.norm(coords16[b, :nl] - coords32[b, :nl], axis=-1)
        deltas.append(d)
    allp = np.concatenate(deltas)
    print(f"\nbf16 vs fp32 pose delta (flagship, {len(allp)} atoms): "
          f"mean {allp.mean():.3f} A, max {allp.max():.3f} A")
    # recycling re-anchors coords each iteration, bounding bf16 drift; the
    # bound here is the documented deployment claim (DESIGN.md)
    assert allp.mean() < 0.75, f"bf16 mean pose delta {allp.mean():.3f} A"
    assert np.isfinite(coords16).all()
