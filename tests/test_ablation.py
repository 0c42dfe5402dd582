"""Golden-parity tests for the EGNN ablation stacks vs the real torch
reference (MCnoAttEGNN / MCnoAttwithCrossAttEGNN, selected via
args.ablation_no_attention* in att_model.py:139-150), plus unit tests for
the FABind+ attention distance-pair bias and GaussianLayer
(model_utils.py:109-146,338-356)."""
from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from refshim import (REF_BASE, base_args, load_ref_models,
                     make_complex_inputs, split_flat)

from fabind_tpu.config import preset
from fabind_tpu.models.att_model import EfficientMCAttModel
from fabind_tpu.models.egnn import GraphInputs
from fabind_tpu.train.convert import convert_state_dict

HID = 16
SPECS = [{"n_lig": 5, "n_pkt": 8}, {"n_lig": 7, "n_pkt": 6}]
CS = 5.0


def _run_ablation(flag: str, n_layers: int = 2, n_iter: int = 2,
                  atol: float = 2e-4, pass_las_mask: bool = False):
    ref = load_ref_models(REF_BASE)
    args = base_args(**{flag: True})
    torch.manual_seed(0)
    tm = ref.att_model.EfficientMCAttModel(
        args, HID, HID, n_channel=1, n_edge_feats=0, n_layers=n_layers,
        dropout=0.1, n_iter=n_iter, inter_cutoff=10, intra_cutoff=8,
        normalize_coord=lambda x: x / CS, unnormalize_coord=lambda x: x * CS)
    tm.eval()

    torch_in, flax_in, specs = make_complex_inputs(0, SPECS, HID, CS)
    extra = {}
    if pass_las_mask:
        # the reference's drivers always pass LAS_mask=None (model.py:129),
        # which crashes its own keep_trig branch — feed the dense
        # glb-padded LAS adjacency both sides use
        nmax = 1 + max(s["n_lig"] for s in specs)
        M = np.zeros((len(specs), nmax, nmax), bool)
        for b, s in enumerate(specs):
            nl = s["n_lig"]
            M[b, 1:1 + nl, 1:1 + nl] = np.asarray(
                flax_in["las_adj"])[b, :nl, :nl]
        extra["LAS_mask"] = torch.from_numpy(M)
    with torch.no_grad():
        X, H = tm(
            torch_in["X"].clone(), torch_in["H"].clone(),
            batch_id=torch_in["batch_id"], segment_id=torch_in["segment_id"],
            mask=torch_in["mask"], is_global=torch_in["is_global"],
            compound_edge_index=torch_in["compound_edge_index"],
            LAS_edge_index=torch_in["LAS_edge_index"],
            batched_complex_coord_LAS=torch_in["batched_complex_coord_LAS"].clone(),
            **extra)
    x_ref = X[:, 0].numpy()
    h_ref = H.numpy()

    cfg = preset("fabind", hidden_size=HID, pocket_pred_hidden_size=HID,
                 **{flag: True}).model
    Np = flax_in["pkt_mask"].shape[1]
    fm = EfficientMCAttModel(cfg, HID, HID, n_layers=n_layers, n_iter=n_iter,
                             ctx_k=Np)
    gi = GraphInputs(
        lig_mask=jnp.asarray(flax_in["lig_mask"]),
        pkt_mask=jnp.asarray(flax_in["pkt_mask"]),
        bond_idx=jnp.asarray(flax_in["bond_idx"]),
        bond_mask=jnp.asarray(flax_in["bond_mask"]),
        las_adj=jnp.asarray(flax_in["las_adj"]),
        las_ref=jnp.asarray(flax_in["las_ref"]))
    x0 = jnp.asarray(flax_in["x"])
    h0 = jnp.asarray(flax_in["h"])
    k = jax.random.PRNGKey(0)
    variables = jax.jit(lambda: fm.init(
        {"params": k, "dropout": k, "sample": k}, x0, h0, gi,
        deterministic=True))()
    params, missing, unused = convert_state_dict(
        tm.state_dict(), variables["params"])
    assert not missing, f"unconverted flax leaves: {missing[:8]}"
    # with add_cross_attn_layer on, the reference's stack-level inter_layer
    # is dead (egnn.py:638-643 only runs it when add_cross_attn_layer is
    # off); triangle_block_column is created but never called — the
    # reference forward applies triangle_block_row to both orientations
    # (cross_att.py:31-36)
    for key in unused:
        # .rbf.offset is a registered buffer (a deterministic linspace the
        # flax GaussianSmearing recomputes statically), not a parameter
        assert (".inter_layer." in key
                or ".triangle_block_column." in key
                or key.endswith(".rbf.offset")), \
            f"unexpectedly unused torch key {key}"

    x_out, h_out, _ = jax.jit(
        lambda p, x, h: fm.apply({"params": p}, x, h, gi, deterministic=True)
    )(params, x0, h0)
    x_out = np.asarray(x_out)
    h_out = np.asarray(h_out)

    Nc = flax_in["lig_mask"].shape[1]
    for part in ("lig", "pkt", "glb"):
        ref_parts = split_flat(x_ref, specs, part)
        ref_h_parts = split_flat(h_ref, specs, part)
        for b, s in enumerate(specs):
            nl, npk = s["n_lig"], s["n_pkt"]
            if part == "lig":
                got_x, got_h = x_out[b, 1:1 + nl], h_out[b, 1:1 + nl]
            elif part == "pkt":
                got_x = x_out[b, Nc + 2:Nc + 2 + npk]
                got_h = h_out[b, Nc + 2:Nc + 2 + npk]
            else:
                got_x, got_h = x_out[b, [0, Nc + 1]], h_out[b, [0, Nc + 1]]
            np.testing.assert_allclose(
                got_x, ref_parts[b], atol=atol,
                err_msg=f"{flag} coords diverge ({part}, sample {b})")
            np.testing.assert_allclose(
                got_h, ref_h_parts[b], atol=atol * 10,
                err_msg=f"{flag} h diverges ({part}, sample {b})")


def test_golden_keep_trig_attn():
    """Triangle attention over pair rows + RBF distance embeddings
    (cross_att.py:24-36, att_model.py:166-193), golden vs the real torch
    modules."""
    _run_ablation("keep_trig_attn", pass_las_mask=True, atol=5e-4)


def test_golden_ablation_no_attention():
    _run_ablation("ablation_no_attention")


def test_golden_ablation_no_attention_with_cross_attn():
    _run_ablation("ablation_no_attention_with_cross_attn")


def test_attention_distance_pair_bias():
    """dis_pair_type add/mul vs the reference _attention math
    (model_utils.py:109-146)."""
    from fabind_tpu.models.layers import Attention

    rng = np.random.default_rng(0)
    B, Q, K, H, D = 2, 4, 6, 2, 8
    qx = jnp.asarray(rng.normal(0, 1, (B, Q, 16)).astype(np.float32))
    kx = jnp.asarray(rng.normal(0, 1, (B, K, 16)).astype(np.float32))
    dist = jnp.asarray(rng.normal(0, 1, (B, Q, K, H)).astype(np.float32))
    m = Attention(c_hidden=D, no_heads=H)
    p = m.init(jax.random.PRNGKey(0), qx, kx)

    base = m.apply(p, qx, kx)
    add = m.apply(p, qx, kx, distance=dist, dis_pair_type="add")
    mul = m.apply(p, qx, kx, distance=dist, dis_pair_type="mul")
    assert not np.allclose(base, add)
    assert not np.allclose(base, mul)
    # add with zero distance is a no-op; mul with ones is a no-op
    np.testing.assert_allclose(
        base, m.apply(p, qx, kx, distance=jnp.zeros_like(dist),
                      dis_pair_type="add"), atol=1e-6)
    np.testing.assert_allclose(
        base, m.apply(p, qx, kx, distance=jnp.ones_like(dist),
                      dis_pair_type="mul"), atol=1e-6)


def test_gaussian_layer_matches_reference_math():
    """GaussianLayer pdf (model_utils.py:338-356)."""
    from fabind_tpu.models.layers import GaussianLayer

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 5, (3, 4, 5, 1)).astype(np.float32))
    m = GaussianLayer(K=16)
    p = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(p, x))
    mean = np.asarray(p["params"]["means"]).reshape(-1)
    std = np.abs(np.asarray(p["params"]["stds"]).reshape(-1)) + 1e-2
    ref = (np.exp(-0.5 * ((np.asarray(x) - mean) / std) ** 2)
           / (np.sqrt(2 * 3.14159) * std))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-30)
    assert out.shape == (3, 4, 5, 16)
