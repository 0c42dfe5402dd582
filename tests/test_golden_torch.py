"""Golden-parity tests: flax modules vs the REAL reference torch modules.

The reference code at /root/reference is executed in place (with pure-torch
shims for torch_scatter / torch_geometric, tests/refshim.py) as the oracle;
weights flow through the real torch `state_dict()` naming via
fabind_tpu.train.convert, so these tests pin down both the module math and
the converter mapping. fp32, atol 2e-4 after two recycles of a 2-layer stack.
"""
from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from refshim import (REF_BASE, REF_PLUS, base_args, plus_args,
                     load_ref_models, make_complex_inputs, split_flat)

from fabind_tpu.config import preset
from fabind_tpu.models.att_model import EfficientMCAttModel
from fabind_tpu.models.cross_att import CrossAttentionModule
from fabind_tpu.models.egnn import GraphInputs
from fabind_tpu.train.convert import convert_state_dict

HID = 16
SPECS = [{"n_lig": 5, "n_pkt": 8}, {"n_lig": 7, "n_pkt": 6}]
CS = 5.0  # coordinate_scale


def _flax_cfg(variant: str):
    name = "fabind" if variant == "base" else "fabind_plus"
    cfg = preset(name, hidden_size=HID, pocket_pred_hidden_size=HID).model
    return cfg


def _torch_wrapper(variant: str, n_layers: int, n_iter: int):
    if variant == "base":
        ref = load_ref_models(REF_BASE)
        args = base_args()
        kw = {}
    else:
        ref = load_ref_models(REF_PLUS)
        args = plus_args()
        kw = {}
    torch.manual_seed(0)
    m = ref.att_model.EfficientMCAttModel(
        args, HID, HID, n_channel=1, n_edge_feats=0, n_layers=n_layers,
        dropout=0.1, n_iter=n_iter, inter_cutoff=10, intra_cutoff=8,
        normalize_coord=lambda x: x / CS, unnormalize_coord=lambda x: x * CS,
        **kw)
    m.eval()
    return m


def _run_pair(variant: str, n_layers: int = 2, n_iter: int = 2,
              atol: float = 2e-4):
    tm = _torch_wrapper(variant, n_layers, n_iter)
    torch_in, flax_in, specs = make_complex_inputs(0, SPECS, HID, CS)

    with torch.no_grad():
        X, H, *rest = _call_torch(tm, torch_in, variant)
    x_ref = X[:, 0].numpy()
    h_ref = H.numpy()

    cfg = _flax_cfg(variant)
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
    # the reference creates a dead inter_layer inside MC_Att_L whenever
    # add_attn_pair_bias and add_cross_attn_layer are both on (egnn.py:181)
    for key in unused:
        assert ".inter_layer." in key, f"unexpectedly unused torch key {key}"

    x_out, h_out, _ = jax.jit(
        lambda p, x, h: fm.apply({"params": p}, x, h, gi, deterministic=True)
    )(params, x0, h0)
    x_out = np.asarray(x_out)
    h_out = np.asarray(h_out)

    for part in ("lig", "pkt", "glb"):
        ref_parts = split_flat(x_ref, specs, part)
        ref_h_parts = split_flat(h_ref, specs, part)
        for b, s in enumerate(specs):
            nl = s["n_lig"]
            npk = s["n_pkt"]
            Nc = flax_in["lig_mask"].shape[1]
            if part == "lig":
                got_x = x_out[b, 1:1 + nl]
                got_h = h_out[b, 1:1 + nl]
            elif part == "pkt":
                got_x = x_out[b, Nc + 2:Nc + 2 + npk]
                got_h = h_out[b, Nc + 2:Nc + 2 + npk]
            else:
                got_x = x_out[b, [0, Nc + 1]]
                got_h = h_out[b, [0, Nc + 1]]
            np.testing.assert_allclose(
                got_x, ref_parts[b], atol=atol,
                err_msg=f"{variant} coords diverge ({part}, sample {b})")
            np.testing.assert_allclose(
                got_h, ref_h_parts[b], atol=atol * 10,
                err_msg=f"{variant} h diverges ({part}, sample {b})")


def _call_torch(tm, torch_in, variant):
    return tm(
        torch_in["X"].clone(), torch_in["H"].clone(),
        batch_id=torch_in["batch_id"], segment_id=torch_in["segment_id"],
        mask=torch_in["mask"], is_global=torch_in["is_global"],
        compound_edge_index=torch_in["compound_edge_index"],
        LAS_edge_index=torch_in["LAS_edge_index"],
        batched_complex_coord_LAS=torch_in["batched_complex_coord_LAS"].clone())


def test_golden_efficient_mcatt_base():
    _run_pair("base")


def test_golden_efficient_mcatt_plus():
    _run_pair("plus")


def test_golden_cross_attention_base():
    """CrossAttentionModule standalone vs the real torch module."""
    ref = load_ref_models(REF_BASE)
    torch.manual_seed(1)
    tm = ref.cross_att.CrossAttentionModule(
        node_hidden_dim=HID, pair_hidden_dim=HID, rm_layernorm=True,
        keep_trig_attn=False, dist_hidden_dim=HID,
        normalize_coord=lambda x: x / CS)
    tm.eval()

    rng = np.random.default_rng(2)
    B, P, C = 2, 6, 5
    p = rng.normal(0, 1, (B, P, HID)).astype(np.float32)
    c = rng.normal(0, 1, (B, C, HID)).astype(np.float32)
    pair = rng.normal(0, 1, (B, P, C, HID)).astype(np.float32)
    p_mask = np.ones((B, P), bool)
    c_mask = np.ones((B, C), bool)
    p_mask[1, 4:] = False
    c_mask[1, 3:] = False
    pair_mask = p_mask[:, :, None] & c_mask[:, None, :]
    pair = pair * pair_mask[..., None]
    p = p * p_mask[..., None]
    c = c * c_mask[..., None]

    with torch.no_grad():
        tp, tc, tpair = tm(torch.from_numpy(p), torch.from_numpy(p_mask),
                           torch.from_numpy(c), torch.from_numpy(c_mask),
                           torch.from_numpy(pair),
                           torch.from_numpy(pair_mask))

    fm = CrossAttentionModule(rm_layernorm=True, keep_trig_attn=False,
                              dropout_rate=0.1)
    k = jax.random.PRNGKey(0)
    variables = fm.init({"params": k, "dropout": k}, jnp.asarray(p),
                        jnp.asarray(p_mask), jnp.asarray(c),
                        jnp.asarray(c_mask), jnp.asarray(pair),
                        jnp.asarray(pair_mask), deterministic=True)
    params, missing, unused = convert_state_dict(
        tm.state_dict(), variables["params"])
    assert not missing, missing
    assert not unused, unused
    fp, fc, fpair = fm.apply({"params": params}, jnp.asarray(p),
                             jnp.asarray(p_mask), jnp.asarray(c),
                             jnp.asarray(c_mask), jnp.asarray(pair),
                             jnp.asarray(pair_mask), deterministic=True)
    # compare only valid rows/cells (masked-out cells differ: the reference
    # leaves stale values where we zero)
    pm = p_mask[..., None]
    cm = c_mask[..., None]
    zm = pair_mask[..., None]
    np.testing.assert_allclose(np.asarray(fp) * pm, tp.numpy() * pm, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fc) * cm, tc.numpy() * cm, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fpair) * zm, tpair.numpy() * zm,
                               atol=1e-5)


def test_golden_cross_attention_with_layernorm():
    """rm_layernorm=False variant vs torch: the reference REASSIGNS the
    embeddings to their layernorm before the residual add
    (cross_att.py:120-122,128), so the residual base is the NORMALIZED
    value — a port that keeps the raw input as the residual base diverges
    in every cross-attention block (round-2 review finding)."""
    ref = load_ref_models(REF_BASE)
    torch.manual_seed(3)
    tm = ref.cross_att.CrossAttentionModule(
        node_hidden_dim=HID, pair_hidden_dim=HID, rm_layernorm=False,
        keep_trig_attn=False, dist_hidden_dim=HID,
        normalize_coord=lambda x: x / CS)
    tm.eval()

    rng = np.random.default_rng(4)
    B, P, C = 2, 6, 5
    p = rng.normal(0, 1, (B, P, HID)).astype(np.float32)
    c = rng.normal(0, 1, (B, C, HID)).astype(np.float32)
    pair = rng.normal(0, 1, (B, P, C, HID)).astype(np.float32)
    p_mask = np.ones((B, P), bool)
    c_mask = np.ones((B, C), bool)
    p_mask[1, 4:] = False
    c_mask[1, 3:] = False
    pair_mask = p_mask[:, :, None] & c_mask[:, None, :]
    pair = pair * pair_mask[..., None]
    p = p * p_mask[..., None]
    c = c * c_mask[..., None]

    with torch.no_grad():
        tp, tc, tpair = tm(torch.from_numpy(p), torch.from_numpy(p_mask),
                           torch.from_numpy(c), torch.from_numpy(c_mask),
                           torch.from_numpy(pair),
                           torch.from_numpy(pair_mask))

    fm = CrossAttentionModule(rm_layernorm=False, keep_trig_attn=False,
                              dropout_rate=0.1)
    k = jax.random.PRNGKey(0)
    variables = fm.init({"params": k, "dropout": k}, jnp.asarray(p),
                        jnp.asarray(p_mask), jnp.asarray(c),
                        jnp.asarray(c_mask), jnp.asarray(pair),
                        jnp.asarray(pair_mask), deterministic=True)
    params, missing, unused = convert_state_dict(
        tm.state_dict(), variables["params"])
    assert not missing, missing
    assert not unused, unused
    fp, fc, fpair = fm.apply({"params": params}, jnp.asarray(p),
                             jnp.asarray(p_mask), jnp.asarray(c),
                             jnp.asarray(c_mask), jnp.asarray(pair),
                             jnp.asarray(pair_mask), deterministic=True)
    pm = p_mask[..., None]
    cm = c_mask[..., None]
    zm = pair_mask[..., None]
    np.testing.assert_allclose(np.asarray(fp) * pm, tp.numpy() * pm,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fc) * cm, tc.numpy() * cm,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fpair) * zm, tpair.numpy() * zm,
                               atol=1e-5)
