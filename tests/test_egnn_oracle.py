"""Dense/top-K EGNN layers vs the numpy edge-list oracle."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fabind_tpu.config import preset
from fabind_tpu.models.egnn import EGCL, GraphInputs, InterAttention
from fabind_tpu.ops import graph as G
from tests import oracle

from tests.test_graph import brute_force_edges, make_inputs


def graph_inputs(layout, lig_mask, pkt_mask, bond_idx, bond_mask, Nc):
    B = lig_mask.shape[0]
    las_adj = np.zeros((B, Nc, Nc), bool)
    las_ref = np.zeros((B, Nc, 3), np.float32)
    return GraphInputs(
        lig_mask=jnp.asarray(lig_mask), pkt_mask=jnp.asarray(pkt_mask),
        bond_idx=jnp.asarray(bond_idx), bond_mask=jnp.asarray(bond_mask),
        las_adj=jnp.asarray(las_adj), las_ref=jnp.asarray(las_ref))


@pytest.mark.parametrize("variant", ["fabind", "fabind_plus"])
def test_egcl_matches_oracle(variant):
    cfg = preset(variant).model
    cfg = dataclasses.replace(cfg, dropout=0.0)
    layout, x, lig_mask, pkt_mask, bond_idx, bond_mask = make_inputs(seed=3)
    B = x.shape[0]
    C = 16
    cutoff = 1.5
    coord_max = 2.0
    rng = np.random.RandomState(0)
    h = rng.randn(B, layout.n_nodes, C).astype(np.float32)

    gi = graph_inputs(layout, lig_mask, pkt_mask, bond_idx, bond_mask,
                      layout.n_lig)
    ctx = G.build_ctx_graph(jnp.asarray(x), layout, gi.lig_mask, gi.pkt_mask,
                            gi.bond_idx, gi.bond_mask, cutoff, k_radius=12)
    layer = EGCL(cfg, C, coord_max)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(h), jnp.asarray(x),
                        ctx, gi)["params"]
    h_out, x_out = layer.apply({"params": params}, jnp.asarray(h),
                               jnp.asarray(x), ctx, gi)
    h_out, x_out = np.asarray(h_out), np.asarray(x_out)

    edges = brute_force_edges(layout, x, lig_mask, pkt_mask, bond_idx,
                              bond_mask, cutoff)
    node_mask = np.asarray(gi.node_mask())
    for b in range(B):
        h_ref, x_ref = oracle.egcl_forward(
            jax.tree_util.tree_map(np.asarray, params), cfg, h[b], x[b],
            sorted(edges[b]), coord_max)
        np.testing.assert_allclose(h_out[b][node_mask[b]],
                                   h_ref[node_mask[b]], atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(x_out[b][node_mask[b]],
                                   x_ref[node_mask[b]], atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("variant", ["fabind", "fabind_plus"])
def test_inter_attention_core_matches_oracle(variant):
    """Attention core without the trio encoder (add_attn_pair_bias=False)."""
    cfg = preset(variant).model
    cfg = dataclasses.replace(cfg, dropout=0.0, add_attn_pair_bias=False,
                              add_cross_attn_layer=False,
                              explicit_pair_embed=False)
    layout, x, lig_mask, pkt_mask, bond_idx, bond_mask = make_inputs(seed=5)
    B = x.shape[0]
    C = 16
    cutoff = 1.8
    coord_max = 2.0
    rng = np.random.RandomState(1)
    h = rng.randn(B, layout.n_nodes, C).astype(np.float32)

    gi = graph_inputs(layout, lig_mask, pkt_mask, bond_idx, bond_mask,
                      layout.n_lig)
    adj = G.build_inter_graph(jnp.asarray(x), layout, gi.lig_mask, gi.pkt_mask,
                              cutoff).adj
    layer = InterAttention(cfg, C, coord_max)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(h), jnp.asarray(x),
                        adj, gi, None, None)["params"]
    h_out, x_out, _ = layer.apply({"params": params}, jnp.asarray(h),
                                  jnp.asarray(x), adj, gi, None, None)
    h_out, x_out = np.asarray(h_out), np.asarray(x_out)

    # brute-force inter edges, both directions (att_model.py:82-84)
    Nc = layout.n_lig
    node_mask = np.asarray(gi.node_mask())
    for b in range(B):
        edges = []
        for i in range(layout.n_lig):
            for j in range(layout.n_pkt):
                if not (lig_mask[b, i] and pkt_mask[b, j]):
                    continue
                d = np.linalg.norm(x[b, 1 + i] - x[b, Nc + 2 + j])
                if d <= cutoff:
                    edges.append((1 + i, Nc + 2 + j))
                    edges.append((Nc + 2 + j, 1 + i))
        assert edges, "test setup produced no inter edges"
        h_ref, x_ref = oracle.inter_attention_core(
            jax.tree_util.tree_map(np.asarray, params), cfg, h[b], x[b],
            edges, coord_max)
        np.testing.assert_allclose(h_out[b][node_mask[b]],
                                   h_ref[node_mask[b]], atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(x_out[b][node_mask[b]],
                                   x_ref[node_mask[b]], atol=2e-4, rtol=1e-3)


def test_las_projection_matches_oracle():
    from fabind_tpu.ops.geometry import las_projection_step
    rng = np.random.RandomState(2)
    B, Nc = 2, 7
    x = rng.randn(B, Nc, 3).astype(np.float32)
    ref = rng.randn(B, Nc, 3).astype(np.float32)
    adj = rng.rand(B, Nc, Nc) < 0.3
    adj = adj | adj.transpose(0, 2, 1)
    adj &= ~np.eye(Nc, dtype=bool)[None]
    out = np.asarray(las_projection_step(
        jnp.asarray(x), jnp.asarray(ref), jnp.asarray(adj), 0.001, 3.0,
        steps=2))
    for b in range(B):
        ref_b = oracle.las_step(x[b], ref[b], adj[b], 0.001, 3.0, steps=2)
        np.testing.assert_allclose(out[b], ref_b, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("variant", ["fabind", "fabind_plus"])
def test_inter_attention_full_matches_oracle(variant):
    """Full MC_Att_L with trio encoder (cross attention + pair-bias gather)."""
    cfg = preset(variant).model
    cfg = dataclasses.replace(cfg, dropout=0.0)
    assert cfg.rm_layernorm and cfg.add_attn_pair_bias and cfg.add_cross_attn_layer
    layout, x, lig_mask, pkt_mask, bond_idx, bond_mask = make_inputs(seed=7)
    B = x.shape[0]
    C = 16
    cutoff = 1.8
    coord_max = 2.0
    rng = np.random.RandomState(2)
    h = rng.randn(B, layout.n_nodes, C).astype(np.float32)
    Nc, Np = layout.n_lig, layout.n_pkt
    pair = rng.randn(B, Np + 1, Nc + 1, C).astype(np.float32)
    ones = np.ones((B, 1), bool)
    pair_mask = np.einsum("bi,bj->bij",
                          np.concatenate([ones, pkt_mask], 1),
                          np.concatenate([ones, lig_mask], 1))
    pair = pair * pair_mask[..., None]

    gi = graph_inputs(layout, lig_mask, pkt_mask, bond_idx, bond_mask, Nc)
    adj = G.build_inter_graph(jnp.asarray(x), layout, gi.lig_mask, gi.pkt_mask,
                              cutoff).adj
    layer = InterAttention(cfg, C, coord_max)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(h), jnp.asarray(x),
                        adj, gi, jnp.asarray(pair), jnp.asarray(pair_mask))["params"]
    h_out, x_out, pair_out = layer.apply(
        {"params": params}, jnp.asarray(h), jnp.asarray(x), adj, gi,
        jnp.asarray(pair), jnp.asarray(pair_mask))
    h_out, x_out, pair_out = map(np.asarray, (h_out, x_out, pair_out))

    node_mask = np.asarray(gi.node_mask())
    np_params = jax.tree_util.tree_map(np.asarray, params)
    for b in range(B):
        edges = []
        for i in range(Nc):
            for j in range(Np):
                if not (lig_mask[b, i] and pkt_mask[b, j]):
                    continue
                d = np.linalg.norm(x[b, 1 + i] - x[b, Nc + 2 + j])
                if d <= cutoff:
                    edges.append((1 + i, Nc + 2 + j))
                    edges.append((Nc + 2 + j, 1 + i))
        assert edges
        h_ref, x_ref, pair_ref = oracle.inter_attention_full(
            np_params, cfg, h[b], x[b], edges, coord_max, lig_mask[b],
            pkt_mask[b], pair[b], pair_mask[b], Nc)
        nm = node_mask[b]
        np.testing.assert_allclose(h_out[b][nm], h_ref[nm], atol=5e-4, rtol=2e-3)
        np.testing.assert_allclose(x_out[b][nm], x_ref[nm], atol=5e-4, rtol=2e-3)
        pm = pair_mask[b].astype(bool)
        np.testing.assert_allclose(pair_out[b][pm], pair_ref[pm], atol=5e-4,
                                   rtol=2e-3)
