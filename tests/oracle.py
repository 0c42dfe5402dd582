"""Pure-numpy oracle implementing the reference's *edge-list* EGNN semantics.

Written independently from first principles (following the behavior of
FABind/fabind/models/egnn.py) as loops over explicit directed edge lists, it
validates the dense/top-K reformulation in fabind_tpu.models.egnn with shared
parameters. Deliberately slow and simple.
"""
from __future__ import annotations

import numpy as np
from scipy.special import softmax as sp_softmax


def silu(x):
    return x / (1.0 + np.exp(-x))


def relu(x):
    return np.maximum(x, 0.0)


def layernorm(x, gamma, beta, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * gamma + beta


class MLP:
    """Mirror of fabind_tpu.models.layers.MLPBlock (deterministic)."""

    def __init__(self, params, act="silu", use_ln=False, last_act=False):
        self.p = params
        self.act = silu if act == "silu" else relu
        self.use_ln = use_ln
        self.last_act = last_act

    def __call__(self, x):
        if self.use_ln:
            ln = self.p["layernorm"]
            x = layernorm(x, np.asarray(ln["scale"]), np.asarray(ln["bias"]))
        l1 = self.p["linear1"]
        x = self.act(x @ np.asarray(l1["kernel"]) + np.asarray(l1["bias"]))
        l2 = self.p["linear2"]
        x = x @ np.asarray(l2["kernel"])
        if "bias" in l2:
            x = x + np.asarray(l2["bias"])
        if self.last_act:
            x = self.act(x)
        return x


def dense(params, x):
    out = x @ np.asarray(params["kernel"])
    if "bias" in params:
        out = out + np.asarray(params["bias"])
    return out


def per_sample_norm(radials):
    """sqrt(sum r^2) over a sample's edge set (egnn.py:772-779)."""
    s = float(np.sqrt(np.sum(np.square(radials))))
    return s if s != 0 else 1.0


def egcl_forward(params, cfg, h, x, edges, coord_max):
    """Reference MC_E_GCL (egnn.py:68-144) over one sample's edge list.

    h: [N, C]; x: [N, 3]; edges: list of (dst, src) directed pairs.
    """
    is_plus = cfg.is_plus
    act = "relu" if is_plus else "silu"
    edge_mlp = MLP(params["edge_mlp"], act, is_plus and cfg.use_ln_mlp, True)
    node_mlp = MLP(params["node_mlp"], act, is_plus and cfg.use_ln_mlp, is_plus)
    coord_mlp = MLP(params["coord_mlp"], act, is_plus and cfg.use_ln_mlp, False)

    edges = list(edges)
    r_raw = np.array([np.sum((x[d] - x[s]) ** 2) for d, s in edges])
    div = per_sample_norm(r_raw) if cfg.norm_type == "per_sample" else 1.0
    r = r_raw / div

    msgs = {}
    for e, (d, s) in enumerate(edges):
        feat = np.concatenate([h[d], h[s], [r[e]]])
        msgs[e] = edge_mlp(feat)

    N = h.shape[0]
    x_out = x.copy()
    for i in range(N):
        inc = [e for e, (d, s) in enumerate(edges) if d == i]
        if inc:
            trans = np.mean(
                [(x[i] - x[edges[e][1]]) * coord_mlp(msgs[e]) for e in inc],
                axis=0)
            x_out[i] = x[i] + np.clip(trans, -coord_max, coord_max)
    h_out = h.copy()
    for i in range(N):
        inc = [e for e, (d, s) in enumerate(edges) if d == i]
        agg = (np.sum([msgs[e] for e in inc], axis=0)
               if inc else np.zeros(msgs[0].shape if msgs else h.shape[-1]))
        h_out[i] = h[i] + node_mlp(np.concatenate([h[i], agg]))
    return h_out, x_out


def inter_attention_core(params, cfg, h, x, edges, coord_max, bias=None):
    """Reference MC_Att_L attention core (egnn.py:186-252) over one sample's
    inter edge list, *excluding* the trio encoder (tested separately).

    bias: dict (d, s) -> scalar attention bias, or None.
    """
    is_plus = cfg.is_plus
    act = "relu" if is_plus else "silu"
    coord_mlp = MLP(params["coord_mlp"], act, is_plus and cfg.use_ln_mlp, False)
    Wq = params["linear_q"]
    kv_kernel = np.asarray(params["linear_kv_kernel"])
    kv_bias = np.asarray(params["linear_kv_bias"])

    edges = list(edges)
    r_raw = np.array([np.sum((x[d] - x[s]) ** 2) for d, s in edges])
    div = per_sample_norm(r_raw) if cfg.norm_type == "per_sample" else 1.0
    r = r_raw / div

    alphas = np.zeros(len(edges))
    vs = {}
    for e, (d, s) in enumerate(edges):
        q = dense(Wq, h[d])
        kv = np.concatenate([[r[e]], h[s]]) @ kv_kernel + kv_bias
        k, v = kv[0::2], kv[1::2]
        vs[e] = v
        alphas[e] = np.dot(q, k) + (bias[(d, s)] if bias else 0.0)

    # scatter_softmax per destination (egnn.py:221)
    att = np.zeros(len(edges))
    N = h.shape[0]
    for i in range(N):
        inc = [e for e, (d, s) in enumerate(edges) if d == i]
        if inc:
            att[inc] = sp_softmax(alphas[inc])

    h_out = h.copy()
    x_out = x.copy()
    for i in range(N):
        inc = [e for e, (d, s) in enumerate(edges) if d == i]
        if not inc:
            continue
        h_out[i] = h[i] + np.sum([att[e] * vs[e] for e in inc], axis=0)
        trans = np.sum(
            [att[e] * coord_mlp(vs[e]) * (x[i] - x[edges[e][1]]) for e in inc],
            axis=0)
        x_out[i] = x[i] + np.clip(trans, -coord_max, coord_max)
    return h_out, x_out


def las_step(x, ref, adj, step_size, clamp, steps=1):
    """Reference LAS projected-gradient step (egnn.py:436-448)."""
    x = x.copy()
    n = x.shape[0]
    ref_d2 = np.sum((ref[:, None] - ref[None, :]) ** 2, -1)
    for _ in range(steps):
        delta = np.zeros_like(x)
        for i in range(n):
            for j in range(n):
                if adj[i, j]:
                    dv = x[i] - x[j]
                    cur = np.sum(dv * dv)
                    force = 2 * (cur - ref_d2[i, j]) * 2 * dv
                    delta[j] += force
        x = x + np.clip(delta * step_size, -clamp, clamp)
    return x


# ---------------------------------------------------------------- cross attn

def gated_mha(p, q_x, kv_x, biases, c_hidden=32, heads=4):
    """OpenFold-style gated MHA (model_utils.py:21-159). q_x [I,C], kv_x
    [J,C], biases broadcastable to [H, I, J]."""
    q = q_x @ np.asarray(p["linear_q"]["kernel"])
    k = kv_x @ np.asarray(p["linear_k"]["kernel"])
    v = kv_x @ np.asarray(p["linear_v"]["kernel"])
    I, J = q_x.shape[0], kv_x.shape[0]
    q = q.reshape(I, heads, c_hidden) / np.sqrt(c_hidden)
    k = k.reshape(J, heads, c_hidden)
    v = v.reshape(J, heads, c_hidden)
    a = np.einsum("ihd,jhd->hij", q, k)
    for b in biases:
        a = a + b
    a = sp_softmax(a, axis=-1)
    o = np.einsum("hij,jhd->ihd", a, v)
    g = 1.0 / (1.0 + np.exp(-(q_x @ np.asarray(p["linear_g"]["kernel"])
                              + np.asarray(p["linear_g"]["bias"]))))
    o = o * g.reshape(I, heads, c_hidden)
    o = o.reshape(I, heads * c_hidden)
    return o @ np.asarray(p["linear_o"]["kernel"]) + np.asarray(
        p["linear_o"]["bias"])


def transition(p, x):
    """Base: no-layernorm Transition (rm_layernorm=True released configs).
    FABind+: MLPwithLastAct (LN -> linear1 -> relu -> linear2 -> relu;
    FABind_plus/fabind/models/model_utils.py:31-53, used for the cross-attn
    transitions, plus cross_att.py:15-17)."""
    if "linear_1" in p:
        h = x @ np.asarray(p["linear_1"]["kernel"]) + np.asarray(
            p["linear_1"]["bias"])
        return relu(h) @ np.asarray(p["linear_2"]["kernel"]) + np.asarray(
            p["linear_2"]["bias"])
    if "layernorm" in p:
        ln = p["layernorm"]
        x = layernorm(x, np.asarray(ln["scale"]), np.asarray(ln["bias"]),
                      eps=1e-5)
    h = relu(x @ np.asarray(p["linear1"]["kernel"]) + np.asarray(
        p["linear1"]["bias"]))
    return relu(h @ np.asarray(p["linear2"]["kernel"]) + np.asarray(
        p["linear2"]["bias"]))


def interaction(p, p_embed, c_embed, p_mask, c_mask):
    """InteractionModule, rm_layernorm, opm=False (model_utils.py:200-223)."""
    pe = p_embed @ np.asarray(p["linear_p"]["kernel"]) + np.asarray(
        p["linear_p"]["bias"])
    ce = c_embed @ np.asarray(p["linear_c"]["kernel"]) + np.asarray(
        p["linear_c"]["bias"])
    z = np.einsum("ik,jk->ijk", pe, ce)
    z = z @ np.asarray(p["linear_out"]["kernel"]) + np.asarray(
        p["linear_out"]["bias"])
    mask = np.einsum("i,j->ij", p_mask, c_mask)
    return z * mask[..., None], mask


INF = 1e9


def row_attention_block(p, node_i, node_j, pair, pair_mask, mask_i):
    """cross_att.py:95-134 (rm_layernorm)."""
    mask_bias = (INF * (pair_mask.astype(np.float64) - 1.0))[None]   # [1,I,J]
    pb = pair @ np.asarray(p["linear"]["kernel"]) + np.asarray(p["linear"]["bias"])
    g = 1.0 / (1.0 + np.exp(-(pair @ np.asarray(p["linear_g"]["kernel"])
                              + np.asarray(p["linear_g"]["bias"]))))
    pair_bias = np.moveaxis(pb * g, -1, 0)                           # [H,I,J]
    upd = gated_mha(p["mha"], node_i, node_j, [mask_bias, pair_bias])
    return node_i + upd * mask_i[:, None]


def cross_attention_module(p, p_embed, p_mask, c_embed, c_mask, pair,
                           pair_mask):
    """cross_att.py:24-54 (rm_layernorm, no trig attn). Single sample."""
    p_embed = row_attention_block(p["p_attention_block"], p_embed, c_embed,
                                  pair, pair_mask, p_mask)
    c_embed = row_attention_block(p["c_attention_block"], c_embed, p_embed,
                                  np.swapaxes(pair, 0, 1),
                                  np.swapaxes(pair_mask, 0, 1), c_mask)
    p_embed = p_embed + transition(p["p_transition"], p_embed)
    c_embed = c_embed + transition(p["c_transition"], c_embed)
    pair = pair + interaction(p["inter_layer"], p_embed, c_embed, p_mask,
                              c_mask)[0]
    pair = transition(p["pair_transition"], pair) * pair_mask[..., None]
    return p_embed, c_embed, pair


def inter_attention_full(params, cfg, h, x, edges, coord_max, lig_mask,
                         pkt_mask, pair, pair_mask, n_lig):
    """Full MC_Att_L (egnn.py:308-333): trio encoder (cross attn + pair-bias
    gather per inter edge, egnn.py:254-305) then the attention core."""
    c_side = h[: n_lig + 1]
    p_side = h[n_lig + 1:]
    c_mask_side = np.concatenate([[True], lig_mask])
    p_mask_side = np.concatenate([[True], pkt_mask])
    p_side, c_side, pair = cross_attention_module(
        params["cross_attn_module"], p_side, p_mask_side, c_side, c_mask_side,
        pair, pair_mask)
    h = np.concatenate([c_side, p_side], axis=0)
    bias_grid = (pair @ np.asarray(params["attn_bias_proj"]["kernel"])
                 + np.asarray(params["attn_bias_proj"]["bias"]))[..., 0]
    # edge (d, s): one end ligand slot l in [1..n_lig], other pocket slot
    # q in [n_lig+2..]; bias cell = pair[q - (n_lig+1), l] both directions
    # (egnn.py:286-305)
    bias = {}
    for d, s in edges:
        l, q = (d, s) if d <= n_lig else (s, d)
        bias[(d, s)] = bias_grid[q - (n_lig + 1), l]
    h_out, x_out = inter_attention_core(params, cfg, h, x, edges, coord_max,
                                        bias=bias)
    return h_out, x_out, pair
