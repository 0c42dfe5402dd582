"""E(3)-equivariant message passing, TPU-native.

Re-designs the reference EGNN stack (FABind/fabind/models/egnn.py:20-466,
FABind_plus/fabind/models/egnn.py) for dense fixed-shape execution:

- `EGCL` (reference MC_E_GCL, egnn.py:20-144): messages over a per-destination
  top-K neighbor table; the two global tokens (O(Nc)/O(Np) degree) are
  aggregated in a dense side branch sharing the same MLPs.
- `InterAttention` (reference MC_Att_L, egnn.py:147-333): exact dense masked
  bipartite attention over ligand↔pocket pairs. `scatter_softmax` per
  destination becomes a masked row softmax; `linear_kv([radial, h_j])`
  (egnn.py:200-205) is decomposed as kv_node_j + radial_ij * w_r so the
  aggregations are MXU matmuls.
- `MCAttEGNN` (egnn.py:336-466): the layer stack with the in-loop LAS
  projected-gradient correction (egnn.py:433-448).

All coordinates here are normalized (divided by coordinate_scale).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fabind_tpu.config import ModelConfig
from fabind_tpu.models.layers import InteractionModule, MLPBlock
from fabind_tpu.models.cross_att import CrossAttentionModule
from fabind_tpu.ops import graph as G
from fabind_tpu.ops.geometry import las_projection_step

Array = jax.Array
BIG = 1e9


class GraphInputs(NamedTuple):
    """Static (per-forward) graph data for one complex batch."""

    lig_mask: Array     # [B, Nc] bool
    pkt_mask: Array     # [B, Np] bool
    bond_idx: Array     # [B, Nc, Kb] int32 ligand-local bond neighbors
    bond_mask: Array    # [B, Nc, Kb] bool
    las_adj: Array      # [B, Nc, Nc] bool symmetric LAS adjacency
    las_ref: Array      # [B, Nc, 3] normalized LAS reference coords

    @property
    def layout(self) -> G.ComplexLayout:
        return G.ComplexLayout(self.lig_mask.shape[1], self.pkt_mask.shape[1])

    def node_mask(self) -> Array:
        return self.layout.node_mask(self.lig_mask, self.pkt_mask)


def _l1_edge_parts(mlp, h: Array):
    """Split mlp.linear1 over the [h_dst ++ h_src ++ radial] input structure
    into per-node projections + the radial column, using zero-padded calls so
    the parameter tree stays byte-identical to the fused MLP.

    Returns (a [B,N,H] = W_dst h + bias, s [B,N,H] = W_src h, w_r [H])."""
    B, N, C = h.shape
    z1 = jnp.zeros((B, N, 1), h.dtype)
    zC = jnp.zeros_like(h)
    zero = jnp.zeros((1, 1, 2 * C + 1), h.dtype)
    b0 = mlp.l1(zero)
    a = mlp.l1(jnp.concatenate([h, zC, z1], axis=-1))
    s = mlp.l1(jnp.concatenate([zC, h, z1], axis=-1)) - b0
    w_r = (mlp.l1(zero.at[..., -1].set(1.0)) - b0)[0, 0]
    return a, s, w_r


def _masked_softmax(logits: Array, mask: Array, axis: int) -> Array:
    logits = jnp.where(mask, logits, -BIG)
    out = jax.nn.softmax(logits, axis=axis)
    return out * mask.astype(out.dtype)


def _norm_div(r_sq_sum: Array, cfg: ModelConfig) -> Array:
    """Per-sample radial normalizer (egnn.py:772-786), guarded against
    empty edge sets."""
    if cfg.rm_F_norm or cfg.norm_type == "none":
        return jnp.ones_like(r_sq_sum)
    def _sqrt_safe(s):
        # grad-safe sqrt: sqrt'(0)=inf would poison backward even through
        # the where() below (0 * inf = nan)
        pos = s > 0
        return jnp.where(pos, jnp.sqrt(jnp.where(pos, s, 1.0)), 0.0)

    if cfg.norm_type == "per_sample":
        n = _sqrt_safe(r_sq_sum)
    elif cfg.norm_type == "all_sample":
        n = _sqrt_safe(jnp.sum(r_sq_sum)) * jnp.ones_like(r_sq_sum)
    else:
        raise ValueError(cfg.norm_type)
    return jnp.where(n == 0, 1.0, n)


def _egcl_mlps(cfg: ModelConfig, hidden: int, edge_in: int):
    """The MC_E_GCL MLP trio (egnn.py:40-87); shared by the ctx-graph EGCL
    and the ablation variants' bipartite EGCL (identical torch param names)."""
    if cfg.is_plus:
        s = cfg.mlp_hidden_scale
        edge_mlp = MLPBlock(s * edge_in, hidden, act="relu",
                            use_ln=cfg.use_ln_mlp, last_act=True,
                            dropout_rate=cfg.dropout, dropout_pos="both",
                            name="edge_mlp")
        node_in = 2 * hidden
        node_mlp = MLPBlock(s * node_in, hidden, act="relu",
                            use_ln=cfg.use_ln_mlp, last_act=True,
                            dropout_rate=cfg.dropout, dropout_pos="both",
                            name="node_mlp")
        coord_mlp = MLPBlock(s * hidden, 1, act="relu",
                             use_ln=cfg.use_ln_mlp, bias_out=False,
                             dropout_rate=cfg.dropout, dropout_pos="inner",
                             out_init_gain=0.001, name="coord_mlp")
    else:
        edge_mlp = MLPBlock(hidden, hidden, act="silu",
                            last_act=True, name="edge_mlp")
        node_mlp = MLPBlock(hidden, hidden, act="silu",
                            name="node_mlp")
        coord_mlp = MLPBlock(hidden, 1, act="silu", bias_out=False,
                             out_init_gain=0.001, name="coord_mlp")
    return edge_mlp, node_mlp, coord_mlp


class EGCL(nn.Module):
    """Multi-channel E(n) conv layer on the ctx graph (egnn.py:20-144).

    n_channel = 1 throughout FABind (model.py:37): radial is the squared
    distance, coords are [B, N, 3].
    """

    cfg: ModelConfig
    hidden: int
    coord_max: float   # normalize_coord(10), egnn.py:378

    def _mlps(self, edge_in: int):
        return _egcl_mlps(self.cfg, self.hidden, edge_in)

    @nn.compact
    def __call__(self, h: Array, x: Array, ctx: G.CtxGraph,
                 gi: GraphInputs, deterministic: bool = True
                 ) -> Tuple[Array, Array]:
        cfg = self.cfg
        layout = gi.layout
        C = h.shape[-1]
        edge_mlp, node_mlp, coord_mlp = self._mlps(2 * C + 1)
        drop = nn.Dropout(cfg.dropout, name="dropout")

        # The decomposed path gathers per-source data exactly once per edge
        # group: coords are PACKED with the projected features so the gather
        # rows are lane-aligned (a stand-alone [...,3] coord gather runs at
        # ~2 GB/s on TPU — sub-lane rows defeat the memory system).
        # use_ln_mlp (released FABind+) decomposes HALFWAY: LayerNorm over
        # the concatenated edge input has SUM statistics, so the per-edge
        # mean/variance reconstruct in O(1) from the gathered h itself, and
        # the dst block + LN affine fold into per-node precomputes
        # (MLPBlock.ln_l1_parts). The SRC projection stays per-edge
        # ([E,C]@[C,H], half the fused (2C+1)xH matmul) because gathering
        # the H-dim projection instead of the C-dim features doubles the
        # gather bytes and measures SLOWER than the fused path on-chip
        # (39.5 vs 43 c/s) — this op is gather-bound, not MXU-bound
        # (DESIGN.md "plus edge MLP decomposition").
        ln_decompose = cfg.is_plus and cfg.use_ln_mlp
        if ln_decompose:
            (a, _s_proj_unused, w_r, u_vec, c_vec, t_n,
             q_n, D_in) = edge_mlp.ln_l1_parts(h, src_proj=False)
            packed = jnp.concatenate([x, h], axis=-1)           # [B,N,3+C]
        else:
            a, s_proj, w_r = _l1_edge_parts(edge_mlp, h)
            packed = jnp.concatenate([x, s_proj], axis=-1)      # [B,N,3+H]

        g_n = G.gather_neighbors(packed, ctx.nbr_idx)           # [B,N,K,3+*]
        x_nbr = g_n[..., :3]
        diff_n = x[:, :, None, :] - x_nbr
        r_n = jnp.sum(diff_n * diff_n, axis=-1)                 # [B,N,K]
        m_n = ctx.nbr_mask

        g_c = G.gather_nodes(packed, jnp.broadcast_to(
            ctx.glbc_src[None], (x.shape[0],) + ctx.glbc_src.shape))
        diff_c = x[:, layout.glb_c][:, None, :] - g_c[..., :3]  # [B,Dc,3]
        r_c = jnp.sum(diff_c * diff_c, axis=-1)
        m_c = ctx.glbc_src_mask

        g_p = G.gather_nodes(packed, jnp.broadcast_to(
            ctx.glbp_src[None], (x.shape[0],) + ctx.glbp_src.shape))
        diff_p = x[:, layout.glb_p][:, None, :] - g_p[..., :3]
        r_p = jnp.sum(diff_p * diff_p, axis=-1)
        m_p = ctx.glbp_src_mask

        # ---- per-sample radial F-norm over the full ctx edge set ----
        r_sq = (
            jnp.sum(jnp.where(m_n, r_n * r_n, 0.0), axis=(1, 2))
            + jnp.sum(jnp.where(m_c, r_c * r_c, 0.0), axis=1)
            + jnp.sum(jnp.where(m_p, r_p * r_p, 0.0), axis=1)
        )
        div = _norm_div(r_sq, cfg)

        # The edge MLP's first linear over [h_dst ++ h_src ++ radial] is
        # decomposed into per-node matmuls + a rank-1 radial term — this
        # removes the O(E * (2C+1) * H) edge matmul and the concat
        # materialization, the dominant HBM/FLOP cost of the ctx layer.
        # With use_ln_mlp the LayerNorm folds in via per-edge mean/variance
        # reconstructed from the gathered per-node sums (exact algebra).
        if ln_decompose:
            Wg_s = _s_proj_unused   # [C, H]: γ-scaled src block of linear1

            def messages(h_src, radial, div_b, a_dst, t_dst, q_dst):
                hf = h_src.astype(jnp.float32)
                t_src = jnp.sum(hf, axis=-1)
                q_src = jnp.sum(hf * hf, axis=-1)
                s_src = h_src @ Wg_s                 # per-edge half matmul
                rn = (radial / div_b).astype(jnp.float32)
                mu = (t_dst + t_src + rn) / D_in
                var = (q_dst + q_src + rn * rn) / D_in - mu * mu
                inv = jax.lax.rsqrt(var + 1e-5)
                pre = (a_dst + s_src
                       + rn[..., None].astype(s_src.dtype) * w_r
                       - mu[..., None].astype(s_src.dtype) * u_vec)
                pre = inv[..., None].astype(pre.dtype) * pre + c_vec
                return edge_mlp.finish(pre, deterministic=deterministic)

            div_n = div[:, None, None]
            tq = (t_n[:, :, None], q_n[:, :, None])
            msg_n = messages(g_n[..., 3:], r_n, div_n, a[:, :, None, :],
                             *tq)
            msg_c = messages(g_c[..., 3:], r_c, div[:, None],
                             a[:, layout.glb_c][:, None, :],
                             t_n[:, layout.glb_c][:, None],
                             q_n[:, layout.glb_c][:, None])
            msg_p = messages(g_p[..., 3:], r_p, div[:, None],
                             a[:, layout.glb_p][:, None, :],
                             t_n[:, layout.glb_p][:, None],
                             q_n[:, layout.glb_p][:, None])
        else:
            def messages(s_src, radial, div_b, a_dst):
                pre = a_dst + s_src + (radial / div_b)[..., None] * w_r
                m = edge_mlp.finish(pre, deterministic=deterministic)
                if not cfg.is_plus:
                    m = drop(m, deterministic=deterministic)
                return m

            div_n = div[:, None, None]
            msg_n = messages(g_n[..., 3:], r_n, div_n, a[:, :, None, :])
            msg_c = messages(g_c[..., 3:], r_c, div[:, None],
                             a[:, layout.glb_c][:, None, :])
            msg_p = messages(g_p[..., 3:], r_p, div[:, None],
                             a[:, layout.glb_p][:, None, :])

        # ---- coord update: segment-mean of diff * coord_mlp(m) (egnn.py:111-128)
        def coord_agg(msg, diff, mask):
            w = coord_mlp.scalar_call(msg, deterministic=deterministic)[..., None]
            t = diff * w * mask[..., None].astype(diff.dtype)
            cnt = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1)
            return jnp.sum(t, axis=-2) / cnt.astype(diff.dtype)

        agg_x = coord_agg(msg_n, diff_n, m_n)                   # [B,N,3]
        agg_x = agg_x.at[:, layout.glb_c].set(coord_agg(msg_c, diff_c, m_c))
        agg_x = agg_x.at[:, layout.glb_p].set(coord_agg(msg_p, diff_p, m_p))
        x_out = x + jnp.clip(agg_x, -self.coord_max, self.coord_max)

        # ---- node update: h + node_mlp([h, sum(m)]) (egnn.py:89-109)
        agg_h = jnp.sum(msg_n * m_n[..., None].astype(msg_n.dtype), axis=-2)
        agg_h = agg_h.at[:, layout.glb_c].set(
            jnp.sum(msg_c * m_c[..., None].astype(msg_c.dtype), axis=-2))
        agg_h = agg_h.at[:, layout.glb_p].set(
            jnp.sum(msg_p * m_p[..., None].astype(msg_p.dtype), axis=-2))
        out = node_mlp(jnp.concatenate([h, agg_h], axis=-1),
                       deterministic=deterministic)
        if not cfg.is_plus:
            out = drop(out, deterministic=deterministic)
        h_out = h + out
        return h_out, x_out


class InterAttention(nn.Module):
    """Interfacial attention layer on the bipartite inter graph
    (reference MC_Att_L, egnn.py:147-333)."""

    cfg: ModelConfig
    hidden: int
    coord_max: float

    @nn.compact
    def __call__(self, h: Array, x: Array, adj: Array, gi: GraphInputs,
                 pair_embed: Optional[Array], pair_mask: Optional[Array],
                 deterministic: bool = True,
                 p_p_dist_embed: Optional[Array] = None,
                 c_c_dist_embed: Optional[Array] = None):
        cfg = self.cfg
        layout = gi.layout
        B = h.shape[0]
        C = h.shape[-1]
        Nc, Np = layout.n_lig, layout.n_pkt

        # ---------- trio encoder (egnn.py:254-305) ----------
        pair_bias_pc = None
        if cfg.add_attn_pair_bias:
            c_side = h[:, layout.cside_slice]
            p_side = h[:, layout.pside_slice]
            ones = jnp.ones((B, 1), bool)
            c_mask_side = jnp.concatenate([ones, gi.lig_mask], axis=1)
            p_mask_side = jnp.concatenate([ones, gi.pkt_mask], axis=1)
            if cfg.add_cross_attn_layer:
                p_side, c_side, pair_embed = CrossAttentionModule(
                    rm_layernorm=cfg.rm_layernorm,
                    keep_trig_attn=cfg.keep_trig_attn,
                    dropout_rate=cfg.dropout,
                    is_plus=cfg.is_plus,
                    mlp_hidden_scale=cfg.mlp_hidden_scale,
                    use_ln_mlp=cfg.use_ln_mlp,
                    mha_heads=cfg.mha_heads,
                    name="cross_attn_module",
                )(p_side, p_mask_side, c_side, c_mask_side,
                  pair_embed, pair_mask,
                  p_p_dist_embed=p_p_dist_embed,
                  c_c_dist_embed=c_c_dist_embed,
                  deterministic=deterministic)
                h = layout.scatter_sides(c_side, p_side)
            else:
                upd, _ = InteractionModule(
                    self.hidden, self.hidden, opm=cfg.opm,
                    rm_layernorm=cfg.rm_layernorm, name="inter_layer",
                )(p_side, c_side, p_mask_side, c_mask_side)
                pair_embed = (pair_embed + upd) if cfg.explicit_pair_embed else upd
            # pair-embed bias per inter edge: cell (p_local, c_local) serves
            # both edge directions (egnn.py:286-305)
            bias_full = nn.Dense(1, name="attn_bias_proj")(pair_embed)[..., 0]
            pair_bias_pc = bias_full[:, 1:, 1:]                 # [B, Np, Nc]

        # ---------- radial over inter edges ----------
        x_l = x[:, layout.lig_slice]
        x_p = x[:, layout.pkt_slice]
        diff_lp = x_l[:, :, None, :] - x_p[:, None, :, :]       # [B,Nc,Np,3]
        r_raw = jnp.sum(diff_lp * diff_lp, axis=-1)             # [B,Nc,Np]
        r_sq_sum = 2.0 * jnp.sum(jnp.where(adj, r_raw * r_raw, 0.0),
                                 axis=(1, 2))                   # both directions
        div = _norm_div(r_sq_sum, cfg)
        r = r_raw / div[:, None, None]

        # ---------- q / kv (egnn.py:186-225) ----------
        q = nn.Dense(self.hidden, name="linear_q")(h)
        # torch Linear(1+C -> 2C) on cat([radial, target]); decomposed:
        kv_kernel = self.param(
            "linear_kv_kernel", nn.initializers.lecun_normal(), (1 + C, 2 * self.hidden))
        kv_bias = self.param("linear_kv_bias", nn.initializers.zeros,
                             (2 * self.hidden,))
        kv_node = h @ kv_kernel[1:] + kv_bias                   # [B,N,2C]
        # interleaved split kv[...,0::2], kv[...,1::2] (egnn.py:205)
        kv_node = kv_node.reshape(B, -1, self.hidden, 2)
        k_node, v_node = kv_node[..., 0], kv_node[..., 1]
        w_r = kv_kernel[0].reshape(self.hidden, 2)
        k_r, v_r = w_r[:, 0], w_r[:, 1]

        q_l = q[:, layout.lig_slice]
        q_p = q[:, layout.pkt_slice]
        k_node_l = k_node[:, layout.lig_slice]
        k_node_p = k_node[:, layout.pkt_slice]
        v_node_l = v_node[:, layout.lig_slice]
        v_node_p = v_node[:, layout.pkt_slice]

        if cfg.is_plus:
            s = cfg.mlp_hidden_scale
            coord_mlp = MLPBlock(s * self.hidden, 1, act="relu",
                                 use_ln=cfg.use_ln_mlp, bias_out=False,
                                 dropout_rate=cfg.dropout, dropout_pos="inner",
                                 out_init_gain=0.001, name="coord_mlp")
        else:
            coord_mlp = MLPBlock(self.hidden, 1, act="silu", bias_out=False,
                                 out_init_gain=0.001, name="coord_mlp")
        drop = nn.Dropout(cfg.dropout, name="dropout")

        # decompose coord_mlp.linear1 over v_edge = v_node + r * v_r: the
        # O(E*C^2) per-edge matmul becomes a per-node matmul + a rank-1
        # radial correction (exact when there is no LayerNorm on the input)
        decompose = not (cfg.is_plus and cfg.use_ln_mlp)
        if decompose:
            zc = jnp.zeros((1, 1, self.hidden), v_node.dtype)
            b0 = coord_mlp.l1(zc)
            u_r = (coord_mlp.l1(v_r[None, None, :]) - b0)[0, 0]

        def direction(q_d, k_node_s, v_node_s, r_ds, adj_ds, bias_ds,
                      x_d, x_s):
            """One attention direction: destinations d attend over sources s.

            q_d [B,Nd,C]; *_s [B,Ns,C]; r_ds/adj_ds/bias_ds [B,Nd,Ns].
            The coord update needs only x_d/x_s: Σ_s t·(x_d - x_s) is
            decomposed as (Σ_s t)·x_d - t@x_s, never materializing the
            [B,Nd,Ns,3] difference tensor.
            """
            logits = jnp.einsum("bdc,bsc->bds", q_d, k_node_s)
            logits = logits + r_ds * jnp.einsum("bdc,c->bd", q_d, k_r)[..., None]
            if bias_ds is not None:
                logits = logits + bias_ds
            A = _masked_softmax(logits, adj_ds, axis=-1)        # [B,Nd,Ns]
            # h aggregation: Σ_s A (v_node_s + r v_r)
            agg = jnp.einsum("bds,bsc->bdc", A, v_node_s)
            agg = agg + jnp.sum(A * r_ds, axis=-1)[..., None] * v_r
            # coord: Σ_s A * coord_mlp(v_edge) * diff  (egnn.py:239-252)
            if decompose:
                l1_v = coord_mlp.l1(v_node_s)                    # [B,Ns,H]
                phi = coord_mlp.finish_scalar_rank1(
                    l1_v, r_ds, u_r, deterministic=deterministic)
            else:
                v_edge = v_node_s[:, None, :, :] + r_ds[..., None] * v_r
                phi = coord_mlp.scalar_call(v_edge, deterministic=deterministic)
            t = A * phi                                          # [B,Nd,Ns]
            dx = jnp.sum(t, axis=-1)[..., None] * x_d - jnp.einsum(
                "bds,bsx->bdx", t, x_s)
            return agg, dx

        # ligand destinations over pocket sources
        bias_cp = None if pair_bias_pc is None else jnp.swapaxes(pair_bias_pc, 1, 2)
        agg_l, dx_l = direction(q_l, k_node_p, v_node_p, r, adj, bias_cp,
                                x_l, x_p)
        # pocket destinations over ligand sources
        r_t = jnp.swapaxes(r, 1, 2)
        adj_t = jnp.swapaxes(adj, 1, 2)
        agg_p, dx_p = direction(q_p, k_node_l, v_node_l, r_t, adj_t,
                                pair_bias_pc, x_p, x_l)

        agg = jnp.zeros_like(h)
        agg = agg.at[:, layout.lig_slice].set(agg_l)
        agg = agg.at[:, layout.pkt_slice].set(agg_p)
        h = h + drop(agg, deterministic=deterministic)

        if cfg.is_plus and cfg.inter_additional_mlp:
            s = cfg.mlp_hidden_scale
            h = h + MLPBlock(s * self.hidden, self.hidden, act="relu",
                             use_ln=cfg.use_ln_mlp, last_act=True,
                             dropout_rate=cfg.dropout, dropout_pos="both",
                             name="node_mlp")(h, deterministic=deterministic)

        dx = jnp.zeros_like(x)
        dx = dx.at[:, layout.lig_slice].set(dx_l)
        dx = dx.at[:, layout.pkt_slice].set(dx_p)
        x = x + jnp.clip(dx, -self.coord_max, self.coord_max)
        return h, x, pair_embed


class MCAttEGNN(nn.Module):
    """The EGNN stack (egnn.py:336-466): n_layers x (EGCL -> InterAttention ->
    LAS projection) + out EGCL, with linear in/out."""

    cfg: ModelConfig
    hidden: int
    out_dim: int
    n_layers: int

    @nn.compact
    def __call__(self, h: Array, x: Array, gi: GraphInputs,
                 pair_embed: Optional[Array], pair_mask: Optional[Array],
                 intra_cutoff: float, inter_cutoff: float, ctx_k: int,
                 deterministic: bool = True,
                 p_p_dist_embed: Optional[Array] = None,
                 c_c_dist_embed: Optional[Array] = None):
        cfg = self.cfg
        layout = gi.layout
        coord_max = cfg.normalize(10.0)
        las_clamp = cfg.normalize(15.0)
        movable = layout.movable()[None, :, None]

        # cfg.remat: rematerialize each layer in the backward pass
        # (jax.checkpoint via nn.remat). The training-step residuals are
        # dominated by the per-layer ctx-gather/pair activations
        # ([B, N, K+1, C+3] and [B, Np, Nc, C] per layer — OOM at b32 fp32
        # on 16G HBM without remat); recomputing them trades ~1 extra
        # forward for O(n_layers) fewer live activations.
        Egcl, Att = EGCL, InterAttention
        if cfg.remat:
            Egcl = nn.remat(EGCL, static_argnums=(5,))
            Att = nn.remat(InterAttention, static_argnums=(7,))

        h = nn.Dense(self.hidden, name="linear_in")(h)
        h = nn.Dropout(cfg.dropout, name="dropout")(h, deterministic=deterministic)

        def maybe_fix(x_old, x_new):
            if cfg.fix_pocket:
                return jnp.where(movable, x_new, x_old)
            return x_new

        for i in range(self.n_layers):
            # edges rebuilt from current coords every layer invocation of the
            # recycle loop; within the stack the reference reuses the edges
            # built at loop entry (att_model.py:229-231), so we build once per
            # __call__ here, matching that semantics.
            if i == 0:
                ctx = G.build_ctx_graph(x, layout, gi.lig_mask, gi.pkt_mask,
                                        gi.bond_idx, gi.bond_mask,
                                        intra_cutoff, ctx_k)
                adj = G.build_inter_graph(x, layout, gi.lig_mask, gi.pkt_mask,
                                          inter_cutoff).adj
            h, x_new = Egcl(cfg, self.hidden, coord_max, name=f"gcl_{i}")(
                h, x, ctx, gi, deterministic)
            x = maybe_fix(x, x_new)
            h, x_new, pair_new = Att(
                cfg, self.hidden, coord_max, name=f"att_{i}")(
                    h, x, adj, gi, pair_embed, pair_mask, deterministic,
                    p_p_dist_embed, c_c_dist_embed)
            # FABind+ threads the updated pair embedding through the stack
            # (plus egnn.py:380-392); base DISCARDS it — MC_Att_L.forward
            # returns only (h, coord, att) and MCAttEGNN never reassigns
            # pair_embed_batched (base egnn.py:313-333,411-425), so every
            # layer biases off the pair built at loop entry.
            if cfg.is_plus:
                pair_embed = pair_new
            x = maybe_fix(x, x_new)
            if not cfg.rm_LAS_constrained_optim and not cfg.only_last_LAS:
                x_l = las_projection_step(
                    x[:, layout.lig_slice], gi.las_ref, gi.las_adj,
                    cfg.geometry_reg_step_size, las_clamp, steps=cfg.geom_reg_steps)
                x = x.at[:, layout.lig_slice].set(x_l)

        h, x_new = Egcl(cfg, self.hidden, coord_max, name="out_layer")(
            h, x, ctx, gi, deterministic)
        x = maybe_fix(x, x_new)
        h = nn.Dropout(cfg.dropout, name="dropout_out")(h, deterministic=deterministic)
        h = nn.Dense(self.out_dim, name="linear_out")(h)
        return h, x, pair_embed


class BipartiteEGCL(nn.Module):
    """MC_E_GCL evaluated on the inter (att) edge set.

    The reference's ablation stacks instantiate a plain MC_E_GCL for the
    `att_{i}` slots and feed it `att_edges` (att_model.py:139-150,
    egnn.py:515-524): messages flow ligand->pocket and pocket->ligand over
    the dense bipartite adjacency; global tokens receive no messages but
    still run the residual node MLP on a zero aggregate (torch
    unsorted_segment_sum yields zeros for edge-free nodes, egnn.py:89-109).
    Identical parameter structure to EGCL."""

    cfg: ModelConfig
    hidden: int
    coord_max: float

    @nn.compact
    def __call__(self, h: Array, x: Array, adj: Array, gi: GraphInputs,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        cfg = self.cfg
        layout = gi.layout
        C = h.shape[-1]
        edge_mlp, node_mlp, coord_mlp = _egcl_mlps(cfg, self.hidden, 2 * C + 1)
        drop = nn.Dropout(cfg.dropout, name="dropout")

        x_l = x[:, layout.lig_slice]
        x_p = x[:, layout.pkt_slice]
        diff_lp = x_l[:, :, None, :] - x_p[:, None, :, :]       # [B,Nc,Np,3]
        r = jnp.sum(diff_lp * diff_lp, axis=-1)                 # [B,Nc,Np]
        # both edge directions share the radial -> factor 2 in the F-norm
        div = _norm_div(2.0 * jnp.sum(jnp.where(adj, r * r, 0.0), axis=(1, 2)),
                        cfg)
        r_n = r / div[:, None, None]
        adj_f = adj.astype(h.dtype)

        # same decomposition as EGCL, dense bipartite form; use_ln_mlp folds
        # the LayerNorm via per-node sums (MLPBlock.ln_l1_parts)
        if cfg.is_plus and cfg.use_ln_mlp:
            (a, s_proj, w_r, u_vec, c_vec, t_n,
             q_n, D_in) = edge_mlp.ln_l1_parts(h)

            def messages(a_dst, s_src, radial, t_dst, t_src, q_dst, q_src):
                mu = (t_dst + t_src + radial.astype(jnp.float32)) / D_in
                var = ((q_dst + q_src
                        + radial.astype(jnp.float32) ** 2) / D_in - mu * mu)
                inv = jax.lax.rsqrt(var + 1e-5)
                pre = (a_dst + s_src
                       + radial[..., None].astype(s_src.dtype) * w_r
                       - mu[..., None].astype(s_src.dtype) * u_vec)
                pre = inv[..., None].astype(pre.dtype) * pre + c_vec
                return edge_mlp.finish(pre, deterministic=deterministic)

            tl = t_n[:, layout.lig_slice]
            tp = t_n[:, layout.pkt_slice]
            ql = q_n[:, layout.lig_slice]
            qp = q_n[:, layout.pkt_slice]
            msg_l = messages(a[:, layout.lig_slice][:, :, None],
                             s_proj[:, layout.pkt_slice][:, None], r_n,
                             tl[:, :, None], tp[:, None],
                             ql[:, :, None], qp[:, None])       # [B,Nc,Np,H]
            msg_p = messages(a[:, layout.pkt_slice][:, :, None],
                             s_proj[:, layout.lig_slice][:, None],
                             jnp.swapaxes(r_n, 1, 2),
                             tp[:, :, None], tl[:, None],
                             qp[:, :, None], ql[:, None])       # [B,Np,Nc,H]
        else:
            a, s_proj, w_r = _l1_edge_parts(edge_mlp, h)

            def messages(a_dst, s_src, radial):
                m = edge_mlp.finish(a_dst + s_src + radial[..., None] * w_r,
                                    deterministic=deterministic)
                return m if cfg.is_plus else drop(m, deterministic=deterministic)

            msg_l = messages(a[:, layout.lig_slice][:, :, None],
                             s_proj[:, layout.pkt_slice][:, None],
                             r_n)                               # [B,Nc,Np,H]
            msg_p = messages(a[:, layout.pkt_slice][:, :, None],
                             s_proj[:, layout.lig_slice][:, None],
                             jnp.swapaxes(r_n, 1, 2))           # [B,Np,Nc,H]

        def coord_agg(msg, diff, mask):
            w = coord_mlp.scalar_call(msg, deterministic=deterministic)[..., None]
            t = diff * w * mask[..., None].astype(diff.dtype)
            cnt = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1)
            return jnp.sum(t, axis=-2) / cnt.astype(diff.dtype)

        adj_t = jnp.swapaxes(adj, 1, 2)
        dx = jnp.zeros_like(x)
        dx = dx.at[:, layout.lig_slice].set(coord_agg(msg_l, diff_lp, adj))
        dx = dx.at[:, layout.pkt_slice].set(
            coord_agg(msg_p, -jnp.swapaxes(diff_lp, 1, 2), adj_t))
        x_out = x + jnp.clip(dx, -self.coord_max, self.coord_max)

        agg = jnp.zeros(h.shape[:-1] + (msg_l.shape[-1],), h.dtype)
        agg = agg.at[:, layout.lig_slice].set(
            jnp.einsum("bds,bdsc->bdc", adj_f, msg_l))
        agg = agg.at[:, layout.pkt_slice].set(
            jnp.einsum("bds,bdsc->bdc", jnp.swapaxes(adj_f, 1, 2), msg_p))
        out = node_mlp(jnp.concatenate([h, agg], axis=-1),
                       deterministic=deterministic)
        if not cfg.is_plus:
            out = drop(out, deterministic=deterministic)
        return h + out, x_out


class MCnoAttEGNN(nn.Module):
    """Ablation stacks (reference MCnoAttEGNN egnn.py:469-586 and
    MCnoAttwithCrossAttEGNN egnn.py:589-766): the `att_{i}` interfacial
    attention layers are replaced by plain EGCLs over the inter edges;
    `with_cross_attn=True` additionally runs the shared trio encoder
    (cross-attention / interaction pair update, egnn.py:616-697) before each
    inter layer. Neither is used by the released checkpoints."""

    cfg: ModelConfig
    hidden: int
    out_dim: int
    n_layers: int
    with_cross_attn: bool = False

    @nn.compact
    def __call__(self, h: Array, x: Array, gi: GraphInputs,
                 pair_embed: Optional[Array], pair_mask: Optional[Array],
                 intra_cutoff: float, inter_cutoff: float, ctx_k: int,
                 deterministic: bool = True,
                 p_p_dist_embed: Optional[Array] = None,
                 c_c_dist_embed: Optional[Array] = None):
        cfg = self.cfg
        layout = gi.layout
        coord_max = cfg.normalize(10.0)
        las_clamp = cfg.normalize(15.0)
        movable = layout.movable()[None, :, None]

        h = nn.Dense(self.hidden, name="linear_in")(h)
        h = nn.Dropout(cfg.dropout, name="dropout")(h, deterministic=deterministic)

        if self.with_cross_attn:
            # ONE cross-attn module shared by every layer (egnn.py:607-609)
            cross = CrossAttentionModule(
                rm_layernorm=cfg.rm_layernorm, keep_trig_attn=cfg.keep_trig_attn,
                dropout_rate=cfg.dropout, is_plus=cfg.is_plus,
                mlp_hidden_scale=cfg.mlp_hidden_scale, use_ln_mlp=cfg.use_ln_mlp,
                mha_heads=cfg.mha_heads, name="cross_attn_module")
            inter_layer = InteractionModule(
                self.hidden, self.hidden, opm=cfg.opm,
                rm_layernorm=cfg.rm_layernorm, name="inter_layer")
            # created (and trained) by the reference but its output is
            # discarded in forward (egnn.py:718-722 `..., _ = trio_encoder`)
            bias_proj = nn.Dense(1, name="attn_bias_proj")

        def maybe_fix(x_old, x_new):
            if cfg.fix_pocket:
                return jnp.where(movable, x_new, x_old)
            return x_new

        for i in range(self.n_layers):
            if i == 0:
                ctx = G.build_ctx_graph(x, layout, gi.lig_mask, gi.pkt_mask,
                                        gi.bond_idx, gi.bond_mask,
                                        intra_cutoff, ctx_k)
                adj = G.build_inter_graph(x, layout, gi.lig_mask, gi.pkt_mask,
                                          inter_cutoff).adj
            h, x_new = EGCL(cfg, self.hidden, coord_max, name=f"gcl_{i}")(
                h, x, ctx, gi, deterministic)
            x = maybe_fix(x, x_new)

            if self.with_cross_attn:
                c_side = h[:, layout.cside_slice]
                p_side = h[:, layout.pside_slice]
                ones = jnp.ones((h.shape[0], 1), bool)
                c_mask_side = jnp.concatenate([ones, gi.lig_mask], axis=1)
                p_mask_side = jnp.concatenate([ones, gi.pkt_mask], axis=1)
                if cfg.add_cross_attn_layer:
                    p_side, c_side, pair_embed = cross(
                        p_side, p_mask_side, c_side, c_mask_side,
                        pair_embed, pair_mask,
                        p_p_dist_embed=p_p_dist_embed,
                        c_c_dist_embed=c_c_dist_embed,
                        deterministic=deterministic)
                    h = layout.scatter_sides(c_side, p_side)
                else:
                    upd, _ = inter_layer(p_side, c_side, p_mask_side,
                                         c_mask_side)
                    pair_embed = (pair_embed + upd
                                  if cfg.explicit_pair_embed else upd)
                if i == 0 and pair_embed is not None:
                    bias_proj(pair_embed)  # params only; output unused

            h, x_new = BipartiteEGCL(cfg, self.hidden, coord_max,
                                     name=f"att_{i}")(
                h, x, adj, gi, deterministic)
            x = maybe_fix(x, x_new)
            if not cfg.rm_LAS_constrained_optim and not cfg.only_last_LAS:
                x_l = las_projection_step(
                    x[:, layout.lig_slice], gi.las_ref, gi.las_adj,
                    cfg.geometry_reg_step_size, las_clamp,
                    steps=cfg.geom_reg_steps)
                x = x.at[:, layout.lig_slice].set(x_l)

        h, x_new = EGCL(cfg, self.hidden, coord_max, name="out_layer")(
            h, x, ctx, gi, deterministic)
        x = maybe_fix(x, x_new)
        h = nn.Dropout(cfg.dropout, name="dropout_out")(h, deterministic=deterministic)
        h = nn.Dense(self.out_dim, name="linear_out")(h)
        return h, x, pair_embed
