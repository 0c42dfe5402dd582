"""Primitive neural blocks shared by FABind and FABind+.

Covers the reference's MLP families (FABind Sequential MLPs, egnn.py:40-60;
FABind+ MLP/MLPwithLastAct/MLPwoBias/MLP4Confidence,
FABind_plus/fabind/models/model_utils.py:10-97), the OpenFold-style gated
multi-head attention (model_utils.py:41-159), Transition, InteractionModule and
the RBF distance modules (model_utils.py:162-252).

All modules are flax.linen; parameter tree names mirror the torch module names
so the checkpoint converter (fabind_tpu/train/convert.py) is a mechanical
rename + transpose.
"""
from __future__ import annotations

import math
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

ACTS = {"silu": jax.nn.silu, "relu": jax.nn.relu}


def xavier_uniform_gain(gain: Optional[float]):
    """torch xavier_uniform_(gain=g) == variance_scaling(g^2, fan_avg,
    uniform); None -> flax's default Dense init."""
    if gain is None:
        return nn.initializers.lecun_normal()
    return nn.initializers.variance_scaling(gain ** 2, "fan_avg", "uniform")


class MLPBlock(nn.Module):
    """Configurable 2-linear MLP covering both variants' MLP families.

    FABind base edge/node/coord MLPs are Sequential(Linear, act[, Linear, act])
    with SiLU and no LayerNorm (egnn.py:40-60); FABind+ replaces them with
    MLP/MLPwithLastAct/MLPwoBias (relu, optional LayerNorm `use_ln_mlp`,
    dropout inside, hidden = n*in_dim) (FABind_plus model_utils.py:10-74).

    Besides the standard __call__, exposes `l1` (raw first-linear) and
    `finish` (act -> dropout -> second linear -> ...) so callers can
    algebraically decompose the first linear over structured edge inputs
    (h_dst ++ h_src ++ radial) into per-node matmuls + rank-1 corrections —
    the key TPU optimization for the EGNN edge MLPs. Only valid when
    use_ln=False (LayerNorm mixes the concatenated input).
    """

    hidden_dim: int
    out_dim: int
    act: str = "silu"
    use_ln: bool = False
    last_act: bool = False
    bias_out: bool = True
    dropout_rate: float = 0.0
    # dropout placement: "none" | "inner" (after first act) | "both"
    dropout_pos: str = "none"
    # xavier_uniform gain for the output (and optionally first) layer:
    # the reference initializes every coord_mlp head (base
    # egnn.py:51-52,162-164; plus egnn.py:41,135) and the base distmap_mlp
    # (model.py:78-79) with gain=0.001 so updates start ~1000x small.
    # None = flax default.
    out_init_gain: Optional[float] = None
    l1_init_gain: Optional[float] = None

    def setup(self):
        # attribute names define the param paths (linear1/linear2/layernorm),
        # matching the torch module names for checkpoint conversion
        if self.use_ln:
            self.layernorm = nn.LayerNorm(epsilon=1e-5)
        self.linear1 = nn.Dense(
            self.hidden_dim,
            kernel_init=xavier_uniform_gain(self.l1_init_gain))
        self.linear2 = nn.Dense(
            self.out_dim, use_bias=self.bias_out,
            kernel_init=xavier_uniform_gain(self.out_init_gain))
        if self.dropout_rate > 0 and self.dropout_pos in ("inner", "both"):
            self.dropout1 = nn.Dropout(self.dropout_rate)
        if self.dropout_rate > 0 and self.dropout_pos == "both":
            self.dropout2 = nn.Dropout(self.dropout_rate)

    def l1(self, x: Array) -> Array:
        """First linear only (no LayerNorm support)."""
        assert not self.use_ln
        return self.linear1(x)

    def finish(self, pre: Array, deterministic: bool = True) -> Array:
        """Complete the MLP from the first-linear pre-activation."""
        act = ACTS[self.act]
        x = act(pre)
        if self.dropout_rate > 0 and self.dropout_pos in ("inner", "both"):
            x = self.dropout1(x, deterministic=deterministic)
        x = self.linear2(x)
        if self.last_act:
            x = act(x)
        if self.dropout_rate > 0 and self.dropout_pos == "both":
            x = self.dropout2(x, deterministic=deterministic)
        return x

    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.use_ln:
            x = self.layernorm(x)
        return self.finish(self.linear1(x), deterministic)

    def finish_scalar(self, pre: Array, deterministic: bool = True) -> Array:
        """finish() for out_dim == 1, returning [...] instead of [..., 1].

        XLA lowers a [*, H] @ [H, 1] Dense onto the MXU as a 1-column matmul
        (1 useful lane of 128, profiled at ~0.30 ms per call on the
        InterAttention coord gate vs ~0.025 ms as a reduction); expressing
        the contraction as multiply+reduce keeps it on the VPU and lets XLA
        fuse it with the activation. Numerically identical up to reduction
        order.
        """
        assert self.out_dim == 1 and not self.last_act
        x = ACTS[self.act](pre)
        if self.dropout_rate > 0 and self.dropout_pos in ("inner", "both"):
            x = self.dropout1(x, deterministic=deterministic)
        if self.is_initializing():
            out = self.linear2(x)[..., 0]
        else:
            p = self.get_variable("params", "linear2")
            out = jnp.einsum("...h,h->...", x, p["kernel"][:, 0])
            if self.bias_out:
                out = out + p["bias"][0]
        if self.dropout_rate > 0 and self.dropout_pos == "both":
            out = self.dropout2(out, deterministic=deterministic)
        return out

    def scalar_call(self, x: Array, deterministic: bool = True) -> Array:
        """__call__ for out_dim == 1 via finish_scalar (shape [...])."""
        if self.use_ln:
            x = self.layernorm(x)
        return self.finish_scalar(self.linear1(x), deterministic)

    def ln_l1_parts(self, h: Array, src_proj: bool = True):
        """Per-node pieces of `linear1(layernorm([h_dst ++ h_src ++ r]))`
        for use_ln=True edge MLPs (the released FABind+ config).

        LayerNorm over the CONCATENATED edge input looks undecomposable,
        but its statistics are sums: with per-node t=Σh and q=Σh² the
        per-edge mean/variance are O(1), and the normalize-then-project
        algebra folds into per-node matmuls:

          y = W·LN(v) + b,  v = [h_dst; h_src; r],  D = 2C+1
            = inv·(A·h_dst + S·h_src + r·w_r − μ·u) + c
          μ = (t_dst + t_src + r)/D
          inv = rsqrt((q_dst + q_src + r²)/D − μ² + ε)
          A = (γ_d ⊙ W_d),  S = (γ_s ⊙ W_s),  w_r = γ_r·W_r
          u = Σ_i γ_i W[i,:],   c = W·β + b

        This removes the O(E·D·H) fused edge matmul — the released plus
        config's dominant cost (use_ln_mlp disables the plain decomposed
        path; measured 43 → see DESIGN.md "plus edge MLP") — at the price
        of gathering H-dim projections instead of C-dim features.

        Returns (a [B,N,H] = A·h_dst, s, w_r [H], u [H], c [H], t [B,N],
        q [B,N], D) where s is the per-node src projection S·h [B,N,H] when
        src_proj=True, or the raw scaled kernel S=(γ_s⊙W_s) [C,H] when
        src_proj=False — gather-bound callers project the GATHERED h per
        edge instead (gathering the H-dim projection costs ~2x the bytes of
        the C-dim features and measured slower than fused). Exact in real
        arithmetic; statistics accumulate in float32.
        """
        assert self.use_ln
        B, N, C = h.shape
        D = 2 * C + 1
        if self.is_initializing():
            # create layernorm+linear1 params at the fused input width
            z = jnp.zeros((1, 1, D), h.dtype)
            self.linear1(self.layernorm(z))
        lnp = self.get_variable("params", "layernorm")
        l1p = self.get_variable("params", "linear1")
        gamma = lnp["scale"].astype(jnp.float32)          # [D]
        beta = lnp["bias"].astype(jnp.float32)
        W = l1p["kernel"]                                  # [D, H]
        b = l1p["bias"]
        Wg = W * gamma[:, None].astype(W.dtype)
        a = h @ Wg[:C]
        s = h @ Wg[C:2 * C] if src_proj else Wg[C:2 * C]
        w_r = Wg[2 * C]
        u = jnp.sum(Wg, axis=0)
        c = beta.astype(W.dtype) @ W + b
        hf = h.astype(jnp.float32)
        t = jnp.sum(hf, axis=-1)
        q = jnp.sum(hf * hf, axis=-1)
        return a, s, w_r, u, c, t, q, D

    def finish_scalar_rank1(self, l1_v: Array, r: Array, u: Array,
                            deterministic: bool = True) -> Array:
        """finish_scalar over the rank-1-structured pre-activation
        `pre[b,d,n,:] = l1_v[b,n,:] + r[b,d,n] * u` without materializing it.

        This is the InterAttention coord gate (reference egnn.py:227-252 runs
        coord_mlp over every edge value v_node[src] + radial * v_r). With
        FABIND_USE_PALLAS=1 on TPU the broadcast+act+reduce runs as a Pallas
        kernel over VMEM-resident tiles (ops/pallas/edge_gate.py); the
        default is the jnp path, which XLA fuses into one loop and measures
        faster end-to-end (105.6 vs 101.8 complexes/s at the bench config —
        see DESIGN.md "Pallas decision").
        """
        assert self.out_dim == 1 and not self.last_act and not self.use_ln
        drop_active = (self.dropout_rate > 0 and not deterministic
                       and self.dropout_pos in ("inner", "both"))
        use_pallas = (jax.default_backend() == "tpu"
                      and os.environ.get("FABIND_USE_PALLAS") == "1"
                      and not drop_active and not self.is_initializing()
                      and self.act in ("silu", "relu"))
        if not use_pallas:
            pre = l1_v[:, None, :, :] + r[..., None] * u
            return self.finish_scalar(pre, deterministic)
        from fabind_tpu.ops.pallas.edge_gate import phi_rank1_tpu
        p = self.get_variable("params", "linear2")
        out = phi_rank1_tpu(l1_v, r, u, p["kernel"][:, 0], self.act)
        if self.bias_out:
            out = out + p["bias"][0]
        return out


class Transition(nn.Module):
    """LN -> Linear(n*h) -> relu -> Linear(h) (model_utils.py:162-175)."""

    n: int = 4
    rm_layernorm: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x.shape[-1]
        if not self.rm_layernorm:
            x = nn.LayerNorm(epsilon=1e-5, name="layernorm")(x)
        x = nn.Dense(self.n * h, name="linear_1")(x)
        x = nn.Dense(h, name="linear_2")(jax.nn.relu(x))
        return x


class TransitionDiffOutDim(nn.Module):
    """FABind base pocket-cls head (FABind/fabind/models/model.py:11-24):
    LN -> Linear(n*h) -> relu -> Linear(out)."""

    out_dim: int = 1
    n: int = 4

    @nn.compact
    def __call__(self, z: Array) -> Array:
        h = z.shape[-1]
        # both linears xavier(gain=0.001)-initialized (model.py:17-19)
        init = xavier_uniform_gain(0.001)
        z = nn.LayerNorm(epsilon=1e-5, name="layernorm")(z)
        z = nn.Dense(self.n * h, kernel_init=init, name="linear1")(z)
        z = nn.Dense(self.out_dim, kernel_init=init,
                     name="linear2")(jax.nn.relu(z))
        return z


class Attention(nn.Module):
    """OpenFold-style gated MHA with additive bias list
    (model_utils.py:41-159). c_hidden is the per-head dim.

    `distance` + `dis_pair_type` reproduce the FABind+ distance-pair bias
    (model_utils.py:109-146,270, flag `rel_dis_pair_bias`; "none" in every
    released config): distance is [*, Q, K, H]-shaped, added to the logits
    pre-softmax ("add") or multiplied into the weights post-softmax ("mul").
    """

    c_hidden: int
    no_heads: int
    gating: bool = True

    @nn.compact
    def __call__(self, q_x: Array, kv_x: Array,
                 biases: Optional[Sequence[Array]] = None,
                 distance: Optional[Array] = None,
                 dis_pair_type: str = "none") -> Array:
        H, D = self.no_heads, self.c_hidden
        c_q = q_x.shape[-1]
        q = nn.Dense(H * D, use_bias=False, name="linear_q")(q_x)
        k = nn.Dense(H * D, use_bias=False, name="linear_k")(kv_x)
        v = nn.Dense(H * D, use_bias=False, name="linear_v")(kv_x)
        q = q.reshape(q.shape[:-1] + (H, D)) / math.sqrt(D)
        k = k.reshape(k.shape[:-1] + (H, D))
        v = v.reshape(v.shape[:-1] + (H, D))
        # [*, H, Q, K]
        a = jnp.einsum("...qhd,...khd->...hqk", q, k)
        for b in biases or ():
            a = a + b
        if dis_pair_type == "add" and distance is not None:
            a = a + jnp.moveaxis(distance, -1, -3)
        a = jax.nn.softmax(a, axis=-1)
        if dis_pair_type == "mul" and distance is not None:
            a = a * jnp.moveaxis(distance, -1, -3)
        o = jnp.einsum("...hqk,...khd->...qhd", a, v)
        if self.gating:
            g = jax.nn.sigmoid(nn.Dense(H * D, name="linear_g")(q_x))
            o = o * g.reshape(g.shape[:-1] + (H, D))
        o = o.reshape(o.shape[:-2] + (H * D,))
        return nn.Dense(c_q, name="linear_o")(o)


class InteractionModule(nn.Module):
    """Pair embedding from node embeddings (model_utils.py:177-223):
    z_ij = Linear(p_i * c_j) (elementwise product einsum ...ik,...jk->...ijk),
    or the outer-product-mean variant when opm=True."""

    hidden_dim: int
    pair_dim: int
    opm: bool = False
    rm_layernorm: bool = False

    @nn.compact
    def __call__(self, p_embed: Array, c_embed: Array,
                 p_mask: Optional[Array] = None,
                 c_mask: Optional[Array] = None):
        if p_mask is None:
            p_mask = jnp.ones(p_embed.shape[:-1], bool)
        if c_mask is None:
            c_mask = jnp.ones(c_embed.shape[:-1], bool)
        inter_mask = jnp.einsum("...i,...j->...ij", p_mask, c_mask)
        if not self.rm_layernorm:
            p_embed = nn.LayerNorm(epsilon=1e-5, name="layer_norm_p")(p_embed)
            c_embed = nn.LayerNorm(epsilon=1e-5, name="layer_norm_c")(c_embed)
        p = nn.Dense(self.hidden_dim, name="linear_p")(p_embed)
        c = nn.Dense(self.hidden_dim, name="linear_c")(c_embed)
        if self.opm:
            z = jnp.einsum("...bc,...de->...bdce", p, c)
            z = z.reshape(z.shape[:-2] + (-1,))
        else:
            z = jnp.einsum("...ik,...jk->...ijk", p, c)
        z = nn.Dense(self.pair_dim, name="linear_out")(z)
        z = z * inter_mask[..., None].astype(z.dtype)
        return z, inter_mask


class GaussianSmearing(nn.Module):
    """RBF expansion (model_utils.py:227-236)."""

    start: float = 0.0
    stop: float = 5.0
    num_gaussians: int = 50

    @nn.compact
    def __call__(self, dist: Array) -> Array:
        # static (numpy) offsets: traced jnp.linspace cannot be concretized
        # for the coefficient under jit
        offset = np.linspace(self.start, self.stop, self.num_gaussians)
        coeff = -0.5 / float(offset[1] - offset[0]) ** 2
        d = dist[..., None] - jnp.asarray(offset, dist.dtype)
        return jnp.exp(coeff * d * d)


class GaussianLayer(nn.Module):
    """Learnable gaussian basis over pairwise distances
    (model_utils.py:338-356): K gaussian pdfs with trainable means/stds,
    evaluated on a [..., 1] distance tensor broadcast to K channels."""

    K: int = 128

    @nn.compact
    def __call__(self, x: Array) -> Array:
        means = self.param("means", nn.initializers.uniform(scale=3.0),
                           (1, self.K))
        stds = self.param("stds", nn.initializers.uniform(scale=3.0),
                          (1, self.K))
        mean = means.reshape(-1)
        std = jnp.abs(stds.reshape(-1)) + 1e-2
        x = jnp.broadcast_to(x, x.shape[:-1] + (self.K,))
        z = (x - mean) / std
        pi = 3.14159
        return jnp.exp(-0.5 * z * z) / (math.sqrt(2 * pi) * std)


class RBFDistanceModule(nn.Module):
    """RBF + MLP distance embedding (model_utils.py:239-252)."""

    rbf_stop: float
    hidden_dim: int
    num_gaussian: int = 32
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, distance: Array, deterministic: bool = True) -> Array:
        x = GaussianSmearing(0.0, self.rbf_stop, self.num_gaussian,
                             name="rbf")(distance)
        x = nn.Dense(self.hidden_dim, name="mlp_0")(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(self.dropout_rate, name="mlp_drop")(
            x, deterministic=deterministic)
        return nn.Dense(self.hidden_dim, name="mlp_3")(x)
