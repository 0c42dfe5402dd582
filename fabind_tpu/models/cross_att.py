"""AlphaFold-style cross attention over the ligand/protein pair embedding.

Dense re-implementation of FABind/fabind/models/cross_att.py:7-134. The inputs
are the fixed-layout "sides" of the complex (see DESIGN.md): the protein side
[B, 1+Np, C] (glb_p + pocket) and compound side [B, 1+Nc, C] (glb_c + ligand),
with the pair embedding [B, 1+Np, 1+Nc, C].
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fabind_tpu.models.layers import (Attention, InteractionModule, MLPBlock,
                                      Transition)

Array = jax.Array

INF = 1e9


class RowAttentionBlock(nn.Module):
    """Node_i attends to node_j with pair-embed gated bias
    (cross_att.py:95-134)."""

    attention_hidden_dim: int = 32
    no_heads: int = 4
    dropout_rate: float = 0.1
    rm_layernorm: bool = False

    @nn.compact
    def __call__(self, node_embed_i: Array, node_embed_j: Array,
                 pair_embed: Array, pair_mask: Array, node_mask_i: Array,
                 deterministic: bool = True) -> Array:
        # the reference REASSIGNS node_embed_i to its layernorm before the
        # residual add (cross_att.py:120-122,128), so with layernorm on the
        # residual base is the NORMALIZED embedding, not the raw input
        if not self.rm_layernorm:
            node_embed_i = nn.LayerNorm(epsilon=1e-5, name="layernorm_node_i")(node_embed_i)
            node_embed_j = nn.LayerNorm(epsilon=1e-5, name="layernorm_node_j")(node_embed_j)
            pair_embed = nn.LayerNorm(epsilon=1e-5, name="layernorm_pair")(pair_embed)
        res = node_embed_i
        # (*, 1, I, J) mask bias + (*, H, I, J) gated pair bias
        mask_bias = INF * (pair_mask.astype(pair_embed.dtype) - 1.0)
        mask_bias = mask_bias[..., None, :, :]
        pair_bias = (
            nn.Dense(self.no_heads, name="linear")(pair_embed)
            * jax.nn.sigmoid(nn.Dense(self.no_heads, name="linear_g")(pair_embed))
        )
        pair_bias = jnp.moveaxis(pair_bias, -1, -3)  # (*, H, I, J)
        upd = Attention(self.attention_hidden_dim, self.no_heads, name="mha")(
            node_embed_i, node_embed_j, biases=[mask_bias, pair_bias])
        upd = nn.Dropout(self.dropout_rate, name="dropout")(
            upd, deterministic=deterministic)
        return res + upd * node_mask_i[..., None].astype(upd.dtype)


class RowTriangleAttentionBlock(nn.Module):
    """Triangle attention over pair rows (cross_att.py:57-92); only used when
    keep_trig_attn (off in released configs)."""

    attention_hidden_dim: int = 32
    no_heads: int = 4
    dropout_rate: float = 0.1
    rm_layernorm: bool = False

    @nn.compact
    def __call__(self, pair_embed: Array, pair_mask: Array, dist_embed: Array,
                 deterministic: bool = True) -> Array:
        # residual base is the layernormed pair embedding, as in the
        # reference's reassignment (cross_att.py:79-80,86)
        if not self.rm_layernorm:
            pair_embed = nn.LayerNorm(epsilon=1e-5, name="layernorm")(pair_embed)
        res = pair_embed
        mask_bias = INF * (pair_mask.astype(pair_embed.dtype) - 1.0)
        mask_bias = mask_bias[..., :, None, None, :]          # (*, I, 1, 1, J)
        dist_bias = (
            nn.Dense(self.no_heads, name="linear")(dist_embed)
            * jax.nn.sigmoid(nn.Dense(self.no_heads, name="linear_g")(dist_embed))
        )
        dist_bias = jnp.moveaxis(dist_bias, -1, -3)[..., None, :, :, :]
        upd = Attention(self.attention_hidden_dim, self.no_heads, name="mha")(
            pair_embed, pair_embed, biases=[mask_bias, dist_bias])
        upd = nn.Dropout(self.dropout_rate, name="dropout")(
            upd, deterministic=deterministic)
        return res + upd * pair_mask[..., None].astype(upd.dtype)


class CrossAttentionModule(nn.Module):
    """p<-c and c<-p row attention + transitions + pair update
    (cross_att.py:7-54). Forward order matters: the compound side attends to
    the *updated* protein side.

    FABind+ (FABind_plus/fabind/models/cross_att.py:7-46) replaces the
    Transition blocks with MLPwithLastAct (n=mlp_hidden_scale, optional
    LayerNorm, dropout inside and after); attention math is otherwise
    identical for the released configs (dis_pair_type='no')."""

    rm_layernorm: bool = False
    keep_trig_attn: bool = False
    dropout_rate: float = 0.1
    is_plus: bool = False
    mlp_hidden_scale: int = 1
    use_ln_mlp: bool = False
    mha_heads: int = 4

    def _transition(self, name: str):
        if self.is_plus:
            return lambda x, det: x + MLPBlock(
                self.mlp_hidden_scale * x.shape[-1], x.shape[-1], act="relu",
                use_ln=self.use_ln_mlp, last_act=True,
                dropout_rate=self.dropout_rate, dropout_pos="both",
                name=name)(x, deterministic=det)
        return lambda x, det: x + Transition(
            n=2, rm_layernorm=self.rm_layernorm, name=name)(x)

    def _pair_transition(self, name: str):
        # pair transition is NOT residual (cross_att.py:53)
        if self.is_plus:
            return lambda x, det: MLPBlock(
                self.mlp_hidden_scale * x.shape[-1], x.shape[-1], act="relu",
                use_ln=self.use_ln_mlp, last_act=True,
                dropout_rate=self.dropout_rate, dropout_pos="both",
                name=name)(x, deterministic=det)
        return lambda x, det: Transition(
            n=2, rm_layernorm=self.rm_layernorm, name=name)(x)

    @nn.compact
    def __call__(self, p_embed: Array, p_mask: Array, c_embed: Array,
                 c_mask: Array, pair_embed: Array, pair_mask: Array,
                 p_p_dist_embed: Optional[Array] = None,
                 c_c_dist_embed: Optional[Array] = None,
                 deterministic: bool = True):
        if self.keep_trig_attn:
            blk = RowTriangleAttentionBlock(
                rm_layernorm=self.rm_layernorm, name="triangle_block_row")
            pair_embed = blk(pair_embed, pair_mask, c_c_dist_embed,
                             deterministic)
            pair_embed = jnp.swapaxes(
                blk(jnp.swapaxes(pair_embed, -2, -3),
                    jnp.swapaxes(pair_mask, -1, -2),
                    p_p_dist_embed, deterministic),
                -2, -3)

        p_embed = RowAttentionBlock(
            no_heads=self.mha_heads,
            rm_layernorm=self.rm_layernorm, dropout_rate=self.dropout_rate,
            name="p_attention_block")(
                p_embed, c_embed, pair_embed, pair_mask, p_mask, deterministic)
        c_embed = RowAttentionBlock(
            no_heads=self.mha_heads,
            rm_layernorm=self.rm_layernorm, dropout_rate=self.dropout_rate,
            name="c_attention_block")(
                c_embed, p_embed,
                jnp.swapaxes(pair_embed, -2, -3),
                jnp.swapaxes(pair_mask, -1, -2),
                c_mask, deterministic)
        p_embed = self._transition("p_transition")(p_embed, deterministic)
        c_embed = self._transition("c_transition")(c_embed, deterministic)
        pair_embed = pair_embed + InteractionModule(
            32, pair_embed.shape[-1], rm_layernorm=self.rm_layernorm,
            name="inter_layer")(p_embed, c_embed, p_mask, c_mask)[0]
        pair_embed = self._pair_transition("pair_transition")(
            pair_embed, deterministic)
        pair_embed = pair_embed * pair_mask[..., None].astype(pair_embed.dtype)
        return p_embed, c_embed, pair_embed
