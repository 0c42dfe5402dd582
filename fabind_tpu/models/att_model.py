"""Iterative refinement wrapper (reference EfficientMCAttModel,
FABind/fabind/models/att_model.py:131-246).

Recycling semantics reproduced exactly: `n_iter` rounds, gradients only
through the last (att_model.py:227-245); `random_n_iter` samples 1..n_iter at
train time (att_model.py:210-213); only movable nodes (glb_c, ligand, glb_p)
carry coordinate updates across rounds (X[mask] = Z[mask]). The no-grad rounds
run in a `nn.while_loop` with a *traced* trip count — one compiled copy of the
GNN, no unrolling.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fabind_tpu.config import ModelConfig
from fabind_tpu.models.egnn import GraphInputs, MCAttEGNN, MCnoAttEGNN
from fabind_tpu.models.layers import InteractionModule

Array = jax.Array


class EfficientMCAttModel(nn.Module):
    cfg: ModelConfig
    embed_size: int
    hidden_size: int
    n_layers: int
    n_iter: int
    ctx_k: int
    # FABFlex hook: carry pocket coordinate updates across recycles too
    # (the reference's movable mask `[glb_c|lig|glb_p]`, utils.py:359-361,
    # is exactly the lever FABFlex flips)
    flexible: bool = False

    def setup(self):
        cfg = self.cfg
        # EGNN variant selection (att_model.py:139-152): the released
        # checkpoints all use MCAttEGNN; the no-attention ablations swap the
        # interfacial attention layers for plain inter-edge EGCLs
        if cfg.ablation_no_attention:
            self.gnn = MCnoAttEGNN(cfg, self.hidden_size, self.hidden_size,
                                   self.n_layers, with_cross_attn=False,
                                   name="gnn")
        elif cfg.ablation_no_attention_with_cross_attn:
            self.gnn = MCnoAttEGNN(cfg, self.hidden_size, self.hidden_size,
                                   self.n_layers, with_cross_attn=True,
                                   name="gnn")
        else:
            self.gnn = MCAttEGNN(cfg, self.hidden_size, self.hidden_size,
                                 self.n_layers, name="gnn")
        if cfg.explicit_pair_embed:
            # pair embedding built once per forward from the raw node
            # embeddings (att_model.py:198-208)
            self.inter_layer = InteractionModule(
                self.hidden_size, self.hidden_size,
                rm_layernorm=cfg.rm_layernorm, name="inter_layer")
        if cfg.keep_trig_attn:
            raise NotImplementedError("keep_trig_attn is off in all released "
                                      "FABind configs")

    def _step(self, h: Array, x: Array, gi: GraphInputs, pair_embed,
              pair_mask, deterministic: bool):
        cfg = self.cfg
        h_out, z, pair_out = self.gnn(
            h, x, gi, pair_embed, pair_mask,
            cfg.normalize(cfg.intra_cutoff), cfg.normalize(cfg.inter_cutoff),
            self.ctx_k, deterministic=deterministic)
        if self.flexible:
            movable = gi.node_mask()[..., None]
        else:
            movable = gi.layout.movable()[None, :, None]
        x_out = jnp.where(movable, z, x)
        return h_out, x_out, pair_out

    def __call__(self, x: Array, h: Array, gi: GraphInputs,
                 deterministic: bool = True,
                 n_iter_override: Optional[Array] = None
                 ) -> Tuple[Array, Array, Optional[Array]]:
        """Args:
          x: [B, N, 3] normalized complex coords.
          h: [B, N, embed_size] complex node embeddings.
          n_iter_override: traced iteration count (defaults to n_iter, or a
            1..n_iter sample when training with random_n_iter).
        Returns:
          (x_out, h_out, pair_embed_out)
        """
        cfg = self.cfg
        layout = gi.layout
        B = h.shape[0]

        if cfg.explicit_pair_embed:
            ones = jnp.ones((B, 1), bool)
            c_mask_side = jnp.concatenate([ones, gi.lig_mask], axis=1)
            p_mask_side = jnp.concatenate([ones, gi.pkt_mask], axis=1)
            pair_embed, pair_mask = self.inter_layer(
                h[:, layout.pside_slice], h[:, layout.cside_slice],
                p_mask_side, c_mask_side)
            pair_embed = pair_embed * pair_mask[..., None].astype(pair_embed.dtype)
        else:
            pair_embed, pair_mask = None, None

        if n_iter_override is None:
            n_iter = jnp.asarray(self.n_iter)
            if not deterministic and cfg.random_n_iter:
                n_iter = jax.random.randint(
                    self.make_rng("sample"), (), 1, self.n_iter + 1)
        else:
            n_iter = n_iter_override

        if self.is_initializing():
            # create gnn params before the while_loop (flax lifted loops do
            # not initialize parameters inside the loop body)
            self._step(h, x, gi, pair_embed, pair_mask, deterministic)

        def body(mdl, carry):
            i, xc = carry
            _, x_new, _ = mdl._step(h, xc, gi, pair_embed, pair_mask,
                                    deterministic)
            return i + 1, jax.lax.stop_gradient(x_new)

        def cond(mdl, carry):
            return carry[0] < n_iter - 1

        _, x = nn.while_loop(cond, body, self,
                             (jnp.asarray(0), jax.lax.stop_gradient(x)),
                             split_rngs={"dropout": True, "sample": True},
                             broadcast_variables="params")
        x = jax.lax.stop_gradient(x)
        h_out, x, pair_out = self._step(h, x, gi, pair_embed, pair_mask,
                                        deterministic)
        return x, h_out, pair_out
