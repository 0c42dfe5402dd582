"""FABind / FABind+ top-level models, TPU-native.

Re-implements the two-stage architecture of the reference
(FABind/fabind/models/model.py:26-586 `IaBNet_mean_and_pocket_prediction_...`;
FABind_plus/fabind/models/model.py:13-675 `FABindPlus`) on the fixed dense
complex layout. The per-sample re-batching loops of the reference
(model.py:104-117, 195-288) become static slice assembly + one compaction
gather for the predicted-pocket crop.

Frames: the base model works in the protein-mean frame end to end. FABind+
recenters the docking complex on the pocket center (model.py:179-183,254-258)
and restores the world frame via `pocket_center_bias` (model.py:659); since
its losses are translation-invariant we always *return* coordinates in the
protein-mean frame (bias already added back).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from fabind_tpu.config import ModelConfig, ShapeConfig
from fabind_tpu.models.att_model import EfficientMCAttModel
from fabind_tpu.models.egnn import GraphInputs
from fabind_tpu.models.layers import MLPBlock, TransitionDiffOutDim
from fabind_tpu.ops import graph as G
from fabind_tpu.ops.geometry import pairwise_dist
from fabind_tpu.ops.gumbel import pocket_center_from_cls, pocket_center_rounded

Array = jax.Array


@struct.dataclass
class FABindOutput:
    coords: Array              # [B, Nc, 3] predicted ligand coords (protein-mean frame)
    lig_mask: Array            # [B, Nc]
    y_pred: Array              # [B, Np, Nc] distmap head (sigmoid * thres)
    y_pred_by_coord: Array     # [B, Np, Nc] distances from predicted coords
    dis_map_target: Array      # [B, Np, Nc] regression target (device-computed)
    pair_valid: Array          # [B, Np, Nc]
    pocket_cls_logits: Array   # [B, Nr]
    pocket_cls_label: Array    # [B, Nr]
    prot_mask: Array           # [B, Nr]
    pred_pocket_center: Array  # [B, 3]
    use_stage2: Array          # scalar bool (which branch fed the docking model)
    keep_less_5: Array         # [B] bool (predicted crop had <5 residues)
    pocket_overflow: Array     # [B] residues dropped by the Np bucket
    ctx_overflow: Array        # [B] radius edges dropped by the ctx top-K table
    pocket_radius_pred: Array  # [B] (FABind+; zeros for base)
    confidence: Array          # [B] (FABind+ confidence head; zeros otherwise)
    # FABFlex-style flexible docking (config.flexible_docking): the docked
    # pocket-residue coordinates (protein-mean frame). Equal to the input
    # pocket coords when the pocket is rigid.
    pocket_coords: Array       # [B, Np, 3]
    pkt_idx: Array             # [B, Np] residue indices the docking pocket used
    pkt_mask: Array            # [B, Np]


class FABind(nn.Module):
    cfg: ModelConfig
    shapes: ShapeConfig

    def setup(self):
        cfg = self.cfg
        C = cfg.hidden_size
        Cp = cfg.pocket_pred_hidden_size
        self.glb_c = self.param("glb_c", nn.initializers.ones, (1, C))
        self.glb_p = self.param("glb_p", nn.initializers.ones, (1, C))
        # xavier(gain=0.001) init per the reference (base model.py:74-77;
        # plus model.py:47-50)
        from fabind_tpu.models.layers import xavier_uniform_gain
        init = xavier_uniform_gain(0.001)
        self.protein_linear_whole_protein = nn.Dense(
            C, kernel_init=init, name="protein_linear_whole_protein")
        self.compound_linear_whole_protein = nn.Dense(
            C, kernel_init=init, name="compound_linear_whole_protein")
        self.embedding_shrink = nn.Dense(Cp, kernel_init=init,
                                         name="embedding_shrink")
        self.embedding_enlarge = nn.Dense(C, kernel_init=init,
                                          name="embedding_enlarge")

        self.pocket_pred_model = EfficientMCAttModel(
            cfg, Cp, Cp, cfg.pocket_pred_layers, cfg.pocket_pred_n_iter,
            self.shapes.ctx_k_whole, name="pocket_pred_model")
        self.complex_model = EfficientMCAttModel(
            cfg, C, C, cfg.mean_layers, cfg.n_iter, self.shapes.ctx_k,
            flexible=cfg.flexible_docking, name="complex_model")

        if cfg.is_plus:
            s = cfg.mlp_hidden_scale
            self.protein_to_pocket = MLPBlock(
                s * C, 1, act="relu", use_ln=cfg.use_ln_mlp,
                dropout_rate=cfg.dropout, dropout_pos="inner",
                name="protein_to_pocket")
            self.pocket_radius_head = MLPBlock(
                s * C, 1, act="relu", use_ln=cfg.use_ln_mlp,
                dropout_rate=cfg.dropout, dropout_pos="inner",
                name="pocket_radius_head")
            self.distmap_mlp = MLPBlock(
                s * C, 1, act="relu", use_ln=cfg.use_ln_mlp,
                dropout_rate=cfg.dropout, dropout_pos="inner",
                name="distmap_mlp")
            if cfg.confidence_training:
                n = cfg.confidence_mlp_hidden_scale
                if cfg.stack_mlp:
                    self.ranking_mlp_pre = MLPBlock(
                        n * C, C, act="relu", use_ln=cfg.confidence_use_ln_mlp,
                        dropout_rate=cfg.confidence_dropout,
                        dropout_pos="inner", name="ranking_mlp_pre")
                self.ranking_score_mlp = MLPBlock(
                    n * C, 1, act="relu", use_ln=cfg.confidence_use_ln_mlp,
                    dropout_rate=cfg.confidence_dropout, dropout_pos="inner",
                    name="ranking_score_mlp")
        else:
            self.protein_to_pocket = TransitionDiffOutDim(
                out_dim=1, n=4, name="protein_to_pocket")
            self.layernorm = nn.LayerNorm(epsilon=1e-5, name="layernorm")
            # both distmap linears xavier(gain=0.001) (model.py:78-79)
            self.distmap_mlp = MLPBlock(C, 1, act="relu", out_init_gain=0.001,
                                        l1_init_gain=0.001,
                                        name="distmap_mlp")

    # ------------------------------------------------------------------ utils
    def _masked_mean(self, v: Array, mask: Array) -> Array:
        m = mask[..., None].astype(v.dtype)
        return jnp.sum(v * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)

    def _complex_h(self, compound_emb: Array, pocket_emb: Array) -> Array:
        B = compound_emb.shape[0]
        gc = jnp.broadcast_to(self.glb_c[None], (B, 1, self.glb_c.shape[-1]))
        gp = jnp.broadcast_to(self.glb_p[None], (B, 1, self.glb_p.shape[-1]))
        return jnp.concatenate([gc, compound_emb, gp, pocket_emb], axis=1)

    def _complex_x(self, lig_x: Array, pkt_x: Array) -> Array:
        B = lig_x.shape[0]
        z = jnp.zeros((B, 1, 3), lig_x.dtype)
        return jnp.concatenate([z, lig_x, z, pkt_x], axis=1)

    # --------------------------------------------------------- pocket stage
    def _pocket_pred(self, batch, deterministic: bool):
        """Whole-protein pocket prediction (model.py:98-141)."""
        cfg = self.cfg
        lig_emb = self.compound_linear_whole_protein(batch.lig_feat)
        prot_emb = self.protein_linear_whole_protein(batch.prot_feat)
        h = self.embedding_shrink(self._complex_h(lig_emb, prot_emb))

        # ligand is centered at the protein origin for pocket prediction
        # (utils/utils.py:374-381)
        init_centered = batch.lig_coords_init - self._masked_mean(
            batch.lig_coords_init, batch.lig_mask)[:, None]
        init_centered = init_centered * batch.lig_mask[..., None]
        x = cfg.normalize(self._complex_x(init_centered, batch.prot_xyz))

        gi = GraphInputs(
            lig_mask=batch.lig_mask, pkt_mask=batch.prot_mask,
            bond_idx=batch.bond_idx, bond_mask=batch.bond_mask,
            las_adj=batch.las_adj,
            las_ref=cfg.normalize(batch.lig_rdkit_coords))
        _, h_out, _ = self.pocket_pred_model(x, h, gi,
                                             deterministic=deterministic)
        h_out = self.embedding_enlarge(h_out)

        layout = gi.layout
        compound_out = h_out[:, layout.lig_slice]
        protein_out = h_out[:, layout.pkt_slice]
        cls_logits = self.protein_to_pocket(
            protein_out, deterministic=deterministic
        ) if cfg.is_plus else self.protein_to_pocket(protein_out)
        cls_logits = cls_logits[..., 0] * batch.prot_mask.astype(h_out.dtype)

        radius_pred = jnp.zeros((batch.batch_size,), h_out.dtype)
        if cfg.is_plus:
            # pocket radius head over summed ligand embeddings
            # (FABind_plus model.py:110-121, use_for_radius_pred='ligand')
            if cfg.use_for_radius_pred == "ligand":
                pooled = jnp.sum(
                    compound_out * batch.lig_mask[..., None], axis=1)
            elif cfg.use_for_radius_pred == "both":
                nm = gi.node_mask()
                pooled = jnp.sum(h_out * nm[..., None], axis=1)
            else:  # global
                pooled = h_out[:, layout.glb_c]
            radius_pred = jax.nn.relu(
                self.pocket_radius_head(pooled, deterministic=deterministic)
            )[..., 0]

        return compound_out, protein_out, cls_logits, radius_pred

    # ------------------------------------------------------------- crop
    def _predicted_crop(self, center: Array, radius: Array, batch):
        """keepNode by predicted center (+ <5 -> first-100 fallback,
        model.py:196-201), packed into the Np pocket slots."""
        d = jnp.linalg.norm(batch.prot_xyz - center[:, None, :], axis=-1)
        keep = (d < radius[:, None]) & batch.prot_mask
        cnt = jnp.sum(keep, axis=1)
        Nr = batch.prot_mask.shape[1]
        # the reference ADDS the first 100 residues to any existing keeps
        # (keepNode[:100] = True, model.py:199-201)
        fallback = ((jnp.arange(Nr)[None, :] < 100) | keep) & batch.prot_mask
        less5 = cnt < 5
        keep = jnp.where(less5[:, None], fallback, keep)
        idx, mask, overflow = G.compact_keep_mask(keep, self.shapes.max_pocket)
        return idx, mask, less5, overflow

    # ------------------------------------------------------------- forward
    def __call__(self, batch, train: bool = False, stage: int = 2,
                 deterministic: Optional[bool] = None) -> FABindOutput:
        cfg = self.cfg
        det = (not train) if deterministic is None else deterministic
        B = batch.batch_size
        Np = self.shapes.max_pocket

        compound_out, protein_out, cls_logits, radius_pred = \
            self._pocket_pred(batch, det)

        key = self.make_rng("sample") if train else None
        pred_center = pocket_center_from_cls(
            cls_logits, batch.prot_xyz, batch.prot_mask, cfg.gs_tau,
            cfg.gs_hard, key=key if train else None)

        # ---- stage gate ----
        # base: probabilistic stage-2 when the predicted center is good
        # (FABind model.py:160-171). plus: training is ALWAYS teacher-forced
        # (`train or stage==1`, FABind_plus model.py:170).
        if train and not cfg.is_plus:
            center_err = jnp.mean(jnp.linalg.norm(
                jax.lax.stop_gradient(batch.coords_center - pred_center),
                axis=-1))
            coin = jax.random.uniform(self.make_rng("sample"), ())
            use_stage2 = (center_err < cfg.center_dist_threshold) & \
                (coin < cfg.stage_prob)
        elif train:
            use_stage2 = jnp.asarray(False)
        else:
            use_stage2 = jnp.asarray(stage == 2)

        # ---- assemble both pocket candidates, select ----
        need2 = (train and not cfg.is_plus) or (not train and stage == 2)
        need1 = train or stage == 1
        keep_less_5 = jnp.zeros((B,), bool)
        overflow = jnp.zeros((B,), jnp.int32)
        if need2:
            center2 = pred_center
            if train and cfg.train_pred_pocket_noise > 0:
                center2 = center2 + cfg.train_pred_pocket_noise * (
                    2 * jax.random.uniform(self.make_rng("sample"),
                                           center2.shape) - 1)
            center2 = jax.lax.stop_gradient(center2)
            radius = self._crop_radius(radius_pred, B)
            idx2, mask2, keep_less_5, overflow = self._predicted_crop(
                center2, radius, batch)
        if need1:
            idx1, mask1 = batch.pocket_idx, batch.pocket_mask
        if need1 and need2:
            pkt_idx = jnp.where(use_stage2, idx2, idx1)
            pkt_mask = jnp.where(use_stage2, mask2, mask1)
        elif need2:
            pkt_idx, pkt_mask = idx2, mask2
        else:
            pkt_idx, pkt_mask = idx1, mask1

        out = self._dock(batch, compound_out, protein_out, pkt_idx, pkt_mask,
                         use_stage2, det)
        (coords_out, y_pred, y_by_coord, dis_map, pair_valid, confidence,
         ctx_overflow, pkt_coords_out) = out

        return FABindOutput(
            coords=coords_out,
            lig_mask=batch.lig_mask,
            y_pred=y_pred,
            y_pred_by_coord=y_by_coord,
            dis_map_target=dis_map,
            pair_valid=pair_valid,
            pocket_cls_logits=cls_logits,
            pocket_cls_label=batch.pocket_label.astype(cls_logits.dtype),
            prot_mask=batch.prot_mask,
            pred_pocket_center=pred_center,
            use_stage2=use_stage2,
            keep_less_5=keep_less_5,
            pocket_overflow=overflow,
            ctx_overflow=ctx_overflow,
            pocket_radius_pred=radius_pred,
            confidence=confidence,
            pocket_coords=pkt_coords_out,
            pkt_idx=pkt_idx,
            pkt_mask=pkt_mask,
        )

    def _crop_radius(self, radius_pred: Array, B: int) -> Array:
        """Dynamic crop radius (FABind+ model.py:222-230); fixed 20Å for
        base."""
        cfg = self.cfg
        if not cfg.is_plus or cfg.force_fix_radius:
            return jnp.full((B,), cfg.pocket_radius)
        if cfg.pocket_radius_buffer <= 2.0:
            r = radius_pred * cfg.pocket_radius_buffer
        else:
            r = radius_pred + cfg.pocket_radius_buffer
        return jnp.maximum(r, cfg.min_pocket_radius)

    # ------------------------------------------------------------- docking
    def _dock(self, batch, compound_out: Array, protein_out: Array,
              pkt_idx: Array, pkt_mask: Array, use_stage2: Array,
              det: bool) -> Tuple[Array, ...]:
        """Build the docking complex from a pocket selection and run the
        complex model + heads (model.py:195-368)."""
        cfg = self.cfg

        pocket_emb = G.gather_nodes(protein_out, pkt_idx)        # [B,Np,C]
        pkt_xyz = G.gather_nodes(batch.prot_xyz, pkt_idx)
        pkt_xyz = pkt_xyz * pkt_mask[..., None]
        pkt_center = self._masked_mean(pkt_xyz, pkt_mask)        # [B,3]

        # ligand init: stage1 = host-built init; stage2 = init re-centered on
        # the predicted pocket mean (model.py:227)
        init1 = batch.lig_coords_init
        init_centered = batch.lig_coords_init - self._masked_mean(
            batch.lig_coords_init, batch.lig_mask)[:, None]
        init2 = (init_centered + pkt_center[:, None]) * batch.lig_mask[..., None]
        lig_init = jnp.where(use_stage2, init2, init1)

        # FABind+ pocket-frame recentering (model.py:179-183, 254-258)
        if cfg.is_plus:
            bias = jnp.where(use_stage2, pkt_center, batch.pocket_residue_center)
            pkt_xyz = (pkt_xyz - bias[:, None]) * pkt_mask[..., None]
            lig1 = init_centered * batch.lig_mask[..., None]
            lig2 = (init_centered + self._masked_mean(pkt_xyz, pkt_mask)[:, None]
                    ) * batch.lig_mask[..., None]
            lig_init = jnp.where(use_stage2, lig2, lig1)
        else:
            bias = jnp.zeros((batch.batch_size, 3), lig_init.dtype)

        h = self._complex_h(compound_out, pocket_emb)
        x = cfg.normalize(self._complex_x(lig_init, pkt_xyz))
        gi = GraphInputs(
            lig_mask=batch.lig_mask, pkt_mask=pkt_mask,
            bond_idx=batch.bond_idx, bond_mask=batch.bond_mask,
            las_adj=batch.las_adj,
            las_ref=cfg.normalize(batch.lig_rdkit_coords))
        ctx_overflow = G.ctx_overflow_count(
            x, gi.layout, pkt_mask, cfg.normalize(cfg.intra_cutoff),
            self.shapes.ctx_k)

        x_out, h_out, pair_out = self.complex_model(x, h, gi,
                                                    deterministic=det)

        layout = gi.layout
        if cfg.is_plus and cfg.only_last_LAS:
            from fabind_tpu.ops.geometry import las_projection_step
            x_l = las_projection_step(
                x_out[:, layout.lig_slice], gi.las_ref, gi.las_adj,
                cfg.geometry_reg_step_size, cfg.normalize(2.0),
                steps=cfg.geom_reg_steps)
            x_out = x_out.at[:, layout.lig_slice].set(x_l)

        coords_n = x_out[:, layout.lig_slice]                    # normalized
        pkt_out = h_out[:, layout.pkt_slice]
        lig_out = h_out[:, layout.lig_slice]
        pair_valid = pkt_mask[:, :, None] & batch.lig_mask[:, None, :]
        # docked pocket coordinates: identical to the input pocket unless
        # flexible_docking carries pocket updates across recycles
        pkt_coords_n = x_out[:, layout.pkt_slice]

        # distance-map heads (model.py:344-365 / plus model.py:376-388)
        if cfg.is_plus:
            z = pair_out[:, 1:, 1:]
            b = self.distmap_mlp(z, deterministic=det)[..., 0]
        else:
            p_ln = self.layernorm(pkt_out)
            c_ln = self.layernorm(lig_out)
            z = jnp.einsum("bik,bjk->bijk", p_ln, c_ln)
            b = self.distmap_mlp(z)[..., 0]
        y_pred = jax.nn.sigmoid(b) * cfg.dis_map_thres

        # by-coord distances read the docked pocket (== input when rigid)
        d_n = pairwise_dist(pkt_coords_n, coords_n)
        y_by_coord = jnp.clip(cfg.unnormalize(d_n), 0.0, cfg.dis_map_thres)

        # regression target: stage1 vs gt coords (utils.py:234-239);
        # stage2 vs the *init* coords, faithfully reproducing
        # model.py:286-288 / plus model.py:313-314
        lig_ref1 = batch.lig_coords
        lig_ref2 = batch.lig_coords_init
        if cfg.is_plus:
            lig_ref1 = lig_ref1 - batch.pocket_residue_center[:, None]
            lig_ref2 = lig_ref2 - bias[:, None]
        lig_ref = jnp.where(use_stage2, lig_ref2, lig_ref1)
        dis_map = jnp.minimum(pairwise_dist(pkt_xyz, lig_ref), cfg.dis_map_thres)
        dis_map = dis_map * pair_valid

        coords_out = cfg.unnormalize(coords_n) + bias[:, None]
        coords_out = coords_out * batch.lig_mask[..., None]
        pkt_coords_out = cfg.unnormalize(pkt_coords_n) + bias[:, None]
        pkt_coords_out = pkt_coords_out * pkt_mask[..., None]

        confidence = jnp.zeros((batch.batch_size,), h_out.dtype)
        if cfg.is_plus and cfg.confidence_training:
            nm = gi.node_mask()
            pooled = jnp.sum(h_out * nm[..., None], axis=1)
            if cfg.stack_mlp:
                pooled = jax.nn.relu(
                    self.ranking_mlp_pre(pooled, deterministic=det))
            confidence = self.ranking_score_mlp(pooled, deterministic=det)[..., 0]

        return (coords_out, y_pred, y_by_coord, dis_map, pair_valid,
                confidence, ctx_overflow, pkt_coords_out)

    # ------------------------------------------------------------- inference
    def _infer(self, batch, center_override: Optional[Array],
               deterministic: bool):
        """Shared predicted-pocket inference core (model.py:371-580):
        rounded-sigmoid pocket center with no-random-gumbel fallback,
        predicted crop, docking. Returns (lig_coords, pkt_coords, pkt_idx,
        pkt_mask, confidence, pocket_overflow)."""
        pocket = self._pocket_pred(batch, deterministic)
        return self._infer_from_pocket(batch, pocket, center_override,
                                       deterministic)

    def _infer_from_pocket(self, batch, pocket, center_override,
                           deterministic: bool):
        """`_infer` continuation from precomputed pocket-stage outputs
        (compound_out, protein_out, cls_logits, radius_pred). Split out so
        the sampling path can run ONE stochastic pocket forward per pass,
        cluster its logits host-side, and dock with the SAME forward's
        embeddings/radius — the reference's coupling, where each sampling
        pass is a single model.forward (inference_sampling_fabind.py:
        148-167) — without paying pocket prediction twice."""
        cfg = self.cfg
        compound_out, protein_out, cls_logits, radius_pred = pocket
        center = pocket_center_rounded(cls_logits, batch.prot_xyz,
                                       batch.prot_mask, cfg.gs_tau, cfg.gs_hard)
        if center_override is not None:
            center = center_override
        radius = self._crop_radius(radius_pred, batch.batch_size)
        idx, mask, _, overflow = self._predicted_crop(center, radius, batch)
        coords, _, _, _, _, confidence, _, pkt_coords = self._dock(
            batch, compound_out, protein_out, idx, mask,
            jnp.asarray(True), deterministic)
        return coords, pkt_coords, idx, mask, confidence, overflow

    def inference_from_pocket(self, batch, pocket,
                              center_override: Optional[Array] = None,
                              deterministic: bool = True
                              ) -> Tuple[Array, Array]:
        """Predicted-pocket docking from a precomputed pocket stage (see
        `_infer_from_pocket`). Returns (coords [B,Nc,3], confidence [B])."""
        coords, _, _, _, confidence, _ = self._infer_from_pocket(
            batch, pocket, center_override, deterministic)
        return coords, confidence

    def inference(self, batch, center_override: Optional[Array] = None,
                  deterministic: bool = True) -> Tuple[Array, Array]:
        """Predicted-pocket inference (model.py:371-580).

        center_override feeds host-side DBSCAN cluster centers (FABind+
        sampling, model.py:482-502). Returns (coords [B,Nc,3], confidence [B]).
        """
        coords, _, _, _, confidence, _ = self._infer(
            batch, center_override, deterministic)
        return coords, confidence

    def inference_diag(self, batch, center_override: Optional[Array] = None,
                       deterministic: bool = True
                       ) -> Tuple[Array, Array, Array]:
        """`inference` + per-sample diagnostics: also returns
        pocket_overflow [B] — how many predicted-keep residues were dropped
        by the Np pocket bucket (serving surfaces this so callers can
        re-dock with a larger bucket; see DESIGN.md 'scale-dependent
        hazard')."""
        coords, _, _, _, confidence, overflow = self._infer(
            batch, center_override, deterministic)
        return coords, confidence, overflow

    def inference_flexible(self, batch,
                           center_override: Optional[Array] = None,
                           deterministic: bool = True
                           ) -> Tuple[Array, Array, Array, Array, Array]:
        """`inference` variant that also returns the docked pocket
        conformation — the FABFlex-style blind flexible-docking output
        (FABFlex is linked from FABind/README.md:55-71; no code in the
        reference snapshot). With config.flexible_docking the pocket residue
        coordinates move with the ligand during recycling; rigid configs
        return the input pocket unchanged.

        Returns (lig_coords [B,Nc,3], pkt_coords [B,Np,3], pkt_idx [B,Np],
        pkt_mask [B,Np], confidence [B])."""
        coords, pkt_coords, idx, mask, confidence, _ = self._infer(
            batch, center_override, deterministic)
        return coords, pkt_coords, idx, mask, confidence

    def inference_flexible_diag(self, batch,
                                center_override: Optional[Array] = None,
                                deterministic: bool = True):
        """`inference_flexible` + pocket_overflow [B] (see inference_diag)."""
        return self._infer(batch, center_override, deterministic)


def make_model(cfg) -> FABind:
    """cfg: FABindConfig."""
    return FABind(cfg.model, cfg.shapes)
