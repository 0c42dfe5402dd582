"""Loss stack for FABind training.

Reproduces the reference losses (FABind/fabind/main_fabind.py:398-417;
FABind_plus/fabind/utils/training.py:59-97) on masked dense tensors. All
reductions are masked means over valid elements, matching the reference's
flattened valid-only tensors with 'mean' reduction. The pocket-cls BCE
reproduces the reference's padded-grid computation + numel/valid rescale
(main_fabind.py:398) exactly when legacy_padded_bce is set: gradients are
identical either way (padded logits are mask-multiplied), only the reported
constant offset differs.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fabind_tpu.config import ModelConfig, TrainConfig
from fabind_tpu.ops import geometry

Array = jax.Array


def smooth_l1(pred: Array, target: Array, beta: float = 1.0) -> Array:
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def huber(pred: Array, target: Array, delta: float) -> Array:
    d = jnp.abs(pred - target)
    return jnp.where(d < delta, 0.5 * d * d, delta * (d - 0.5 * delta))


def bce_with_logits(logits: Array, labels: Array) -> Array:
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


# single masked-mean implementation for the whole loss/geometry stack
# (identical zero-denominator behavior: empty mask -> 0)
masked_mean = geometry.masked_mean


def coord_criterion(name: str):
    if name == "SmoothL1":
        return smooth_l1
    if name == "MSE":
        return lambda p, t: (p - t) ** 2
    raise ValueError(name)


def permutation_coord_loss(pred: Array, gt: Array, lig_mask: Array,
                           isomorphisms: Optional[Array],
                           iso_mask: Optional[Array], crit) -> Array:
    """Permutation-invariant coordinate loss
    (FABind_plus/fabind/utils/permutation_loss.py:4-38): pick, per sample and
    without gradient, the ligand-graph automorphism minimizing the coord loss,
    then apply the criterion through that permutation.

    isomorphisms: [B, n_iso, Nc] permutations of PREDICTED atoms; invalid
    rows (iso_mask False) are identity copies.
    """
    if isomorphisms is None:
        return _plain(pred, gt, lig_mask, crit)
    # gather pred under each permutation: [B, I, Nc, 3]
    perm_pred = jax.vmap(lambda p, iso: p[iso])(pred, isomorphisms)
    per_atom = crit(perm_pred, gt[:, None]).mean(-1)          # [B, I, Nc]
    m = lig_mask[:, None, :].astype(per_atom.dtype)
    per_iso = jnp.sum(per_atom * m, axis=-1) / jnp.maximum(jnp.sum(m, -1), 1.0)
    per_iso = jnp.where(iso_mask, per_iso, jnp.inf)
    best = jnp.argmin(jax.lax.stop_gradient(per_iso), axis=1)  # [B]
    best_iso = jnp.take_along_axis(
        isomorphisms, best[:, None, None], axis=1)[:, 0]       # [B, Nc]
    pred_best = jax.vmap(lambda p, iso: p[iso])(pred, best_iso)
    return _plain(pred_best, gt, lig_mask, crit)


def _plain(pred, gt, lig_mask, crit):
    per = crit(pred, gt)                                       # [B, Nc, 3]
    return masked_mean(per.mean(-1), lig_mask)


def fabind_losses(out, batch, mcfg: ModelConfig, tcfg: TrainConfig
                  ) -> Tuple[Array, Dict[str, Array]]:
    """Total training loss + metrics dict.

    out: FABindOutput; batch: FABindBatch.
    """
    crit = coord_criterion(tcfg.coord_loss_function)

    # ---- row validity: trailing-batch padding duplicates get zero weight
    # in every loss term and metric (the loader repeats the last sample to
    # fill the fixed batch; types.py sample_valid marks the copies) ----
    if batch.sample_valid is not None:
        sv = batch.sample_valid.astype(bool)
    else:
        sv = jnp.ones(batch.lig_feat.shape[0], bool)
    svf = sv.astype(jnp.float32)

    def row_mean(x):
        return jnp.sum(x * svf) / jnp.maximum(jnp.sum(svf), 1.0)

    out = dataclasses.replace(
        out,
        lig_mask=out.lig_mask & sv[:, None],
        pair_valid=out.pair_valid & sv[:, None, None],
        prot_mask=out.prot_mask & sv[:, None],
        pkt_mask=out.pkt_mask & sv[:, None],
    )

    # ---- ligand coordinate loss ----
    if tcfg.permutation_invariant and batch.isomorphisms is not None:
        com_coord_loss = permutation_coord_loss(
            out.coords, batch.lig_coords, out.lig_mask,
            batch.isomorphisms, batch.iso_mask, crit)
    else:
        com_coord_loss = _plain(out.coords, batch.lig_coords, out.lig_mask,
                                crit)
    com_coord_loss = tcfg.coord_loss_weight * com_coord_loss

    # ---- distance-map losses (MSE, main_fabind.py:254: criterion=MSELoss) ----
    pv = out.pair_valid
    contact_loss = masked_mean((out.y_pred - out.dis_map_target) ** 2, pv)
    contact_by_pred = masked_mean(
        (out.y_pred_by_coord - out.dis_map_target) ** 2, pv)
    contact_distill = masked_mean(
        (out.y_pred_by_coord - out.y_pred) ** 2, pv)
    w = tcfg.pair_distance_loss_weight
    wd = tcfg.pair_distance_distill_loss_weight
    if tcfg.dismap_choice == "wodm":
        contact_loss = jnp.zeros(())
        contact_distill = jnp.zeros(())
        dismap_total = w * contact_by_pred
    else:
        # 'npair' (the reference default) and 'ori' train identically: the
        # reference's loop only special-cases 'wodm'
        # (FABind_plus/fabind/utils/training.py:64-69,88-97), so this shared
        # branch is reference-exact for both.
        dismap_total = w * contact_loss + w * contact_by_pred + wd * contact_distill

    # ---- pocket classification ----
    bce = bce_with_logits(out.pocket_cls_logits,
                          out.pocket_cls_label) * svf[:, None]
    valid = jnp.sum(out.prot_mask)
    if tcfg.legacy_padded_bce:
        # reference computes mean over the padded grid then rescales by
        # numel/valid (main_fabind.py:398) == sum over grid / valid
        pocket_cls_loss = jnp.sum(bce) / jnp.maximum(valid, 1.0)
    else:
        pocket_cls_loss = masked_mean(bce, out.prot_mask)
    pocket_cls_loss = tcfg.pocket_cls_loss_weight * pocket_cls_loss

    # ---- pocket center (Huber, delta=pocket_coord_huber_delta) ----
    pocket_coord_loss = tcfg.pocket_distance_loss_weight * row_mean(
        huber(out.pred_pocket_center, batch.coords_center,
              tcfg.pocket_coord_huber_delta).mean(-1))

    # ---- pocket radius (FABind+, training.py:71-74) ----
    radius_loss = jnp.zeros(())
    if mcfg.is_plus and not mcfg.force_fix_radius:
        radius_loss = tcfg.pocket_radius_loss_weight * row_mean(
            huber(out.pocket_radius_pred, batch.ligand_radius,
                  tcfg.pocket_coord_huber_delta))

    # ---- flexible-docking pocket coordinates (FABFlex-style) ----
    # supervise the docked pocket conformation against the dataset's pocket
    # coords (holo self-consistency; a source providing a distinct apo input
    # makes this true apo->holo supervision)
    flex_pocket_loss = jnp.zeros(())
    if mcfg.flexible_docking:
        gt_pkt = jax.vmap(lambda xyz, idx: xyz[idx])(batch.prot_xyz,
                                                     out.pkt_idx)
        per = crit(out.pocket_coords, gt_pkt).mean(-1)
        flex_pocket_loss = (tcfg.flex_pocket_coord_loss_weight *
                            masked_mean(per, out.pkt_mask))

    total = (com_coord_loss + dismap_total + pocket_cls_loss +
             pocket_coord_loss + radius_loss + flex_pocket_loss)

    # metrics mirroring the reference epoch stats (main_fabind.py:404-417)
    coords = jax.lax.stop_gradient(out.coords)
    rmsd = geometry.rmsd(coords, batch.lig_coords, out.lig_mask)
    centroid = geometry.centroid_dist(coords, batch.lig_coords, out.lig_mask)

    metrics = {
        "loss": total,
        "com_coord_loss": com_coord_loss,
        "contact_loss": contact_loss,
        "contact_by_pred_loss": contact_by_pred,
        "contact_distill_loss": contact_distill,
        "pocket_cls_loss": pocket_cls_loss,
        "pocket_coord_loss": pocket_coord_loss,
        "pocket_radius_loss": radius_loss,
        "flex_pocket_coord_loss": flex_pocket_loss,
        "rmsd_mean": row_mean(rmsd),
        "rmsd_lt2": row_mean((rmsd < 2.0).astype(jnp.float32)),
        "rmsd_lt5": row_mean((rmsd < 5.0).astype(jnp.float32)),
        "centroid_dis_mean": row_mean(centroid),
        "use_stage2": out.use_stage2.astype(jnp.float32),
        # counters, not means — but padding duplicates must not inflate
        # them, and on base-variant steps that gated INTO the GT pocket
        # (use_stage2 false) the predicted-crop candidate was computed but
        # never docked, so reporting its overflow would point an operator
        # at a bucket overflow with zero effect on the step
        "keep_less_5": jnp.sum(out.keep_less_5.astype(jnp.float32) * svf
                               * out.use_stage2.astype(jnp.float32)),
        "pocket_overflow": jnp.sum(
            out.pocket_overflow.astype(jnp.float32) * svf
            * out.use_stage2.astype(jnp.float32)),
    }
    return total, metrics


def confidence_ranking_loss(scores: Array, rmsds: Array,
                            valid: Optional[Array] = None,
                            loss_type: str = "logsigmoid",
                            keep_cls_2a: bool = False,
                            groups: Optional[Array] = None) -> Array:
    """Pairwise ranking loss over a set of scored poses
    (FABind_plus/fabind/utils/training_confidence.py:50-77).

    The reference trains confidence with a MANDATORY batch_size of 1
    (train_confidence.py:218) whose batch is num_copies host-side duplicates
    of ONE complex (confidence_dataloader.py:27-39), so every ranking pair
    it ever forms is within a single complex. `groups` reproduces that
    protocol under real batching: entries pair only within their group
    (= complex), each group's pair sum is normalized by its own pair count
    (training_confidence.py:67 divides by n*(n-1)/2 per step), and the
    per-group losses are averaged — exactly the mean of reference steps.

    With groups=None the pair set is GLOBAL over the flat batch — a
    documented extension, NOT the reference protocol: cross-complex pairs
    train an absolute pose-quality scale across complexes, which the
    reference's bs=1 loop never does.

    scores/rmsds: [n]; lower rmsd should score higher. valid [n] masks
    padding entries (the reference has none; trailing-batch duplicates here
    must not pair). Equal-rmsd pairs ARE included, exactly like the
    reference: its loop visits every sorted pair — ties too — and divides
    by the full n*(n-1)/2 (training_confidence.py:56-67). The reference's
    tie orientation is whatever torch.argsort happened to produce; here it
    is pinned to STABLE-sort semantics (the earlier index plays "better"),
    which matches any stable reference execution and is permutation-
    deterministic (tests/test_golden_confidence.py::test_tie_semantics).
    """
    s = scores.astype(jnp.float32)
    r = rmsds.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones(s.shape[0], bool)
    v = valid.astype(bool)
    # pair (i, j) where i plays "better": strictly lower rmsd, or tied with
    # the earlier index (stable-sort orientation). Every unordered valid
    # pair is counted exactly once, so sum(bf) per group IS the reference's
    # n*(n-1)/2 normalizer including ties.
    idx = jnp.arange(s.shape[0])
    better = ((r[:, None] < r[None, :])
              | ((r[:, None] == r[None, :])
                 & (idx[:, None] < idx[None, :])))
    better = better & v[:, None] & v[None, :]
    if groups is not None:
        better = better & (groups[:, None] == groups[None, :])
    bf = better.astype(jnp.float32)
    diff = s[:, None] - s[None, :]                  # score(better)-score(worse)
    if loss_type == "logsigmoid":
        pair_loss = -jax.nn.log_sigmoid(diff) * bf
    elif loss_type == "dynamic_hinge":
        margin = r[None, :] - r[:, None]            # rmsd(worse)-rmsd(better)
        pair_loss = jnp.maximum(0.0, margin - diff) * bf
    else:
        raise ValueError(loss_type)
    if groups is None:
        loss = jnp.sum(pair_loss) / jnp.maximum(jnp.sum(bf), 1.0)
    else:
        # per-group pair normalization, then mean over groups that formed
        # at least one pair — the mean of reference bs=1 steps
        gid = jnp.unique(groups, size=groups.shape[0], fill_value=-1)
        onehot = (groups[None, :] == gid[:, None]).astype(jnp.float32)  # [G,n]
        g_pairs = jnp.einsum("gi,ij,gj->g", onehot, bf, onehot)
        g_loss = jnp.einsum("gi,ij,gj->g", onehot, pair_loss, onehot)
        has = (g_pairs > 0).astype(jnp.float32)
        loss = jnp.sum(g_loss / jnp.maximum(g_pairs, 1.0) * has) \
            / jnp.maximum(jnp.sum(has), 1.0)
    if keep_cls_2a:
        labels = (r < 2.0).astype(s.dtype)
        vf = v.astype(jnp.float32)
        ce = jnp.sum(bce_with_logits(s, labels) * vf) / jnp.maximum(
            jnp.sum(vf), 1.0)
        loss = loss + ce
    return loss
