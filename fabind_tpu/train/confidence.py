"""FABind+ confidence-model training.

Reproduces FABind_plus/fabind/train_confidence.py +
utils/training_confidence.py:13-349: the regression checkpoint is frozen
except the confidence head (`ranking_*` params, train_confidence.py:163-166);
each complex is duplicated num_copies times (confidence_dataloader.py:27-39)
and run through the *stochastic* forward (dropout active at inference —
sampling mode); a pairwise ranking loss orders the duplicated batch by
plain (non-symmetric) RMSD (training_confidence.py:41-67).

Protocol note: the reference HARD-ASSERTS batch_size == 1 for confidence
training (train_confidence.py:218), so its "batch" is num_copies copies of
ONE complex and every ranking pair it forms is within-complex; its
ranking_accuracy and hit metrics (training_confidence.py:64,77-79) are
likewise within-complex. cfg.train.ranking_pair_scope selects:
  - "within" (default — the reference protocol): pairs restricted to each
    complex's copies, per-complex pair normalization, mean over complexes —
    exactly the mean of reference bs=1 steps (goldened in
    tests/test_golden_confidence.py against the reference's
    train_one_epoch executed in place).
  - "global" (extension, NOT the reference protocol): pairs over the whole
    flattened copies x complexes set — cross-complex pairs train an
    absolute pose-quality scale. Useful when within-complex pose diversity
    is too small to rank (see tools/confidence_decodability_probe.py).

TPU design: instead of batch_size=1 with host-side copy duplication, copies
live on a leading axis folded into the batch: [B, num_copies, ...] with the
model vmapped over copies — every copy of every complex runs in one jit.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from fabind_tpu.config import FABindConfig
from fabind_tpu.train.losses import confidence_ranking_loss

Array = jax.Array


def confidence_param_labels(params: Any) -> Any:
    """'train' for confidence head params, 'freeze' for the rest
    (train_confidence.py:163-166: requires_grad only for ranking*/confidence*)."""
    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return "train" if top.startswith(("ranking", "confidence")) else "freeze"
    return jax.tree_util.tree_map_with_path(label, params)


def build_confidence_optimizer(cfg: FABindConfig, params: Any):
    tx = optax.multi_transform(
        {"train": optax.adam(cfg.train.lr),
         "freeze": optax.set_to_zero()},
        confidence_param_labels(params))
    return tx


def _copies_teacher(model, n_copies):
    """[C]-stacked teacher-forced stochastic forwards: copies differ through
    dropout noise only, exactly like the reference's deep-copied batch under
    model.train() (training_confidence.py:38)."""
    def gen(params, batch, key, _init, _centers):
        def one_copy(k):
            dk, sk = jax.random.split(k)
            out = model.apply(
                {"params": params}, batch, train=True,
                rngs={"dropout": dk, "sample": sk})
            return out.coords, out.confidence
        keys = jax.random.split(key, n_copies)
        return jax.lax.map(one_copy, keys)
    return gen


def _copies_inference(model, n_copies):
    """[C]-stacked stochastic INFERENCE passes — the deployment pose
    population the head must rank (cli/sample.py sample_poses): per-copy
    randomized ligand init coords [C, B, Nc, 3] and per-copy pocket-center
    overrides [C, B, 3] (host-sampled, see sample_copy_inputs), dropout on
    through the full predicted-pocket forward. This is the scale-capable
    training source: unlike dropout-only teacher copies, the RMSD spread
    across copies is real (center/torsion-driven), so the within-complex
    ranking signal exists (round-4 verdict item 1)."""
    def gen(params, batch, key, init_coords, centers):
        def one_copy(args):
            k, init_c, center = args
            dk, sk = jax.random.split(k)
            b = batch.replace(lig_coords_init=init_c)
            coords, conf = model.apply(
                {"params": params}, b,
                method=lambda m, bb: m.inference(
                    bb, center_override=center, deterministic=False),
                rngs={"dropout": dk, "sample": sk})
            return coords, conf
        keys = jax.random.split(key, n_copies)
        return jax.lax.map(one_copy, (keys, init_coords, centers))
    return gen


def make_confidence_train_step(model, cfg: FABindConfig, tx,
                               pose_source: str = "teacher"):
    """One step over a batch of complexes, each with num_copies stochastic
    forwards. batch arrays are the standard FABindBatch.

    pose_source:
      - "teacher" (the reference's mechanics): copies are teacher-forced
        train-mode forwards, dropout the only diversity. Step signature
        step(params, opt_state, batch, key).
      - "inference": copies are full stochastic inference passes with
        host-sampled per-copy inits/centers (the deployment distribution).
        Step signature step(params, opt_state, batch, key, init_coords
        [C, B, Nc, 3], centers [C, B, 3]) — build the extra inputs with
        `sample_copy_inputs`.
    """
    n_copies = cfg.train.num_copies
    assert n_copies >= 2, \
        "confidence ranking needs num_copies >= 2 (pairwise loss over copies)"
    assert pose_source in ("teacher", "inference"), pose_source
    gen = (_copies_teacher if pose_source == "teacher"
           else _copies_inference)(model, n_copies)

    def rmsd_per_copy(coords, gt, mask):
        sd = jnp.sum((coords - gt) ** 2, -1)
        m = mask.astype(sd.dtype)
        return jnp.sqrt(jnp.sum(sd * m, -1) / jnp.maximum(jnp.sum(m, -1), 1.0))

    def loss_fn(params, batch, key, init_coords, centers):
        coords, scores = gen(params, batch, key, init_coords,
                             centers)                  # [C, B, ...]
        rmsds = jax.vmap(
            lambda c: rmsd_per_copy(c, batch.lig_coords, batch.lig_mask)
        )(coords)                                       # [C, B]
        # trailing-batch padding duplicates get zero weight (sample_valid)
        if batch.sample_valid is not None:
            svf = batch.sample_valid.astype(jnp.float32)
        else:
            svf = jnp.ones(scores.shape[1], jnp.float32)
        nsv = jnp.maximum(jnp.sum(svf), 1.0)
        # ranking over the flattened copies x complexes set; pair scope per
        # cfg.train.ranking_pair_scope — "within" restricts pairs to each
        # complex's copies (the reference's mandatory-bs=1 protocol,
        # train_confidence.py:218), "global" includes cross-complex pairs
        # (extension; see module docstring)
        flat_s = scores.reshape(-1)
        flat_r = rmsds.reshape(-1)
        flat_v = jnp.broadcast_to(svf[None, :], scores.shape).reshape(-1) > 0
        scope = cfg.train.ranking_pair_scope
        if scope == "within":
            grp = jnp.broadcast_to(
                jnp.arange(scores.shape[1])[None, :], scores.shape
            ).reshape(-1)
        elif scope == "global":
            grp = None
        else:
            raise ValueError(f"ranking_pair_scope: {scope!r}")
        loss = confidence_ranking_loss(
            flat_s, jax.lax.stop_gradient(flat_r), valid=flat_v,
            loss_type=cfg.train.ranking_loss,
            keep_cls_2a=cfg.train.keep_cls_2A, groups=grp)
        # pair accuracy over the GLOBAL pair set (cross-complex included) —
        # the extension scope's training metric
        fb = ((flat_r[:, None] < flat_r[None, :])
              & flat_v[:, None] & flat_v[None, :])
        fbf = fb.astype(jnp.float32)
        acc_global = (jnp.sum((flat_s[:, None] > flat_s[None, :]) * fbf)
                      / jnp.maximum(jnp.sum(fbf), 1.0))
        # per-complex metrics — at bs=1 these ARE the reference's metrics:
        # its ranking_accuracy (training_confidence.py:64) and hit
        # (training_confidence.py:77-79, score of the min-RMSD copy beats
        # all other copies of the SAME complex; chance 1/n_copies) are both
        # within-complex because every reference batch is one complex.
        # hit is also what best-of-N selection at inference relies on.
        def pair_metrics(s, r):
            order = jnp.argsort(r)
            ss = s[order]
            i = jnp.arange(n_copies)
            upper = i[None, :] > i[:, None]            # j(better) < i(worse)
            correct = (ss[:, None] > ss[None, :]) & upper  # [better, worse]
            acc = jnp.sum(correct) / jnp.maximum(jnp.sum(upper), 1)
            hit = ss[0] > jnp.max(ss[1:])
            return acc, hit
        accs, hits = jax.vmap(pair_metrics, in_axes=(1, 1))(scores, rmsds)
        best_by_score = jnp.argmax(scores, axis=0)      # [B]
        best_rmsd = jnp.min(rmsds, axis=0)
        chosen_rmsd = jnp.take_along_axis(
            rmsds, best_by_score[None], axis=0)[0]
        acc_within = jnp.sum(accs.astype(jnp.float32) * svf) / nsv
        metrics = {
            "confidence_loss": loss,
            # the protocol metric for the configured scope; both scopes'
            # accuracies are always reported alongside
            "ranking_accuracy": (acc_within if scope == "within"
                                 else acc_global),
            "ranking_accuracy_global": acc_global,
            "ranking_accuracy_within": acc_within,
            "hit_rate": jnp.sum(hits.astype(jnp.float32) * svf) / nsv,
            "chosen_rmsd_lt2": jnp.sum(
                (chosen_rmsd < 2).astype(jnp.float32) * svf) / nsv,
            "best_rmsd_lt2": jnp.sum(
                (best_rmsd < 2).astype(jnp.float32) * svf) / nsv,
        }
        return loss, metrics

    def _split(params):
        head = {k: v for k, v in params.items()
                if k.startswith(("ranking", "confidence"))}
        trunk = {k: v for k, v in params.items() if k not in head}
        return head, trunk

    @jax.jit
    def _step(params, opt_state, batch, key, init_coords, centers):
        # differentiate w.r.t. the HEAD params only: the trunk is frozen
        # (reference sets requires_grad=False, train_confidence.py:163-166)
        # and the head consumes the trunk's pooled embedding at the end of
        # the forward, so grad-through-head never needs the trunk backward —
        # XLA drops it entirely instead of computing C copies of full-model
        # gradients that set_to_zero would discard
        head, trunk = _split(params)
        (loss, metrics), hgrads = jax.value_and_grad(
            lambda h: loss_fn({**trunk, **h}, batch, key, init_coords,
                              centers),
            has_aux=True)(head)
        grads = {**jax.tree_util.tree_map(jnp.zeros_like, trunk), **hgrads}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if pose_source == "teacher":
        def step(params, opt_state, batch, key):
            return _step(params, opt_state, batch, key, None, None)
        return step
    return _step


def randomized_init_copies(batch, n_copies: int,
                           rng: "np.random.RandomState") -> "np.ndarray":
    """[C, B, Nc, 3] per-copy ligand init coords: every rotatable-bond
    torsion randomized + a uniform random rigid rotation about the init
    centroid (serve.dock_sdf randomize_init semantics, RDKit-free via
    data/torsion.py — reference utils.py:280-299 + 307-311). Bond edges are
    reconstructed from the batch's top-K bond table. Host-side numpy."""
    import numpy as np

    from fabind_tpu.data.batching import uniform_random_rotation
    from fabind_tpu.data.torsion import randomize_torsions

    init = np.asarray(batch.lig_coords_init, np.float32)
    mask = np.asarray(batch.lig_mask).astype(bool)
    bond_idx = np.asarray(batch.bond_idx)
    bond_mask = np.asarray(batch.bond_mask).astype(bool)
    C, (B, Nc, _) = n_copies, init.shape
    out = np.tile(init[None], (C, 1, 1, 1))
    for b in range(B):
        n = int(mask[b].sum())
        if n < 2:
            continue
        ii, kk = np.nonzero(bond_mask[b, :n])
        jj = bond_idx[b, :n][bond_mask[b, :n]]
        keep = jj < n
        edges = np.unique(np.sort(np.stack(
            [ii[keep], jj[keep]], axis=1), axis=1), axis=0)
        c = init[b, :n].mean(0, keepdims=True)
        for s in range(C):
            rand = randomize_torsions(init[b, :n], edges, rng)
            out[s, b, :n] = uniform_random_rotation(rand, rng) + c
    return out


def sample_copy_inputs(model, params, batch, cfg: FABindConfig,
                       n_copies: int, rng: "np.random.RandomState",
                       use_clustering: bool = True):
    """Host-side (init_coords [C, B, Nc, 3], centers [C, B, 3]) for
    pose_source='inference' confidence training/eval: torsion/orientation-
    randomized inits + DBSCAN-cluster-sampled pocket centers — exactly the
    deployment sampling distribution the trained head ranks at inference
    (cli/sample.py sample_poses + serve.dock_sdf randomize_init)."""
    import numpy as np

    from fabind_tpu.cli.sample import (_halves, dbscan_clusters,
                                       pick_cluster_centers)
    from fabind_tpu.ops.gumbel import pocket_center_rounded

    m = cfg.model
    pocket_half, _ = _halves(model)
    _, _, cls_logits, _ = pocket_half(params, batch)
    default_center = np.asarray(pocket_center_rounded(
        cls_logits, batch.prot_xyz, batch.prot_mask, m.gs_tau, m.gs_hard),
        np.float32)
    if use_clustering:
        cls_probs = 1.0 / (1.0 + np.exp(-np.asarray(cls_logits, np.float32)))
        clusters = dbscan_clusters(
            cls_probs, np.asarray(batch.prot_xyz, np.float32),
            np.asarray(batch.prot_mask), m.dbscan_eps, m.dbscan_min_samples)
        centers = np.stack([pick_cluster_centers(
            clusters, m.choose_cluster_prob, default_center, rng)
            for _ in range(n_copies)])
    else:
        centers = np.tile(default_center[None], (n_copies, 1, 1))
    return randomized_init_copies(batch, n_copies, rng), centers


def make_confidence_eval_fn(model, cfg: FABindConfig,
                            pose_source: str = "inference"):
    """Jitted evalf(params, batch, key, init_coords, centers) ->
    (scores [C, B], rmsds [C, B]) over cfg.train.num_copies stochastic
    poses — the raw material for protocol metrics (within ranking accuracy,
    hit rate, best-of-N vs single-pose) measured OUTSIDE the train step, on
    held-out draws or control centers (e.g. the misdocked-pose negative
    control: shifted centers on a large protein)."""
    n_copies = cfg.train.num_copies
    gen = (_copies_teacher if pose_source == "teacher"
           else _copies_inference)(model, n_copies)

    def rmsd_per_copy(coords, gt, mask):
        sd = jnp.sum((coords - gt) ** 2, -1)
        m = mask.astype(sd.dtype)
        return jnp.sqrt(jnp.sum(sd * m, -1) / jnp.maximum(jnp.sum(m, -1), 1.0))

    @jax.jit
    def evalf(params, batch, key, init_coords=None, centers=None):
        coords, scores = gen(params, batch, key, init_coords, centers)
        rmsds = jax.vmap(
            lambda c: rmsd_per_copy(c, batch.lig_coords, batch.lig_mask)
        )(coords)
        return scores, rmsds

    return evalf


def pick_best_by_confidence(coords: Array, scores: Array
                            ) -> Tuple[Array, Array]:
    """Best-of-N selection (inference_sampling_fabind.py:204-210).

    coords: [C, B, Nc, 3]; scores: [C, B] -> ([B, Nc, 3], [B])."""
    best = jnp.argmax(scores, axis=0)
    out = jnp.take_along_axis(coords, best[None, :, None, None], axis=0)[0]
    return out, jnp.max(scores, axis=0)
