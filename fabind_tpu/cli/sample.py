"""FABind+ sampling inference: N stochastic poses per complex, best by
confidence.

Counterpart of FABind_plus/fabind/inference_sampling_fabind.py /
test_sampling_fabind.py: dropout stays ON at inference
(inference_sampling_fabind.py:148-154), pocket centers are optionally
resampled by host-side DBSCAN clustering of positive residues
(model.py:482-502), and the pose with the highest confidence wins
(:204-210).

TPU design: the two jitted halves are split around the host DBSCAN callback —
pocket prediction once per complex, then sample_size stochastic docking
passes (batched over complexes); no recompilation between samples.
"""
from __future__ import annotations

import argparse
import json
from typing import Optional

import numpy as np


def dbscan_cluster_centers(cls_probs: np.ndarray, coords: np.ndarray,
                           mask: np.ndarray, eps: float, min_samples: int,
                           choose_prob: float, default_centers: np.ndarray,
                           rng: np.random.RandomState) -> np.ndarray:
    """Host-side DBSCAN pocket-center sampling (FABind_plus model.py:147-167):
    cluster positive residues (top-50 fallback), pick a random cluster with
    prob choose_prob, else keep the default center."""
    from sklearn.cluster import DBSCAN
    B = cls_probs.shape[0]
    centers = default_centers.copy()
    for b in range(B):
        p = cls_probs[b]
        valid = mask[b]
        pos = (p > 0.5) & valid
        if pos.sum() < 50:
            order = np.argsort(np.where(valid, p, -np.inf))[-50:]
            pos = np.zeros_like(pos)
            pos[order] = True
            pos &= valid
        pts = coords[b][pos]
        if len(pts) == 0:
            continue
        labels = DBSCAN(eps=eps, min_samples=min_samples).fit(pts).labels_
        if labels.max() < 0:
            continue
        cid = rng.randint(0, labels.max() + 1)
        if rng.rand() < choose_prob:
            centers[b] = pts[labels == cid].mean(axis=0)
    return centers


def _pocket_half_impl(model, params, batch):
    return model.apply({"params": params}, batch,
                       method="_pocket_pred", deterministic=True)


def _dock_half_impl(model, params, batch, center, key):
    def run(mdl, batch, center):
        return mdl.inference(batch, center_override=center,
                             deterministic=False)
    return model.apply({"params": params}, batch, center,
                       method=run, rngs={"dropout": key, "sample": key})


# NOTE (round-4 measured dead end): chunking K passes into one dispatch
# via lax.map over [K, ...] centers/keys was built and MEASURED SLOWER on
# the chip (best-of-40: 0.74 c/s vs 0.85 for per-pass dispatch at K=8) —
# scan serializes the passes inside one executable, losing the
# cross-dispatch pipelining the async per-pass loop gets for free, and
# each new sample_size below K forces an extra compile. Per-pass dispatch
# with on-device accumulation is the fastest structure here (DESIGN.md
# round-4 sampling notes).


import threading
from collections import OrderedDict

_JITTED: "OrderedDict" = OrderedDict()
_JITTED_MAX = 8  # LRU bound: one entry per live shape bucket is the norm
_JITTED_LOCK = threading.Lock()


def _halves(model, mesh=None):
    """Jitted (pocket_half, dock_half) LRU-cached per (model, mesh) — flax
    modules are frozen dataclasses, so the same model reuses its compiled
    executables across sample_poses calls (one per serving bucket). With a
    1-D dp `mesh`, both halves are dp-sharded like DockingEngine._fn's
    regression path (params replicated, batch + center sharded on their
    leading axis, rng key replicated) so best-of-N sampling scales over a
    TPU slice too. Bounded so long-lived callers cycling models can't grow
    it without limit; locked so concurrent DockingEngine.dock_best_of
    callers can't race the LRU bookkeeping."""
    import jax
    key = (model, mesh)
    with _JITTED_LOCK:
        if key in _JITTED:
            _JITTED.move_to_end(key)
        elif mesh is None:
            _JITTED[key] = (
                jax.jit(lambda p, b, m=model: _pocket_half_impl(m, p, b)),
                jax.jit(lambda p, b, c, k, m=model:
                        _dock_half_impl(m, p, b, c, k)))
        else:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            repl = NamedSharding(mesh, P())
            bsh = NamedSharding(mesh, P("dp"))

            def pocket_dp(p, b, m=model):
                b = jax.lax.with_sharding_constraint(
                    b, jax.tree_util.tree_map(lambda _: bsh, b))
                return _pocket_half_impl(m, p, b)

            def dock_dp(p, b, c, k, m=model):
                b = jax.lax.with_sharding_constraint(
                    b, jax.tree_util.tree_map(lambda _: bsh, b))
                c = jax.lax.with_sharding_constraint(c, bsh)
                return _dock_half_impl(m, p, b, c, k)

            _JITTED[key] = (
                jax.jit(pocket_dp, in_shardings=(repl, bsh)),
                jax.jit(dock_dp, in_shardings=(repl, bsh, bsh, repl)))
        while len(_JITTED) > _JITTED_MAX:
            _JITTED.popitem(last=False)
        return _JITTED[key]


def sample_poses(model, params, batch, cfg, sample_size: int, seed: int = 0,
                 batch_idx: int = 0,
                 use_clustering: Optional[bool] = None,
                 halves=None, mesh=None):
    """Run sample_size stochastic inference passes; returns
    (coords [S, B, Nc, 3], scores [S, B]).

    `halves=(pocket_fn, dock_fn)` substitutes the two compiled halves —
    used by AOT-exported engines (fabind_tpu.aot.ExportedInference
    .sampling_halves), where there is no live flax `model` (pass None).
    `mesh` dp-shards both halves over a 1-D device mesh (see _halves)."""
    import jax
    import jax.numpy as jnp
    from fabind_tpu.ops.gumbel import pocket_center_rounded

    m = cfg.model
    use_clustering = (m.use_clustering if use_clustering is None
                      else use_clustering)
    pocket_half, dock_half = halves if halves is not None \
        else _halves(model, mesh)

    compound_out, protein_out, cls_logits, radius_pred = pocket_half(
        params, batch)
    # f32 casts: under bf16 serving the batch/logits are ml_dtypes.bfloat16,
    # which numpy propagates but sklearn's DBSCAN rejects
    default_center = np.asarray(pocket_center_rounded(
        cls_logits, batch.prot_xyz, batch.prot_mask, m.gs_tau, m.gs_hard),
        np.float32)
    cls_probs = 1.0 / (1.0 + np.exp(-np.asarray(cls_logits, np.float32)))

    import jax
    # fold the batch index into both streams: with a constant seed every
    # loader batch would repeat the same dropout keys and DBSCAN draws,
    # narrowing the sampling distribution the best-of-N benchmark measures
    rng = np.random.RandomState((seed * 1000003 + batch_idx) % (2 ** 31))
    prot_xyz_f32 = (np.asarray(batch.prot_xyz, np.float32)
                    if use_clustering else None)
    prot_mask_np = np.asarray(batch.prot_mask) if use_clustering else None
    # Per-pass dispatch with the host work INTERLEAVED: pass s+1's DBSCAN
    # runs while the device executes pass s (async dispatch), and results
    # stay ON DEVICE until one fetch at the end — fetching per pass blocks
    # every dispatch (measured 0.66 c/s at sample_size 40), precomputing
    # all centers up front serializes DBSCAN against the device (0.73),
    # and a chunked lax.map serializes the passes inside one executable
    # (0.74); this interleaved structure measures 0.85 (DESIGN.md round-4
    # sampling notes).
    all_coords, all_scores = [], []
    for s in range(sample_size):
        center = default_center
        if use_clustering:
            center = dbscan_cluster_centers(
                cls_probs, prot_xyz_f32, prot_mask_np, m.dbscan_eps,
                m.dbscan_min_samples, m.choose_cluster_prob,
                default_center, rng)
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(seed), batch_idx), s)
        coords, conf = dock_half(params, batch, jnp.asarray(center), key)
        all_coords.append(coords)
        all_scores.append(conf)
    all_coords, all_scores = jax.device_get((all_coords, all_scores))
    return (np.stack([np.asarray(c, np.float32) for c in all_coords]),
            np.stack([np.asarray(s, np.float32) for s in all_scores]))


def aggregate_topn(rmsds: np.ndarray, cents: np.ndarray, confs: np.ndarray,
                   topn: int = 1):
    """Best RMSD / centroid distance among each complex's top-N poses by
    confidence (reference test_sampling_fabind.py:165-178; released
    benchmark uses N=1). Inputs are [S, n] over S sample epochs."""
    order = np.argsort(-confs, axis=0)[:topn]               # [N, n]
    best_rmsd = np.min(np.take_along_axis(rmsds, order, 0), axis=0)
    best_cent = np.min(np.take_along_axis(cents, order, 0), axis=0)
    return best_rmsd, best_cent


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="fabind_plus_sampling")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--sample-size", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--dp", type=int, default=1,
                   help="shard each sampling batch over a 1-D device mesh "
                        "of this size (batch-size must divide evenly)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--topn", type=int, default=1,
                   help="aggregate best RMSD among the top-N poses by "
                        "confidence (test_sampling_fabind.py:165-178, N=1)")
    p.add_argument("--save-rmsd-dir", default=None,
                   help="write per-sample-epoch 'pdb rmsd centroid "
                        "confidence' lines as epoch{i}_confidence.txt "
                        "(the reference benchmark's aggregation inputs)")
    p.add_argument("--symmetric-rmsd", action="store_true",
                   help="symmetry-corrected RMSD over the full ligand "
                        "automorphism group (the FABind+ eval protocol, "
                        "utils/training.py:273-289 via spyrmsd)")
    p.add_argument("--out", default=None)
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="config override (any ModelConfig/ShapeConfig/"
                        "TrainConfig field)")
    args = p.parse_args(argv)

    import os

    import jax
    import jax.numpy as jnp
    from fabind_tpu.config import preset
    from fabind_tpu.data.dataset import Loader
    from fabind_tpu.data.types import dummy_batch
    from fabind_tpu.models.fabind import make_model
    from fabind_tpu.utils.metrics import (centroid_distance, ligand_rmsd,
                                          summarize_rmsd, symmetric_rmsd)

    from fabind_tpu.config import parse_overrides
    cfg = preset(args.preset, **parse_overrides(args.set))
    model = make_model(cfg)
    k = jax.random.PRNGKey(0)
    tmpl = dummy_batch(cfg.shapes, batch_size=1,
                       feat_dim=cfg.model.compound_feat_dim,
                       prot_feat_dim=cfg.model.protein_feat_dim)
    variables = jax.jit(lambda: model.init(
        {"params": k, "dropout": k, "sample": k}, tmpl, train=False,
        stage=2))()
    from fabind_tpu.train import checkpoints
    params, _ = checkpoints.load_params(args.ckpt, variables["params"],
                                        verbose=False)

    from fabind_tpu.data.dataset import open_source
    source, indices = open_source(args.data, variant="fabind_plus",
                                  split=args.split,
                                  use_esm2_feat=cfg.model.use_esm2_feat)
    loader = Loader(source, indices, cfg, group=args.split,
                    batch_size=args.batch_size, workers=8, prefetch_depth=2)

    mesh = None
    if args.dp > 1:
        from fabind_tpu.parallel.mesh import make_mesh
        assert args.batch_size % args.dp == 0, \
            f"batch-size {args.batch_size} not divisible by dp {args.dp}"
        mesh = make_mesh(args.dp)

    # [S, n] per-complex arrays across sample epochs
    rmsds, cents, confs, pdbs = [], [], [], []
    for bi, (batch, meta) in enumerate(loader.epoch(0, with_meta=True)):
        nv = meta["n_valid"]
        coords, scores = sample_poses(model, params, batch, cfg,
                                      args.sample_size, seed=args.seed,
                                      batch_idx=bi, mesh=mesh)
        true = np.asarray(batch.lig_coords)
        mask = np.asarray(batch.lig_mask)
        if args.symmetric_rmsd:
            # full (untruncated) automorphism lists from the loader meta
            r = np.zeros((coords.shape[0], nv))
            for s in range(coords.shape[0]):
                for i in range(nv):
                    nl = int(mask[i].sum())
                    r[s, i] = symmetric_rmsd(coords[s, i, :nl],
                                             true[i, :nl],
                                             meta["iso"][i])
            rmsds.append(r)
        else:
            rmsds.append(np.stack([ligand_rmsd(c, true, mask)[:nv]
                                   for c in coords]))
        cents.append(np.stack([centroid_distance(c, true, mask)[:nv]
                               for c in coords]))
        confs.append(scores[:, :nv])
        pdbs.extend(meta["pdb"])
    rmsds = np.concatenate(rmsds, axis=1)      # [S, n]
    cents = np.concatenate(cents, axis=1)
    confs = np.concatenate(confs, axis=1)

    if args.save_rmsd_dir:
        os.makedirs(args.save_rmsd_dir, exist_ok=True)
        for s in range(rmsds.shape[0]):
            path = os.path.join(args.save_rmsd_dir,
                                f"epoch{s}_confidence.txt")
            with open(path, "w") as f:
                for i, pdb in enumerate(pdbs):
                    f.write(f"{pdb} {rmsds[s, i]:.6f} {cents[s, i]:.6f} "
                            f"{confs[s, i]:.6f}\n")

    best_rmsd, best_cent = aggregate_topn(rmsds, cents, confs, args.topn)
    metrics = summarize_rmsd(best_rmsd)
    metrics.update(summarize_rmsd(best_cent, prefix="centroid_dis"))
    metrics["n"] = int(rmsds.shape[1])
    metrics["sample_size"] = int(rmsds.shape[0])
    print(json.dumps(metrics, indent=2))
    if args.out:
        json.dump(metrics, open(args.out, "w"), indent=2)


if __name__ == "__main__":
    main()
