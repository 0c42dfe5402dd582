"""Benchmark evaluation driver (PDBbind timesplit test, stage 2).

Counterpart of FABind/fabind/test_fabind.py:20-269 /
FABind_plus/fabind/test_regression_fabind.py — without the hard-coded command
string re-parsing: the preset IS the released config. Supports the
144-complex unseen subset (test_fabind.py:225-231,261-268), optional
post-optimization (fabind_inference.py:373), the FABind+ symmetric-RMSD
protocol (utils/training.py:273-289), per-pdb RMSD dumps
(training.py:394-401) and predicted-pose coordinate dumps (training.py:
420-438; .npz here — SDF writing lives in fabind_tpu.cli.inference where the
mol block is available).

Usage:
  python -m fabind_tpu.cli.evaluate --preset fabind --data /path/pdbbind \
      --ckpt best_model.bin [--split test] [--unseen-index split_pdb_id/unseen_test_index] \
      [--post-optim] [--symmetric-rmsd] [--save-rmsd out.txt] [--write-coords-dir dir]
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="fabind",
                   choices=["fabind", "fabind_plus"])
    p.add_argument("--data", required=True)
    p.add_argument("--ckpt", required=True,
                   help=".bin (torch, auto-converted) or orbax dir")
    p.add_argument("--split", default="test", choices=["valid", "test"])
    p.add_argument("--unseen-index", default=None,
                   help="file of pdb ids (one per line) to restrict the "
                        "split to, e.g. FABind/split_pdb_id/unseen_test_index")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="config override, e.g. --set max_ligand=32 (any "
                        "ModelConfig/ShapeConfig/TrainConfig field)")
    p.add_argument("--stage", type=int, default=2)
    p.add_argument("--post-optim", action="store_true",
                   help="LAS-constraint pose refinement on the predictions")
    p.add_argument("--post-optim-steps", type=int, default=1000)
    p.add_argument("--distmap-dock", action="store_true",
                   help="legacy TankBind-style docking: DISCARD the coord "
                        "head's pose and re-derive coords by optimizing "
                        "against the predicted distance map + LAS "
                        "constraints (generation_utils.py:42-120)")
    p.add_argument("--distmap-repeats", type=int, default=1,
                   help="random restarts per complex; best final loss wins")
    p.add_argument("--distmap-steps", type=int, default=5000)
    p.add_argument("--symmetric-rmsd", action="store_true",
                   help="symmetry-corrected RMSD over ligand automorphisms "
                        "(FABind+ eval protocol)")
    p.add_argument("--save-rmsd", default=None,
                   help="write per-pdb RMSD lines here")
    p.add_argument("--write-coords-dir", default=None,
                   help="write predicted pose coords per pdb ({pdb}.npz)")
    p.add_argument("--buckets", default=None,
                   help="comma list of shape buckets 'lig:pocket:protein' "
                        "(small->large); each complex runs in the smallest "
                        "bucket it fits — one jit specialization per bucket "
                        "instead of padding everything to the maximum. "
                        "'auto' (or 'auto:K') measures the split's size "
                        "distribution and infers up to K (default 3) buckets")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the eval loop")
    p.add_argument("--workers", type=int, default=8,
                   help="host featurization threads (0 = inline)")
    p.add_argument("--prefetch", type=int, default=2,
                   help="batches buffered ahead of the device (0 = off)")
    p.add_argument("--out", default=None, help="write metrics JSON here")
    args = p.parse_args(argv)

    from fabind_tpu.config import preset
    from fabind_tpu.data.dataset import Loader, NPZSource
    from fabind_tpu.models.fabind import make_model
    from fabind_tpu.postopt import post_optimize_batch_jit
    from fabind_tpu.train import checkpoints
    from fabind_tpu.utils.metrics import MetricAccumulator
    from fabind_tpu.data.types import dummy_batch

    from fabind_tpu.config import parse_overrides
    overrides = parse_overrides(args.set)
    # --set may legitimately carry batch_size; the flag is only a default
    overrides.setdefault("batch_size", args.batch_size)
    cfg = preset(args.preset, **overrides)
    model = make_model(cfg)

    # init a template (feature dims from the config — non-default for
    # use_esm2_feat=False / esm2_concat_raw), then load weights
    tmpl_batch = dummy_batch(cfg.shapes, batch_size=1,
                             feat_dim=cfg.model.compound_feat_dim,
                             prot_feat_dim=cfg.model.protein_feat_dim)
    k = jax.random.PRNGKey(0)
    variables = jax.jit(lambda b: model.init(
        {"params": k, "dropout": k, "sample": k}, b, train=False,
        stage=2))(tmpl_batch)
    params, _ = checkpoints.load_params(args.ckpt, variables["params"])

    from fabind_tpu.data.dataset import open_source
    source, indices = open_source(args.data, variant=args.preset,
                                  split=args.split,
                                  use_esm2_feat=cfg.model.use_esm2_feat)
    if args.unseen_index:
        with open(args.unseen_index) as f:
            wanted = {line.strip() for line in f if line.strip()}
        if isinstance(source, NPZSource):
            # NPZ sample names ARE the pdb ids (cli.preprocess names them so)
            indices = [n for n in indices if n in wanted]
        else:
            pdb_col = source.index["pdb"] if "pdb" in source.index else \
                source.index["compound_name"]
            indices = [i for i in indices if str(pdb_col.iloc[i]) in wanted]
            # reference double-checks the selection (test_fabind.py:228-230)
            assert all(str(pdb_col.iloc[i]) in wanted for i in indices)
        if not indices:
            raise SystemExit(f"--unseen-index {args.unseen_index}: no ids "
                             f"from the file are present in {args.data}")
        print(f"unseen subset: {len(indices)} of {len(wanted)} ids present")
    from fabind_tpu.data.buckets import resolve_buckets
    buckets = resolve_buckets(args.buckets, cfg, source, indices,
                              group=args.split)
    if buckets is not None:
        print("buckets:", [(s.max_ligand, s.max_pocket, s.max_protein)
                           for s in buckets])
    loader = Loader(source, indices, cfg, group=args.split,
                    batch_size=cfg.train.batch_size, buckets=buckets,
                    workers=args.workers, prefetch_depth=args.prefetch)

    # one model + jitted step per shape bucket (params are shape-independent)
    steps = {}

    def eval_step(params, batch, bucket_cfg):
        key = id(bucket_cfg)
        if key not in steps:
            m = make_model(bucket_cfg)
            steps[key] = jax.jit(
                lambda p, b: m.apply({"params": p}, b, train=False,
                                     stage=args.stage))
        return steps[key](params, batch)

    acc = MetricAccumulator(symmetric=args.symmetric_rmsd)
    if args.write_coords_dir:
        os.makedirs(args.write_coords_dir, exist_ok=True)
    t0 = time.time()
    n = 0
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    for batch, meta in loader.epoch(0, with_meta=True):
        out = eval_step(params, batch, meta["cfg"])
        if args.distmap_dock:
            from fabind_tpu.postopt import distance_dock_best_of_jit
            coords, _, _ = distance_dock_best_of_jit(
                out.y_pred, out.pocket_coords, batch.lig_rdkit_coords,
                batch.las_adj, batch.lig_mask, out.pkt_mask,
                jax.random.PRNGKey(n), n_repeat=args.distmap_repeats,
                steps=args.distmap_steps,
                dis_thres=float(cfg.model.dis_map_thres))
            out = out.replace(coords=coords)
        if args.post_optim:
            coords, _ = post_optimize_batch_jit(
                out.coords, batch.lig_rdkit_coords, batch.las_adj,
                batch.lig_mask, steps=args.post_optim_steps)
            out = out.replace(coords=coords)
        out = jax.device_get(out)
        acc.update(out, batch, pdbs=meta["pdb"],
                   isomorphisms=meta.get("iso"))
        if args.write_coords_dir:
            lm = np.asarray(out.lig_mask)
            for i, pdb in enumerate(meta["pdb"]):
                nl = int(lm[i].sum())
                np.savez(os.path.join(args.write_coords_dir, f"{pdb}.npz"),
                         pred_coords=np.asarray(out.coords)[i, :nl])
        n += meta["n_valid"]
    if args.profile_dir:
        jax.profiler.stop_trace()
        print(f"profiler trace -> {args.profile_dir}")
    dt = time.time() - t0
    metrics = acc.summarize()
    metrics["complexes_per_sec"] = n / dt
    metrics["n_dropped_oversize"] = loader.n_dropped
    if args.save_rmsd:
        acc.dump_per_pdb(args.save_rmsd)
    print(json.dumps(metrics, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
