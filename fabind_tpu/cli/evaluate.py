"""Benchmark evaluation driver (PDBbind timesplit test, stage 2).

Counterpart of FABind/fabind/test_fabind.py:20-269 /
FABind_plus/fabind/test_regression_fabind.py — without the hard-coded command
string re-parsing: the preset IS the released config.

Usage:
  python -m fabind_tpu.cli.evaluate --preset fabind --data /path/pdbbind \
      --ckpt best_model.bin [--split test] [--unseen-index path]
"""
from __future__ import annotations

import argparse
import json
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
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--stage", type=int, default=2)
    p.add_argument("--post-optim", action="store_true")
    p.add_argument("--out", default=None, help="write metrics JSON here")
    args = p.parse_args(argv)

    from fabind_tpu.config import preset
    from fabind_tpu.data.dataset import Loader, PDBBindLMDBSource
    from fabind_tpu.models.fabind import make_model
    from fabind_tpu.train.convert import convert_checkpoint
    from fabind_tpu.train import checkpoints
    from fabind_tpu.utils.metrics import MetricAccumulator
    from fabind_tpu.data.types import dummy_batch

    cfg = preset(args.preset, batch_size=args.batch_size)
    model = make_model(cfg)

    # init a template, then load weights
    tmpl_batch = dummy_batch(cfg.shapes, batch_size=1)
    k = jax.random.PRNGKey(0)
    variables = jax.jit(lambda: model.init(
        {"params": k, "dropout": k, "sample": k}, tmpl_batch, train=False,
        stage=2))()
    if args.ckpt.endswith(".bin") or args.ckpt.endswith(".pt"):
        params, report = convert_checkpoint(args.ckpt, variables["params"])
        print(f"converted torch ckpt: {report['n_torch']} tensors, "
              f"{len(report['missing'])} missing, "
              f"{len(report['unused'])} unused")
        if report["missing"]:
            print("MISSING:", report["missing"][:20])
        import jax.numpy as jnp
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        params = checkpoints.restore_params(args.ckpt, variables["params"])

    source = PDBBindLMDBSource(args.data, use_esm2_feat=cfg.model.use_esm2_feat)
    splits = source.splits(args.preset)
    loader = Loader(source, splits[args.split], cfg, group=args.split,
                    batch_size=args.batch_size)

    @jax.jit
    def eval_step(params, batch):
        return model.apply({"params": params}, batch, train=False,
                           stage=args.stage)

    acc = MetricAccumulator()
    t0 = time.time()
    n = 0
    for batch in loader.epoch(0):
        out = eval_step(params, batch)
        acc.update(jax.device_get(out), batch)
        n += batch.batch_size
    dt = time.time() - t0
    metrics = acc.summarize()
    metrics["complexes_per_sec"] = n / dt
    metrics["n_dropped_oversize"] = loader.n_dropped
    print(json.dumps(metrics, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
