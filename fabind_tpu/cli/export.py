"""Export AOT serving artifacts (weights-baked `jax.export` programs).

The deployment packaging step (fabind_tpu.aot): serializes one
fully-lowered inference program per shape bucket, with the checkpoint
weights baked in, so the serving container needs neither the flax model
code nor the checkpoint file — and a CPU-only build host emits
TPU-servable artifacts. No reference counterpart (the reference serves
from Python torch checkpoints only, FABind/fabind/fabind_inference.py).

Usage:
  python -m fabind_tpu.cli.export --preset fabind --ckpt best_model.bin \
      --output exported/ [--buckets 48:160:408,96:160:512] \
      [--batch-size 8] [--no-bf16] [--platforms cpu,tpu] \
      [--post-optim-steps N] [--set KEY=VALUE ...]

Serve it with `DockingEngine.from_exported("exported/")`, or load the raw
per-bucket callables via `fabind_tpu.aot.ExportedInference`.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="fabind",
                   choices=["fabind", "fabind_plus", "fabind_plus_sampling",
                            "fabflex"])
    p.add_argument("--ckpt", required=True,
                   help=".bin (torch, auto-converted) or orbax dir")
    p.add_argument("--output", required=True, help="artifact directory")
    p.add_argument("--buckets", default=None,
                   help="explicit shape buckets 'lig:pocket:protein[,...]' "
                        "(default: the single cfg.shapes bucket); each "
                        "bucket becomes one exported executable")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--no-bf16", action="store_true",
                   help="export fp32 programs (default bakes the bf16 "
                        "deployment cast into the artifact)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets; 'cpu,tpu' "
                        "(default) makes one artifact servable on both")
    p.add_argument("--post-optim-steps", type=int, default=0,
                   help="bake N on-device LAS post-optimization steps into "
                        "the program (reference fabind_inference.py:373)")
    p.add_argument("--sampling", action="store_true",
                   help="also export the FABind+ best-of-N sampling path "
                        "per bucket (pocket half + stochastic dock half "
                        "with an explicit rng-key input) so the artifact "
                        "serves dock_best_of; needs a confidence-head "
                        "preset (fabind_plus_sampling)")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = p.parse_args(argv)

    import jax

    from fabind_tpu.aot import export_inference
    from fabind_tpu.config import parse_overrides, preset
    from fabind_tpu.data.buckets import resolve_buckets
    from fabind_tpu.data.types import dummy_batch
    from fabind_tpu.models.fabind import make_model
    from fabind_tpu.train.checkpoints import load_params

    cfg = preset(args.preset, **parse_overrides(args.set))
    buckets = resolve_buckets(args.buckets, cfg)

    # parameter shapes are bucket-independent: init the template on tiny
    # shapes to keep the startup compile short (serve.py does the same)
    tiny = dataclasses.replace(cfg.shapes, max_ligand=8, max_pocket=16,
                               max_protein=32, ctx_k=6, ctx_k_whole=6)
    k = jax.random.PRNGKey(0)
    tb = jax.jit(lambda: dummy_batch(
        tiny, batch_size=1, n_lig_valid=6, n_prot_valid=24,
        feat_dim=cfg.model.compound_feat_dim,
        prot_feat_dim=cfg.model.protein_feat_dim))()
    tiny_model = make_model(cfg.replace(shapes=tiny))
    template = jax.jit(lambda: tiny_model.init(
        {"params": k, "dropout": k, "sample": k}, tb, train=False,
        stage=2))()["params"]
    params, _ = load_params(args.ckpt, template)

    t0 = time.perf_counter()
    manifest = export_inference(
        cfg, params, args.output, buckets=buckets,
        batch_size=args.batch_size, bf16=not args.no_bf16,
        platforms=tuple(s for s in args.platforms.split(",") if s),
        post_optim_steps=args.post_optim_steps, sampling=args.sampling)
    n = len(manifest["buckets"])
    size = sum(os.path.getsize(os.path.join(args.output, e[kk]))
               for e in manifest["buckets"]
               for kk in ("file", "pocket_file", "sample_file") if kk in e)
    print(json.dumps({"artifacts": n, "bytes": size,
                      "seconds": round(time.perf_counter() - t0, 1),
                      "output": args.output}))


if __name__ == "__main__":
    main()
