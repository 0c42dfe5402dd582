"""Serving daemon driver.

Starts a checkpoint-resident DockingEngine behind the stdlib HTTP server
(fabind_tpu.serve_http). No reference counterpart — the reference's
inference is one-shot scripts (fabind_inference.py:285-392).

Usage:
  python -m fabind_tpu.cli.serve --preset fabind --ckpt ckpt/best_model.bin \
      [--port 8400] [--batch-size 16] [--no-bf16] [--dp N] \
      [--buckets auto --data /path/pdbbind | --buckets l:p:r,l:p:r]

  # or serve an AOT artifact directory (cli.export): no model code traced,
  # no checkpoint loaded — preset/bucket/batch/bf16 come from its manifest
  python -m fabind_tpu.cli.serve --exported exported/ [--port 8400]
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="fabind",
                   choices=["fabind", "fabind_plus", "fabind_plus_sampling",
                            "fabflex"])
    p.add_argument("--ckpt", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8400)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--no-bf16", action="store_true")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel serving over N devices")
    p.add_argument("--post-optim-steps", type=int, default=0)
    p.add_argument("--buckets", default=None,
                   help="explicit shape buckets 'lig:pocket:protein,...' "
                        "(smallest first; the largest must cover the "
                        "preset's shapes), or 'auto'/'auto:K' to infer up "
                        "to K (default 3) buckets from --data's size "
                        "distribution")
    p.add_argument("--data", default=None,
                   help="dataset dir used by '--buckets auto' to measure "
                        "the complex-size distribution")
    p.add_argument("--pdb-root", default=None,
                   help="restrict /dock requests to PDB files under this "
                        "directory (path-checked); without it /dock "
                        "accepts arbitrary server paths")
    p.add_argument("--warmup", action="store_true",
                   help="compile every bucket's executable before binding "
                        "the port (first request then serves at steady-state "
                        "latency instead of paying the ~20-60s compile)")
    p.add_argument("--exported", default=None, metavar="DIR",
                   help="serve a cli.export AOT artifact directory instead "
                        "of --ckpt: weights are baked into the per-bucket "
                        "executables, and config/buckets/batch-size/bf16 "
                        "come from the manifest — model flags passed "
                        "alongside are rejected to prevent silent "
                        "disagreement (--preset/--batch-size have argparse "
                        "defaults and are simply ignored)")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = p.parse_args(argv)

    from fabind_tpu.config import preset
    from fabind_tpu.serve import DockingEngine
    from fabind_tpu.serve_http import serve_forever

    if args.exported:
        baked = [n for n, v in [("--ckpt", args.ckpt),
                                ("--buckets", args.buckets),
                                ("--set", args.set or None),
                                ("--dp", args.dp if args.dp != 1 else None),
                                ("--no-bf16", args.no_bf16 or None),
                                ("--post-optim-steps",
                                 args.post_optim_steps or None)]
                 if v is not None]
        if baked:
            raise SystemExit(f"--exported bakes these into the artifact; "
                             f"drop {', '.join(baked)} (re-export to change "
                             f"them)")
        engine = DockingEngine.from_exported(args.exported)
        if args.warmup:
            print(f"warming up {len(engine.bucket_cfgs)} bucket(s)...",
                  flush=True)
            print(f"warmup done in {engine.warmup():.1f}s")
        serve_forever(engine, args.host, args.port, pdb_root=args.pdb_root)
        return

    from fabind_tpu.config import parse_overrides
    overrides = parse_overrides(args.set)
    cfg = preset(args.preset, **overrides)

    from fabind_tpu.data.buckets import resolve_buckets
    source = indices = None
    if args.buckets and args.buckets.startswith("auto"):
        if not args.data:
            raise SystemExit("--buckets auto requires --data to measure "
                             "the complex-size distribution")
        from fabind_tpu.data.dataset import open_source
        source, indices = open_source(args.data, variant=args.preset,
                                      split="test",
                                      use_esm2_feat=cfg.model.use_esm2_feat)
    buckets = resolve_buckets(args.buckets, cfg, source, indices,
                              group="test")
    if buckets is not None:
        print("buckets:", [(s.max_ligand, s.max_pocket, s.max_protein)
                           for s in buckets])

    engine = DockingEngine(cfg, ckpt=args.ckpt, buckets=buckets,
                           batch_size=args.batch_size,
                           bf16=not args.no_bf16,
                           post_optim_steps=args.post_optim_steps,
                           dp=args.dp)
    if args.warmup:
        print(f"warming up {len(engine.bucket_cfgs)} bucket(s)...",
              flush=True)
        dt = engine.warmup()
        print(f"warmup done in {dt:.1f}s")
    serve_forever(engine, args.host, args.port, pdb_root=args.pdb_root)


if __name__ == "__main__":
    main()
