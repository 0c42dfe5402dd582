"""Sustained END-TO-END training throughput (round-3 verdict item 3).

Every prior training number (tools/perf_train_probe.py,
tools/perf_bucketed_train.py) is a device-step measurement on prebuilt
batches. This probe runs the REAL `cli.train` — default flags: threaded
host featurization (--workers 8, the counterpart of the reference's
DataLoader num_workers=10, main_fabind.py:220), prefetch, `--buckets auto`,
per-epoch orbax checkpointing — over a mixed-size synthetic LMDB store in
the reference's exact on-disk schema, for several epochs, and reports:

  - sustained complexes/s/chip (median over post-warmup epochs; epoch 0
    pays the per-bucket train-step compiles),
  - loader-wait fraction: the share of each epoch's wall time the train
    loop spends blocked in the Loader generator (featurize + collate +
    prefetch misses on this host) — the starvation measurement,
  - per-bucket sample routing + the compile count (one jitted train step
    per exercised bucket),

proving (or refuting) that the device-step number survives the 1-core
host's featurization/collation. cli.train's per-epoch wall times are
honest: the train loop drains the async dispatch queue before stamping
them (cli/train.py epoch-end block_until_ready).

The store (default 500 complexes, ligand 8-48 atoms / protein 60-500
residues, PDBbind-shaped log-normal-ish mix) is cached under
~/.cache/fabind_perf_store and reused across runs.

Usage: python tools/perf_e2e_train.py [--n 500] [--epochs 4] [--batch 12]
       [--preset fabind] [--workers 8] [--cpu]
Emits one JSON line.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def build_store(n: int, seed: int = 0) -> str:
    """Mixed-size reference-schema store, disk-cached."""
    from fixture_pdbbind import make_reference_fixture

    import fixture_pdbbind

    rng = np.random.RandomState(seed)
    # PDBbind-shaped mix: most ligands 10-35 atoms with a heavy tail to 48;
    # proteins 60-500 residues, median ~250
    atoms = np.clip((8 + rng.gamma(3.0, 6.0, size=n)).astype(int), 8, 48)
    res = np.clip((60 + rng.gamma(2.5, 90.0, size=n)).astype(int), 60, 500)
    with open(fixture_pdbbind.__file__, "rb") as f:
        gen_src = hashlib.sha256(f.read()).hexdigest()[:8]
    key = hashlib.sha256(
        json.dumps([n, seed, gen_src, atoms.tolist(), res.tolist()]).encode()
    ).hexdigest()[:12]
    root = os.path.expanduser(f"~/.cache/fabind_perf_store/n{n}-{key}")
    if os.path.exists(os.path.join(root, ".complete")):
        return root
    t0 = time.time()
    make_reference_fixture(root, n_train=n, n_valid=2, n_test=2, seed=seed,
                           train_sizes=list(zip(atoms, res)))
    open(os.path.join(root, ".complete"), "w").write(key)
    print(f"store built in {time.time()-t0:.1f}s: {root}", file=sys.stderr)
    return root


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=500)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--preset", default="fabind")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--buckets", default="auto",
                   help="cli.train bucket spec (auto / auto:K / explicit "
                        "l:p:r list) — the round-5 K sweep knob")
    p.add_argument("--transfer-dtype", default="fp32",
                   choices=["fp32", "bf16"],
                   help="cli.train --transfer-dtype passthrough (bf16 "
                        "halves the dominant per-step ESM upload; the "
                        "round-5 tunneled-host lever)")
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force CPU (smoke runs; throughput numbers are "
                        "meaningful on the TPU chip only)")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    root = build_store(args.n)

    # ---- instrument the Loader: wall time the train loop spends blocked
    # in next() (featurize/collate/prefetch misses), per epoch
    from fabind_tpu.data import dataset as ds

    waits = {}              # epoch -> seconds blocked in the loader
    buckets_seen = {}       # shape dims -> samples routed there
    orig_epoch = ds.Loader.epoch

    def timed_epoch(self, epoch=0, with_meta=False, skip_batches=0):
        gen = orig_epoch(self, epoch, with_meta=with_meta,
                         skip_batches=skip_batches)
        if self.group != "train":
            return gen

        def wrapper():
            while True:
                t0 = time.perf_counter()
                try:
                    item = next(gen)
                except StopIteration:
                    return
                waits[epoch] = waits.get(epoch, 0.0) \
                    + (time.perf_counter() - t0)
                if with_meta and epoch == 0:   # routing is per-epoch-stable
                    sh = item[1]["cfg"].shapes
                    k = (sh.max_ligand, sh.max_pocket, sh.max_protein)
                    buckets_seen[k] = buckets_seen.get(k, 0) \
                        + item[1]["n_valid"]
                yield item
        return wrapper()

    ds.Loader.epoch = timed_epoch
    out = args.out or os.path.expanduser(
        f"~/.cache/fabind_perf_store/run-{int(time.time())}")

    from fabind_tpu.cli import train as train_cli
    t0 = time.time()
    train_cli.main(["--preset", args.preset, "--data", root,
                    "--output", out, "--epochs", str(args.epochs),
                    "--batch-size", str(args.batch),
                    "--workers", str(args.workers),
                    "--buckets", args.buckets,
                    "--transfer-dtype", args.transfer_dtype,
                    # train throughput only: the 2-sample valid split's
                    # per-stage eval compiles would dominate the probe
                    "--eval-every", "0",
                    "--compile-cache", "~/.jax_cache"])
    total = time.time() - t0
    ds.Loader.epoch = orig_epoch

    log = open(os.path.join(out, "log.txt")).read()
    epoch_s = [float(m.group(1)) for m in
               re.finditer(r"epoch \d+ done in ([0-9.]+)s", log)]
    assert len(epoch_s) == args.epochs, epoch_s
    steady = epoch_s[1:] if len(epoch_s) > 1 else epoch_s
    sustained = args.n / float(np.median(steady))
    rec = {
        "metric": "sustained e2e cli.train complexes/s/chip "
                  f"({args.preset}, b{args.batch}, workers {args.workers}, "
                  f"buckets {args.buckets}, transfer {args.transfer_dtype}, "
                  f"mixed-size store n={args.n})",
        "value": round(sustained, 2),
        "unit": "complexes/s",
        "epoch_seconds": [round(s, 1) for s in epoch_s],
        "first_epoch_includes_compiles_s": round(epoch_s[0], 1),
        "loader_wait_fraction_steady": round(
            float(np.median([waits.get(e, 0.0) / epoch_s[e]
                             for e in range(1, len(epoch_s))]))
            if len(epoch_s) > 1 else waits.get(0, 0.0) / epoch_s[0], 3),
        "per_bucket_samples": {str(k): v for k, v in
                               sorted(buckets_seen.items())},
        "train_step_compiles": len(buckets_seen),
        "total_wall_s": round(total, 1),
        "host_cpus": os.cpu_count(),
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
