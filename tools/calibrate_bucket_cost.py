"""Measure the per-variant shape-bucket cost model (round-4 verdict items
3/4).

`data/buckets.py:_cost` scores a candidate bucket (lig, pkt, prot) as
  (1+lig)(1+pkt) + w * (1+lig)(1+prot)
where the pair term models the docking stage's pair chains and w weighs the
whole-protein pocket-prediction stage. Round 4 shipped w=0.25 calibrated on
the BASE preset only; FABind+ runs 6 docking layers with pair-embed
threading and LN MLPs (a heavier pair term), so its protein weight should
differ — this tool measures it instead of guessing.

Method: time the jitted TRAIN step (the cost model's primary consumer is
training-throughput bucket selection) on a grid that varies the pocket dim
at fixed protein and the protein dim at fixed pocket, then least-squares
fit  t = a*(1+lig)(1+pkt) + b*(1+lig)(1+prot) + c  and report w = b/a with
the fit residual. Run on the chip (the CPU backend's relative stage costs
are not the TPU's).

Usage: python tools/calibrate_bucket_cost.py [--preset fabind_plus]
       [--batch 12] [--iters 8]
Emits one JSON line per grid point + a summary line.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


_STATE_CACHE = {}


def _tiny_state(preset_name: str):
    """Parameter/optimizer state is SHAPE-INDEPENDENT (the serve.py tiny-init
    pattern): init once on tiny shapes so each grid point pays only its own
    train-step compile — a full-shape model.init compile costs minutes per
    novel shape on a 1-core host and was serializing the whole grid."""
    import jax

    from fabind_tpu.config import preset
    from fabind_tpu.data.types import dummy_batch
    from fabind_tpu.train.trainer import create_train_state

    if preset_name not in _STATE_CACHE:
        tiny = preset(preset_name, max_ligand=8, max_pocket=16,
                      max_protein=32, ctx_k=6, ctx_k_whole=6,
                      n_iter=8, batch_size=2, remat=True)
        tb = jax.jit(lambda: dummy_batch(
            tiny.shapes, batch_size=2, n_lig_valid=6, n_prot_valid=24))()
        _, state = create_train_state(tiny, jax.random.PRNGKey(0), tb)
        _STATE_CACHE[preset_name] = state
    return _STATE_CACHE[preset_name]


def measure_point(preset_name: str, batch: int, ml, mp, mr, iters: int):
    import jax

    from fabind_tpu.config import preset
    from fabind_tpu.data.types import dummy_batch
    from fabind_tpu.models.fabind import make_model
    from fabind_tpu.train.trainer import make_train_step

    # cli.train's defaults: remat on, fp32 master weights (bf16 opt-in) —
    # the exact configuration whose throughput `--buckets auto` optimizes
    cfg = preset(preset_name, max_ligand=ml, max_pocket=mp, max_protein=mr,
                 n_iter=8, batch_size=batch, remat=True)
    b = jax.jit(lambda: dummy_batch(
        cfg.shapes, batch_size=batch, n_lig_valid=min(ml, 48),
        n_prot_valid=mr - 8))()
    jax.block_until_ready(b)
    model = make_model(cfg)
    state = _tiny_state(preset_name)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=0)
    state, m = step(state, b)             # compile
    float(jax.device_get(m["loss"]))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, m = step(state, b)
        float(jax.device_get(m["loss"]))  # trustworthy fence
        times.append(time.perf_counter() - t0)
    # the input state was donated to `step`; keep the (same-shaped) output
    # state live for the next grid point
    _STATE_CACHE[preset_name] = state
    return float(np.median(times))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="fabind_plus")
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--lig", type=int, default=48)
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    lig = args.lig
    grid = ([(lig, pk, 408) for pk in (40, 80, 120, 160)]
            + [(lig, 80, pr) for pr in (104, 204, 304)])
    pts = []
    for ml, mp, mr in grid:
        t = measure_point(args.preset, args.batch, ml, mp, mr, args.iters)
        rec = {"preset": args.preset, "lig": ml, "pkt": mp, "prot": mr,
               "step_ms": round(t * 1000, 2)}
        print(json.dumps(rec), flush=True)
        pts.append((ml, mp, mr, t))

    X = np.array([[(1 + ml) * (1 + mp), (1 + ml) * (1 + mr), 1.0]
                  for ml, mp, mr, _ in pts])
    y = np.array([t for _, _, _, t in pts])
    coef, res, *_ = np.linalg.lstsq(X, y, rcond=None)
    a, bb, c = coef
    pred = X @ coef
    out = {
        "preset": args.preset,
        "protein_weight": round(float(bb / a), 4),
        "pair_coef_us": round(float(a) * 1e6, 4),
        "prot_coef_us": round(float(bb) * 1e6, 4),
        "const_ms": round(float(c) * 1e3, 3),
        "fit_max_rel_err": round(float(np.max(np.abs(pred - y) / y)), 4),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
