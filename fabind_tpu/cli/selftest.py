"""Deployment self-test: verify the install + accelerator in ~30 seconds.

No reference counterpart (the reference's smallest smoke is a full eval
script run). One command checks, on whatever accelerator jax exposes:

  1. device discovery + backend,
  2. model init and a jitted inference forward on tiny synthetic complexes
     (finite coords in the right shape),
  3. optionally (--train) one optimizer step (finite loss, params updated),
  4. optionally (--prod) a forward at production bucket shapes with the
     flagship config — the compile the first real request would pay.

Exit code 0 = everything passed. Prints one JSON line per check.

Usage:
  python -m fabind_tpu.cli.selftest [--preset fabind] [--train] [--prod]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def _check(name: str, t0: float, **extra) -> None:
    print(json.dumps({"check": name, "ok": True,
                      "seconds": round(time.perf_counter() - t0, 2), **extra}),
          flush=True)


def _require(cond: bool, msg) -> None:
    """Explicit health check: `assert` would be stripped under python -O,
    making a broken install pass the deployment gate silently."""
    if not cond:
        raise RuntimeError(f"selftest check failed: {msg}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="fabind",
                   choices=["fabind", "fabind_plus", "fabind_plus_sampling",
                            "fabflex"])
    p.add_argument("--train", action="store_true",
                   help="also run one optimizer step")
    p.add_argument("--prod", action="store_true",
                   help="also compile+run a forward at production bucket "
                        "shapes (lig 48 / pkt 158 / prot 408, 8 recycles)")
    p.add_argument("--bf16", action="store_true",
                   help="run the inference checks in bfloat16 (the serving "
                        "dtype)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fabind_tpu.config import preset
    from fabind_tpu.data.types import dummy_batch
    from fabind_tpu.models.fabind import make_model

    t0 = time.perf_counter()
    devs = jax.devices()
    _check("devices", t0, backend=jax.default_backend(), n=len(devs),
           kinds=sorted({d.device_kind for d in devs}))

    def cast(tree):
        if not args.bf16:
            return tree
        from fabind_tpu.utils.precision import cast_tree_bf16
        return cast_tree_bf16(tree)

    def forward(cfg, batch_size, n_lig, n_prot, label):
        t = time.perf_counter()
        batch = jax.jit(lambda: dummy_batch(
            cfg.shapes, batch_size=batch_size, n_lig_valid=n_lig,
            n_prot_valid=n_prot))()
        model = make_model(cfg)
        k = jax.random.PRNGKey(0)
        variables = jax.jit(lambda: model.init(
            {"params": k, "dropout": k, "sample": k}, batch, train=False,
            stage=2))()
        variables, batch = cast(variables), cast(batch)
        coords, conf = jax.jit(lambda v, b: model.apply(
            v, b, method="inference"))(variables, batch)
        coords = np.asarray(jax.device_get(coords), np.float32)
        _require(coords.shape == (batch_size, cfg.shapes.max_ligand, 3),
                 coords.shape)
        _require(np.isfinite(coords).all(), "non-finite coordinates")
        _check(label, t, coords_shape=list(coords.shape),
               dtype="bf16" if args.bf16 else "fp32")
        return model, variables, batch

    tiny = preset(args.preset, max_ligand=8, max_pocket=16, max_protein=32,
                  ctx_k=6, ctx_k_whole=6, hidden_size=16,
                  pocket_pred_hidden_size=16, mean_layers=1, n_iter=2,
                  batch_size=2)
    forward(tiny, 2, 6, 24, "inference_tiny")

    if args.train:
        from fabind_tpu.train.trainer import create_train_state, make_train_step
        t = time.perf_counter()
        batch = jax.jit(lambda: dummy_batch(tiny.shapes, batch_size=2,
                                            n_lig_valid=6, n_prot_valid=24))()
        model, state = create_train_state(tiny, jax.random.PRNGKey(0), batch)
        step = jax.jit(make_train_step(model, tiny), donate_argnums=0)
        state, metrics = step(state, batch)
        loss = float(jax.device_get(metrics["loss"]))
        gnorm = float(jax.device_get(metrics["grad_norm"]))
        _require(np.isfinite(loss), f"non-finite loss {loss}")
        _require(np.isfinite(gnorm) and gnorm > 0, f"bad grad norm {gnorm}")
        _require(int(jax.device_get(state.step)) == 1, "step count != 1")
        # gradient flow — not a param delta — is the health signal here
        _check("train_step", t, loss=round(loss, 4),
               grad_norm=round(gnorm, 4))

    if args.prod:
        cfg = preset(args.preset, max_ligand=48, max_pocket=158,
                     max_protein=408, n_iter=8)
        forward(cfg, 4, 48, 400, "inference_prod")

    print(json.dumps({"selftest": "ok"}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
