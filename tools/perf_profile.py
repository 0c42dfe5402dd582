"""Capture a TPU trace of bf16 inference and print the top ops (scratch)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import glob
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from fabind_tpu.config import preset
from fabind_tpu.data.types import dummy_batch
from fabind_tpu.models.fabind import make_model


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    B = 8
    cfg = preset("fabind", max_ligand=96, max_pocket=160, max_protein=512,
                 n_iter=8)
    model = make_model(cfg)
    k = jax.random.PRNGKey(0)
    tiny_shapes = dataclasses.replace(cfg.shapes, max_ligand=8, max_pocket=16,
                                      max_protein=32, ctx_k=6, ctx_k_whole=6)
    tiny = jax.jit(lambda: dummy_batch(tiny_shapes, batch_size=1,
                                       n_lig_valid=6, n_prot_valid=24))()
    variables = jax.jit(lambda: model.init(
        {"params": k, "dropout": k, "sample": k}, tiny, train=False,
        stage=2))()
    batch = jax.jit(lambda: dummy_batch(cfg.shapes, batch_size=B,
                                        n_lig_valid=48, n_prot_valid=400))()
    from fabind_tpu.utils.precision import cast_tree_bf16
    vb = cast_tree_bf16(variables)
    bb = cast_tree_bf16(batch)
    jax.block_until_ready((vb, bb))

    @jax.jit
    def infer(params, batch):
        return model.apply(params, batch, method="inference")[0]

    infer(vb, bb).block_until_ready()
    log("compiled")

    tdir = "/tmp/fabind_trace"
    with jax.profiler.trace(tdir):
        for _ in range(3):
            out = infer(vb, bb)
        out.block_until_ready()

    # parse the xplane with the tensorboard profile plugin converter
    from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t
    xspace = glob.glob(tdir + "/**/*.xplane.pb", recursive=True)
    log(f"xplane files: {xspace}")
    data, _ = r2t.xspace_to_tool_data(xspace, "op_profile", {})
    prof = json.loads(data)

    root = prof.get("byProgram") or prof.get("byCategory")
    if root is None:
        raise SystemExit(f"unexpected op_profile shape; top-level keys: "
                         f"{sorted(prof)}")
    rows = []
    def collect(node, path=()):
        m = node.get("metrics", {})
        kids = node.get("children", [])
        if not kids:
            rows.append((m.get("rawTime", 0.0), "/".join(path + (node.get("name", "?"),)), m.get("flops", 0)))
        for c in kids:
            collect(c, path + (node.get("name", "?"),))
    collect(root)
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    log(f"total leaf time {total:.3g}")
    for t, name, fl in rows[:40]:
        log(f"{100*t/max(total,1e-9):5.1f}%  flops={fl:.3g}  {name[:150]}")


if __name__ == "__main__":
    main()
