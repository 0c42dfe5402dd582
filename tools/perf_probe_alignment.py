"""Probe: node-count alignment (258 vs 256) for the bf16 inference path."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import time, sys
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from fabind_tpu.config import preset
from fabind_tpu.data.types import dummy_batch
from fabind_tpu.models.fabind import make_model


def log(m):
    print(m, file=sys.stderr, flush=True)


def run(name, max_pocket, iters=8, B=8):
    cfg = preset("fabind", max_ligand=96, max_pocket=max_pocket,
                 max_protein=512, n_iter=8)
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
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    vb, bb = cast(variables), cast(batch)
    jax.block_until_ready((vb, bb))

    @jax.jit
    def infer(params, batch):
        coords, _ = model.apply(params, batch, method="inference")
        return coords

    t = time.perf_counter()
    infer(vb, bb).block_until_ready()
    log(f"[{name}] compile+1st {time.perf_counter()-t:.0f}s")
    t = time.perf_counter()
    out = None
    for _ in range(iters):
        out = infer(vb, bb)
    out.block_until_ready()
    dt = time.perf_counter() - t
    log(f"[{name}] {B*iters/dt:.1f} cplx/s ({dt/iters*1000:.0f} ms/batch)")


if __name__ == "__main__":
    run("bf16_b8_pkt160", 160)
    run("bf16_b8_pkt158", 158)
