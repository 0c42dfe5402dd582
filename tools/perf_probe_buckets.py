"""Probe: shapes that fit the benchmarked complexes (bucketed serving)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses, time, sys
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from fabind_tpu.config import preset
from fabind_tpu.data.types import dummy_batch
from fabind_tpu.models.fabind import make_model

def log(m): print(m, file=sys.stderr, flush=True)

def run(name, ml, mp, mr, B=8, iters=8, nl=48, nr=400):
    cfg = preset("fabind", max_ligand=ml, max_pocket=mp, max_protein=mr, n_iter=8)
    model = make_model(cfg)
    k = jax.random.PRNGKey(0)
    ts = dataclasses.replace(cfg.shapes, max_ligand=8, max_pocket=16,
                             max_protein=32, ctx_k=6, ctx_k_whole=6)
    tiny = jax.jit(lambda: dummy_batch(ts, batch_size=1, n_lig_valid=6, n_prot_valid=24))()
    variables = jax.jit(lambda: model.init(
        {"params": k, "dropout": k, "sample": k}, tiny, train=False, stage=2))()
    batch = jax.jit(lambda: dummy_batch(cfg.shapes, batch_size=B,
                                        n_lig_valid=nl, n_prot_valid=nr))()
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    vb, bb = cast(variables), cast(batch)
    jax.block_until_ready((vb, bb))
    @jax.jit
    def infer(p, b):
        return model.apply(p, b, method="inference")[0]
    t = time.perf_counter(); infer(vb, bb).block_until_ready()
    log(f"[{name}] compile+1st {time.perf_counter()-t:.0f}s")
    t = time.perf_counter()
    for _ in range(iters): out = infer(vb, bb)
    out.block_until_ready()
    dt = time.perf_counter() - t
    log(f"[{name}] {B*iters/dt:.1f} cplx/s ({dt/iters*1000:.0f} ms/batch)")

if __name__ == "__main__":
    run("fit_b8_l48_p158_r408", 48, 158, 408)
    run("fit_b16_l48_p158_r408", 48, 158, 408, B=16)
    run("fit_b32_l48_p158_r408", 48, 158, 408, B=32)
