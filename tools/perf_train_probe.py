"""Training-step throughput on the real chip (not part of the library)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time, sys
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import numpy as np
from fabind_tpu.config import preset
from fabind_tpu.data.types import dummy_batch
from fabind_tpu.train.trainer import create_train_state, make_train_step

def log(m): print(m, file=sys.stderr, flush=True)

def run(name, B, bf16):
    cfg = preset("fabind", max_ligand=48, max_pocket=158, max_protein=408,
                 n_iter=8, batch_size=B, bf16=bf16)
    batch = jax.jit(lambda: dummy_batch(cfg.shapes, batch_size=B,
                                        n_lig_valid=48, n_prot_valid=400))()
    jax.block_until_ready(batch)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(model, cfg))
    t = time.perf_counter()
    state, m = step(state, batch)
    jax.block_until_ready(m)
    log(f"[{name}] compile+1st {time.perf_counter()-t:.0f}s")
    t = time.perf_counter()
    iters = 10
    for _ in range(iters):
        state, m = step(state, batch)
        # block every step: metrics alone under-measure (the dict can be
        # computed from the fwd pass while the bwd/update still runs)
        jax.block_until_ready((state.params, m))
    dt = time.perf_counter() - t
    log(f"[{name}] {B*iters/dt:.1f} complexes/s train ({dt/iters*1000:.0f} ms/step) loss={float(m['loss']):.3f}")

if __name__ == "__main__":
    run("train_fp32_b8", 8, False)
    run("train_bf16_b8", 8, True)
