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
    step = jax.jit(make_train_step(model, cfg), donate_argnums=0)
    t = time.perf_counter()
    state, m = step(state, batch)
    _ = float(jax.device_get(m["loss"]))
    log(f"[{name}] compile+1st {time.perf_counter()-t:.0f}s")
    # time each step to a real device->host transfer: block_until_ready on
    # the (donated) outputs has been observed to return early under the
    # remote-TPU tunnel, reporting impossible 8-11 ms "steps" — a scalar
    # device_get per step is the only trustworthy fence
    times = []
    for _ in range(8):
        t = time.perf_counter()
        state, m = step(state, batch)
        loss = float(jax.device_get(m["loss"]))
        times.append(time.perf_counter() - t)
    med = sorted(times)[len(times) // 2]
    log(f"[{name}] median {med*1000:.0f} ms/step -> {B/med:.1f} complexes/s "
        f"train, loss={loss:.3f}")

if __name__ == "__main__":
    run("train_fp32_b8", 8, False)
    run("train_bf16_b8", 8, True)
