"""Bucketed-vs-max-shape TRAIN step on the real chip (round-3 verdict item 1
done-criterion): measures what `cli.train --buckets auto` saves over the old
single max-shape bucket (lig 128 / pkt 256 / prot 1024 preset default) on
PDBbind-median complexes (48 atoms / 400 residues — same sizes bench.py
uses). Config matches the documented train command: remat on, batch 8."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from fabind_tpu.config import preset
from fabind_tpu.data.types import dummy_batch
from fabind_tpu.train.trainer import create_train_state, make_train_step

def log(m): print(m, file=sys.stderr, flush=True)

def run(name, B, **shape_over):
    cfg = preset("fabind", n_iter=8, batch_size=B, remat=True, **shape_over)
    batch = jax.jit(lambda: dummy_batch(cfg.shapes, batch_size=B,
                                        n_lig_valid=48, n_prot_valid=400))()
    jax.block_until_ready(batch)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=0)
    t = time.perf_counter()
    state, m = step(state, batch)
    _ = float(jax.device_get(m["loss"]))
    log(f"[{name}] compile+1st {time.perf_counter()-t:.0f}s")
    times = []
    for _ in range(8):
        t = time.perf_counter()
        state, m = step(state, batch)
        loss = float(jax.device_get(m["loss"]))   # trustworthy fence
        times.append(time.perf_counter() - t)
    med = sorted(times)[len(times) // 2]
    print(f"{name}: {med*1000:.0f} ms/step, {B/med:.1f} complexes/s/chip "
          f"(loss={loss:.2f})", flush=True)

if __name__ == "__main__":
    # BEFORE: the preset-default single bucket every sample was padded to
    run("maxshape_128_256_1024", 8)
    # AFTER: the auto bucket the same complexes route to under --buckets auto
    run("bucketed_48_160_408", 8, max_ligand=48, max_pocket=160,
        max_protein=408)
