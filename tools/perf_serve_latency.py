"""Single-request serving latency through DockingEngine (not part of the
library). Throughput is bench.py's job; this measures the other axis users
care about in production: how long ONE dock_raw call takes end to end
(featurize -> collate -> upload -> 8-recycle inference -> fetch), at
serving shapes, after warmup. Prints p50/p90 per call.

Note the tunnel caveat (DESIGN.md "Timing methodology"): on the tunneled
bench chip each call pays ~40ms host<->device RTT plus the ESM-feature
upload at ~40MB/s, which a local TPU host would not."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from fabind_tpu.config import preset
from fabind_tpu.serve import DockingEngine

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_raw(n, nr, seed):
    rng = np.random.RandomState(seed)
    prot = rng.randn(nr, 3).astype(np.float32) * 8
    lig = prot[:5].mean(0) + rng.randn(n, 3).astype(np.float32)
    bond = []
    for i in range(n - 1):
        bond += [(i, i + 1), (i + 1, i)]
    las = np.zeros((n, n), bool)
    for i, j in bond:
        las[i, j] = True
    return dict(protein_xyz=prot,
                esm_feat=rng.randn(nr, 1280).astype(np.float32),
                lig_coords=lig, lig_feats=rng.randn(n, 56).astype(np.float32),
                bond_edges=np.asarray(bond), las_mask=las,
                rdkit_coords=lig + 0.1 * rng.randn(n, 3).astype(np.float32))


def main():
    batch_size = int(os.environ.get("FABIND_LAT_BATCH", "1"))
    cfg = preset("fabind", max_ligand=48, max_pocket=158, max_protein=408,
                 n_iter=8)
    eng = DockingEngine(cfg, batch_size=batch_size, bf16=True)
    raws = [make_raw(48, 400, s) for s in range(batch_size)]
    t = time.perf_counter()
    eng.dock_raw(raws)                      # warmup: compile + caches
    log(f"warmup (compile) {time.perf_counter()-t:.1f}s")
    lats = []
    for i in range(30):
        t = time.perf_counter()
        poses = eng.dock_raw(raws)
        assert poses[0].error is None
        lats.append(time.perf_counter() - t)
    lats.sort()
    p50 = lats[len(lats) // 2] * 1000
    p90 = lats[int(len(lats) * 0.9)] * 1000
    print(f"dock_raw latency b{batch_size}: p50 {p50:.0f} ms, "
          f"p90 {p90:.0f} ms ({batch_size / (p50 / 1000):.1f} complexes/s "
          f"at p50, sequential calls)")


if __name__ == "__main__":
    main()
