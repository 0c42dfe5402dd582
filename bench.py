"""Docking-inference throughput benchmark (complexes/sec/chip).

Runs the full FABind base inference path (whole-protein pocket prediction ->
predicted crop -> 8-recycle docking) on PDBbind-representative complexes
(48 ligand atoms, 400 protein residues — both above the PDBbind-2020
timesplit-test medians), on whatever accelerator jax exposes (one TPU chip
under the driver).

Serving configuration measured here (both are the library defaults):
- bf16 inference (golden fp32 parity vs the torch reference is maintained
  separately in tests/test_golden_*; bf16 is the deployment dtype).
- bucketed shapes: each complex runs in the smallest shape bucket it fits
  (Loader(buckets=...), one jit specialization per bucket) instead of being
  padded to the dataset maximum — the TPU-native replacement for the
  reference's per-sample dynamic shapes. The benchmark complexes fit the
  (ligand 48, pocket 158, protein 408) bucket; the conservative
  everything-padded-to-max configuration (ligand 96, pocket 160,
  protein 512) is measured with FABIND_BENCH_MAXSHAPES=1.

Env overrides: FABIND_BENCH_BATCH (default 12 — swept 8/12/14/16/24 on-chip,
b12 measures best at these shapes), FABIND_BENCH_BF16 (default 1),
FABIND_BENCH_MAXSHAPES (default 0), FABIND_BENCH_PRESET (default "fabind";
"fabind_plus" measures the released plus config — mean_layers 5,
use_ln_mlp, mlp_hidden_scale 1 — whose fused LayerNormed edge MLPs run a
different code path than base's decomposed fast path).

`bench.py --real` instead pushes the reference's own 4 `inference_examples`
complexes (FABind/inference_examples, README.md:95-125) through the FULL
DockingEngine path — real SDF/PDB featurization, bucket routing, batched
inference, world-frame restore — and reports end-to-end complexes/s, so the
headline synthetic number has a real-molecule anchor (ESM2 embeddings are
deterministic pseudo-vectors: the 650M weights cannot download in this
zero-egress image, and the reference also treats ESM as offline
preprocessing outside its timed path).

Baseline: the FABind paper reports ~0.1 s/complex on an A100-class GPU
(BASELINE.md (b)); vs_baseline = complexes_per_sec / 10.

Provenance caveats (documented, deliberate):
- The complexes are synthetic `dummy_batch` tensors at PDBbind-
  representative VALID sizes (48 atoms / 400 residues). Throughput on
  fixed shapes is content-independent (same HLO, same FLOPs), so this
  measures exactly what real data would — but accuracy is measured
  elsewhere (tests/test_golden_*, cli.evaluate), never here.
- In the "bucketed" configuration the synthetic complexes exactly fit the
  measured bucket; real traffic spanning several buckets pays one compile
  per bucket and per-bucket padding waste — the max-shapes number
  (FABIND_BENCH_MAXSHAPES=1) bounds that from below.
- vs_baseline divides by the paper's ~10 complexes/s A100 claim, which is
  not reproducible in-repo (BASELINE.md separates repo-fixed facts from
  paper claims).
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_real():
    """End-to-end DockingEngine throughput on the reference's 4 real
    example complexes (6efk/6g3c/6n93/6npi). Measures the full serving
    path: SDF+PDB featurization (host), bucket routing, batched bf16
    inference, world-frame restore."""
    import numpy as np

    import fabind_tpu.data.featurize as feat
    from fabind_tpu.config import preset
    from fabind_tpu.serve import DockingEngine

    examples = "/root/reference/FABind/inference_examples"
    if not os.path.isdir(examples):
        print(json.dumps({"metric": "real-complex e2e", "value": 0,
                          "unit": "complexes/s",
                          "vs_baseline": 0,
                          "error": "reference examples not mounted"}))
        return
    pdb_ids = ["6efk", "6g3c", "6n93", "6npi"]
    reqs = [(os.path.join(examples, "gt_mol_files", p, f"{p}_ligand.sdf"),
             os.path.join(examples, "pdb_files", f"{p}.pdb"))
            for p in pdb_ids]

    # zero-egress image: ESM2-650M weights cannot download — substitute
    # deterministic pseudo-embeddings (same shape/dtype; throughput on
    # fixed shapes is content-independent)
    feat.extract_esm_feature = lambda seq, **kw: (
        np.random.RandomState(len(seq)).randn(len(seq), 1280)
        .astype(np.float32) * 0.2)

    # one bucket covering the largest example (6n93: 520 residues)
    cfg = preset("fabind", n_iter=8, max_ligand=48, max_pocket=160,
                 max_protein=544)
    engine = DockingEngine(cfg, batch_size=4)

    t = time.perf_counter()
    poses = engine.dock_sdf(reqs)   # warmup: featurize cache cold, compile
    log(f"warmup (featurize+compile+first dock) {time.perf_counter()-t:.1f}s")
    errs = [p.error for p in poses if p.error]
    assert not errs, errs

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        poses = engine.dock_sdf(reqs)
    dt = time.perf_counter() - t0
    assert all(p.error is None and np.isfinite(p.coords).all()
               for p in poses)
    cps = len(reqs) * iters / dt
    print(json.dumps({
        "metric": ("complexes/sec/chip (REAL reference inference_examples, "
                   "e2e DockingEngine: featurize+dock+frame-restore, b4, "
                   "bf16)"),
        "value": round(cps, 2),
        "unit": "complexes/s",
        "vs_baseline": round(cps / 10.0, 2),
    }))


def main():
    from fabind_tpu.config import preset
    from fabind_tpu.data.types import dummy_batch
    from fabind_tpu.models.fabind import make_model

    batch_size = int(os.environ.get("FABIND_BENCH_BATCH", "12"))
    use_bf16 = os.environ.get("FABIND_BENCH_BF16", "1") == "1"
    max_shapes = os.environ.get("FABIND_BENCH_MAXSHAPES") == "1"
    preset_name = os.environ.get("FABIND_BENCH_PRESET", "fabind")
    if max_shapes:
        ml, mp, mr, tag_shape = 96, 160, 512, "max-shapes"
    else:
        ml, mp, mr, tag_shape = 48, 158, 408, "bucketed"
    cfg = preset(preset_name, max_ligand=ml, max_pocket=mp, max_protein=mr,
                 n_iter=8)
    t = time.perf_counter()
    # build the synthetic batch in ONE compiled program — eager op-by-op
    # dispatch over the TPU tunnel costs minutes
    batch = jax.jit(lambda: dummy_batch(
        cfg.shapes, batch_size=batch_size, n_lig_valid=48,
        n_prot_valid=400))()
    jax.block_until_ready(batch)
    log(f"batch built in {time.perf_counter()-t:.1f}s")
    model = make_model(cfg)
    k = jax.random.PRNGKey(0)
    t = time.perf_counter()
    # parameter shapes are independent of the shape bucket: initialize on a
    # tiny bucket to keep the init compile short
    tiny_shapes = dataclasses.replace(cfg.shapes, max_ligand=8, max_pocket=16,
                                      max_protein=32, ctx_k=6, ctx_k_whole=6)
    tiny = jax.jit(lambda: dummy_batch(tiny_shapes, batch_size=1,
                                       n_lig_valid=6, n_prot_valid=24))()
    variables = jax.jit(lambda: model.init(
        {"params": k, "dropout": k, "sample": k}, tiny, train=False,
        stage=2))()
    jax.block_until_ready(variables)
    log(f"init in {time.perf_counter()-t:.1f}s")

    if use_bf16:
        from fabind_tpu.utils.precision import cast_tree_bf16
        variables = cast_tree_bf16(variables)
        batch = cast_tree_bf16(batch)
        jax.block_until_ready((variables, batch))

    @jax.jit
    def infer(params, batch):
        coords, _ = model.apply(params, batch, method="inference")
        return coords

    # warmup / compile
    t = time.perf_counter()
    infer(variables, batch).block_until_ready()
    log(f"compile+first run in {time.perf_counter()-t:.1f}s")

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, batch)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    cps = batch_size * iters / dt
    tag = "bf16" if use_bf16 else "fp32"
    model_tag = ("fabind+ (ln_mlp decomposed)" if preset_name == "fabind_plus"
                 else "fabind base")
    print(json.dumps({
        "metric": (f"complexes/sec/chip ({model_tag} inference, {tag_shape}, "
                   f"b{batch_size}, {tag})"),
        "value": round(cps, 2),
        "unit": "complexes/s",
        "vs_baseline": round(cps / 10.0, 2),
    }))


if __name__ == "__main__":
    if "--real" in sys.argv:
        bench_real()
    else:
        main()
