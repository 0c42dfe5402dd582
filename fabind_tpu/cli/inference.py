"""Custom-complex inference: (smiles, pdb) pairs -> docked SDF poses.

Single-command counterpart of the reference's 3-script pipeline
(FABind/README.md:95-125: inference_preprocess_mol_confs.py +
inference_preprocess_protein.py + fabind_inference.py): featurize host-side
(RDKit/BioPython/ESM2), dock in one jit, optionally post-optimize on-device
(batched; replaces the per-mol CPU Adam loop, fabind_inference.py:373), and
write SDF files in the original PDB world frame (coord_offset restored,
fabind_inference_dataset.py:74-75).

Usage:
  python -m fabind_tpu.cli.inference --preset fabind --ckpt best_model.bin \
      --index example.csv --pdb-dir pdbs/ --output out/ [--post-optim]

index CSV columns: Cleaned_SMILES, pdb_file (as in
FABind/inference_examples/example.csv).
"""
from __future__ import annotations

import argparse
import csv
import os
import time

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="fabind",
                   choices=["fabind", "fabind_plus"])
    p.add_argument("--ckpt", required=True)
    p.add_argument("--index", required=True, help="csv with SMILES + pdb ids")
    p.add_argument("--pdb-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--post-optim", action="store_true")
    p.add_argument("--esm-device", default="cpu")
    p.add_argument("--write-mol2", action="store_true")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from fabind_tpu.config import preset
    from fabind_tpu.data import featurize as F
    from fabind_tpu.data.batching import build_sample, collate
    from fabind_tpu.data.types import dummy_batch
    from fabind_tpu.models.fabind import make_model
    from fabind_tpu.postopt import post_optimize_batch_jit
    from fabind_tpu.train.convert import convert_checkpoint

    cfg = preset(args.preset)
    model = make_model(cfg)
    os.makedirs(args.output, exist_ok=True)

    # load weights
    k = jax.random.PRNGKey(0)
    tmpl = dummy_batch(cfg.shapes, batch_size=1)
    variables = jax.jit(lambda: model.init(
        {"params": k, "dropout": k, "sample": k}, tmpl, train=False,
        stage=2))()
    params, report = convert_checkpoint(args.ckpt, variables["params"])
    params = jax.tree_util.tree_map(jnp.asarray, params)
    print(f"ckpt: {report['n_torch']} tensors, "
          f"missing={len(report['missing'])}, unused={len(report['unused'])}")

    # ---- host featurization (reference pipeline steps 1+2) ----
    rows = list(csv.DictReader(open(args.index)))
    protein_cache = {}
    samples, metas = [], []
    n_skipped = 0
    for row in rows:
        smiles = row.get("Cleaned_SMILES") or row.get("smiles")
        pdb = row.get("pdb_file") or row.get("pdb")
        t0 = time.time()
        # skip-and-continue on bad inputs (reference
        # fabind_inference.py:366-375 wraps each batch in try/except)
        try:
            mol = F.read_smiles(smiles)
            mol = F.generate_conformation(mol)
            feat = F.featurize_mol(mol)
            if pdb not in protein_cache:
                struct = F.extract_protein_structure(
                    os.path.join(args.pdb_dir, pdb + ".pdb"))
                esm = F.extract_esm_feature(struct["seq"],
                                            device=args.esm_device)
                protein_cache[pdb] = (struct, esm)
            struct, esm = protein_cache[pdb]
            raw = {
                "protein_xyz": struct["coords"][:, 1],   # CA
                "esm_feat": esm,
                "lig_coords": feat["coords"],             # no gt: conformer
                "lig_feats": feat["feats"],
                "bond_edges": feat["bond_edges"],
                "las_mask": feat["las_mask"],
                "rdkit_coords": feat["coords"],
            }
            s = build_sample(raw, cfg, group="test")
        except Exception as e:
            n_skipped += 1
            print(f"SKIP {pdb} / {smiles[:40]}: {type(e).__name__}: {e}")
            continue
        samples.append(s)
        metas.append({"smiles": smiles, "pdb": pdb, "mol": mol,
                      "coord_offset": s["coord_offset"],
                      "t_feat": time.time() - t0})
    if n_skipped:
        print(f"skipped {n_skipped}/{len(rows)} complexes")
    if not samples:
        print("no valid complexes")
        return

    @jax.jit
    def infer(params, batch):
        return model.apply({"params": params}, batch, method="inference")

    results = []
    bs = args.batch_size
    for i in range(0, len(samples), bs):
        chunk = samples[i:i + bs]
        metas_chunk = metas[i:i + bs]
        n_real = len(chunk)
        while len(chunk) < bs:
            chunk.append(chunk[-1])
        batch = collate(chunk, cfg)
        coords, conf = infer(params, batch)
        if args.post_optim:
            coords, _ = post_optimize_batch_jit(
                coords, batch.lig_rdkit_coords, batch.las_adj,
                batch.lig_mask, steps=1000)
        coords = np.asarray(coords)
        for b in range(n_real):
            meta = metas_chunk[b]
            n = meta["mol"].GetNumAtoms()
            world = coords[b, :n] + meta["coord_offset"]
            results.append((meta, world))

    # ---- write SDFs ----
    from rdkit import Chem
    from rdkit.Geometry import Point3D
    index_rows = []
    for meta, world in results:
        mol = meta["mol"]
        conf = mol.GetConformer()
        for i in range(mol.GetNumAtoms()):
            x, y, z = map(float, world[i])
            conf.SetAtomPosition(i, Point3D(x, y, z))
        name = f"{meta['pdb']}_{abs(hash(meta['smiles'])) % 10**8}"
        sdf = os.path.join(args.output, name + ".sdf")
        w = Chem.SDWriter(sdf)
        w.SetKekulize(False)
        w.write(mol)
        w.close()
        index_rows.append({"pdb": meta["pdb"], "smiles": meta["smiles"],
                           "sdf": sdf})
        if args.write_mol2:
            _convert_sdf_to_mol2(sdf, sdf[:-4] + ".mol2")
    with open(os.path.join(args.output, "index.csv"), "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=["pdb", "smiles", "sdf"])
        wtr.writeheader()
        wtr.writerows(index_rows)
    print(f"wrote {len(index_rows)} poses to {args.output}")


def _convert_sdf_to_mol2(sdf: str, mol2: str):
    """SDF->MOL2 (reference uses openbabel, utils/sdf_to_mol2.py:3-11);
    optional, skipped when openbabel is unavailable."""
    try:
        from openbabel import pybel
    except ImportError:
        return
    m = next(pybel.readfile("sdf", sdf))
    m.write("mol2", mol2, overwrite=True)


if __name__ == "__main__":
    main()
