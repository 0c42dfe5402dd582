"""Custom-complex inference: (smiles, pdb) pairs -> docked SDF poses.

Single-command counterpart of the reference's 3-script pipeline
(FABind/README.md:95-125: inference_preprocess_mol_confs.py +
inference_preprocess_protein.py + fabind_inference.py), built on the
persistent serving engine (fabind_tpu.serve.DockingEngine): featurize
host-side (RDKit/BioPython/ESM2), dock in one jit per shape bucket,
optionally post-optimize on-device (batched; replaces the per-mol CPU Adam
loop, fabind_inference.py:373), and write SDF files in the original PDB
world frame (coord_offset restored, fabind_inference_dataset.py:74-75).

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

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="fabind",
                   choices=["fabind", "fabind_plus", "fabflex"])
    p.add_argument("--ckpt", required=True)
    p.add_argument("--index", required=True, help="csv with SMILES + pdb ids")
    p.add_argument("--pdb-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--post-optim", action="store_true")
    p.add_argument("--post-optim-steps", type=int, default=1000)
    p.add_argument("--bf16", action="store_true",
                   help="serve in bfloat16 (the benchmarked deployment "
                        "dtype); default fp32")
    p.add_argument("--esm-device", default="cpu")
    p.add_argument("--write-mol2", action="store_true")
    p.add_argument("--ligand-sdf-dir", default=None,
                   help="dock SDF conformers instead of generating them "
                        "from SMILES: per row, the ligand is "
                        "DIR/{id}/{id}_ligand.sdf or DIR/{id}.sdf (the "
                        "reference's gt_mol_files layout). Works without "
                        "RDKit (pure V2000 reader/writer).")
    args = p.parse_args(argv)

    from fabind_tpu.config import preset
    from fabind_tpu.serve import DockingEngine

    cfg = preset(args.preset)
    os.makedirs(args.output, exist_ok=True)

    engine = DockingEngine(
        cfg, ckpt=args.ckpt, batch_size=args.batch_size, bf16=args.bf16,
        post_optim_steps=args.post_optim_steps if args.post_optim else 0,
        esm_device=args.esm_device)
    if hasattr(engine, "ckpt_report"):
        r = engine.ckpt_report
        print(f"ckpt: {r['n_torch']} tensors, missing={len(r['missing'])}, "
              f"unused={len(r['unused'])}")

    rows = list(csv.DictReader(open(args.index)))
    requests, metas = [], []
    for row in rows:
        smiles = row.get("Cleaned_SMILES") or row.get("smiles")
        pdb = row.get("pdb_file") or row.get("pdb") or row.get("pdb_id")
        lig_id = row.get("ligand_id") or pdb
        if args.ligand_sdf_dir:
            cand = [os.path.join(args.ligand_sdf_dir, lig_id,
                                 lig_id + "_ligand.sdf"),
                    os.path.join(args.ligand_sdf_dir, lig_id + ".sdf")]
            lig = next((c for c in cand if os.path.exists(c)), cand[-1])
            requests.append((lig, os.path.join(args.pdb_dir, pdb + ".pdb")))
            metas.append({"smiles": smiles or lig_id, "pdb": pdb})
        else:
            requests.append(
                (smiles, os.path.join(args.pdb_dir, pdb + ".pdb")))
            metas.append({"smiles": smiles, "pdb": pdb})

    poses = (engine.dock_sdf(requests) if args.ligand_sdf_dir
             else engine.dock_smiles(requests))

    # ---- write SDFs ----
    index_rows = []
    n_skipped = 0
    for meta, pose in zip(metas, poses):
        # skip-and-continue on bad inputs (reference
        # fabind_inference.py:366-375 wraps each batch in try/except)
        if pose.error is not None:
            n_skipped += 1
            print(f"SKIP {meta['pdb']} / {meta['smiles'][:40]}: {pose.error}")
            continue
        # deterministic across runs (str hash() is randomized per process)
        import zlib
        name = f"{meta['pdb']}_{zlib.crc32(meta['smiles'].encode()):08x}"
        # two rows that fall back to the same (pdb, ligand-id) — e.g.
        # --ligand-sdf-dir rows with neither smiles nor ligand_id — must
        # not overwrite each other's SDF: disambiguate by row order
        if any(r["sdf"] == os.path.join(args.output, name + ".sdf")
               for r in index_rows):
            k = 2
            while any(r["sdf"] == os.path.join(
                    args.output, f"{name}_r{k}.sdf") for r in index_rows):
                k += 1
            name = f"{name}_r{k}"
        sdf = os.path.join(args.output, name + ".sdf")
        if pose.sdf_meta is not None:    # dock_sdf: RDKit-free writer
            from fabind_tpu.data.featurize import write_sdf
            write_sdf(sdf, pose.sdf_meta["symbols"], pose.coords,
                      pose.sdf_meta["bonds"], name=name,
                      charges=pose.sdf_meta["charges"])
        else:
            from rdkit import Chem
            from rdkit.Geometry import Point3D
            mol = pose.mol
            conf = mol.GetConformer()
            for i in range(mol.GetNumAtoms()):
                x, y, z = map(float, pose.coords[i])
                conf.SetAtomPosition(i, Point3D(x, y, z))
            w = Chem.SDWriter(sdf)
            w.SetKekulize(False)
            w.write(mol)
            w.close()
        row = {"pdb": meta["pdb"], "smiles": meta["smiles"], "sdf": sdf}
        if cfg.model.flexible_docking and pose.pocket_coords is not None:
            pkt_npz = os.path.join(args.output, name + "_pocket.npz")
            np.savez(pkt_npz, coords=pose.pocket_coords,
                     residues=pose.pocket_residues)
            row["pocket"] = pkt_npz
        index_rows.append(row)
        if args.write_mol2:
            _convert_sdf_to_mol2(sdf, sdf[:-4] + ".mol2")
    if n_skipped:
        print(f"skipped {n_skipped}/{len(rows)} complexes")
    fields = ["pdb", "smiles", "sdf"]
    if cfg.model.flexible_docking:
        fields.append("pocket")
    with open(os.path.join(args.output, "index.csv"), "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=fields)
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
