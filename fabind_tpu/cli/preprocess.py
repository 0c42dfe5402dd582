"""Preprocessing CLI: raw inputs -> the NPZ store consumed by NPZSource.

Replaces the reference's 3-script preprocessing pipeline plus its offline
tools with one command:

- inference mode: an index CSV of (name, smiles, pdb_file) pairs ->
  conformer generation + 56-d featurization + LAS mask + protein extraction
  + ESM2 embeddings (reference inference_preprocess_mol_confs.py,
  inference_preprocess_protein.py, FABind/README.md:95-125). Rows may
  carry an `sdf` column instead of generating a conformer from SMILES:
  the given conformer is featurized by the pure-Python V2000 reader
  (featurize.featurize_sdf — no RDKit needed).
- pdbbind mode: the reference's preprocessed LMDB dataset directory ->
  NPZ store (so the portable format has a producer from the standard
  distribution without RDKit).
- esm mode: a FASTA-like txt or the protein LMDB -> ESM2 embeddings only
  (reference tools/generate_esm2_t33.py:20-53).

Isomorphism injection for the FABind+ permutation-invariant loss
(tools/inject_isomorphism_to_data.py:30-47) runs automatically when
--isomorphisms is set (networkx VF2 instead of graph-tool).

Usage:
  python -m fabind_tpu.cli.preprocess inference --index pairs.csv --out npz/
  python -m fabind_tpu.cli.preprocess pdbbind --data /path/pdbbind --out npz/
  python -m fabind_tpu.cli.preprocess esm --seqs seqs.txt --out esm/
"""
from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _mol_record(smiles: str, seed: int, num_conformers: int = 1):
    """smiles -> conformer(s) + features (inference_preprocess_mol_confs.py:
    26-40 get_mol_info)."""
    from fabind_tpu.data.featurize import (featurize_mol,
                                           generate_conformation, read_smiles)
    mol = read_smiles(smiles)
    recs = []
    for c in range(num_conformers):
        conf = generate_conformation(mol, seed=seed + c)
        recs.append(featurize_mol(conf))
    return recs


def _maybe_isomorphisms(rec, max_iso: int):
    """Reference-exact automorphism labels (FABind_plus
    isomorphism.py:49-62): atomic_number*100 + incident-bond-order-sum, so
    element-equal atoms with different bonding cannot permute. max_iso<=0
    stores the FULL group (HARD_ISO_LIMIT-bounded) — the default, so
    eval-time symmetric RMSD via Loader meta is genuinely uncapped; the
    collator re-caps the device copy for the permutation loss."""
    from fabind_tpu.data.isomorphism import (automorphisms_from_graph,
                                             iso_labels_from_arrays)
    feats = rec["feats"]
    labels = rec.get("iso_labels")
    if labels is None:
        labels = iso_labels_from_arrays(feats, rec["bond_edges"],
                                        rec.get("bond_orders"))
    return automorphisms_from_graph(
        feats.shape[0], rec["bond_edges"], labels,
        max_iso=(max_iso if max_iso and max_iso > 0 else None))


def _safe_mol_record(row, seed, n_conf):
    """skip-and-continue per ligand (reference fabind_inference.py:374-375
    wraps the whole batch; one bad SMILES must not abort the run). Module
    level so multiprocessing.Pool can pickle it.

    Rows with an `sdf` column use the given conformer via the pure-Python
    V2000 featurizer (works without RDKit; featurize.featurize_sdf);
    otherwise conformers are generated from the `smiles` column (RDKit)."""
    sdf = (row.get("sdf") or "").strip()
    try:
        if sdf:
            from fabind_tpu.data.featurize import featurize_sdf
            return [featurize_sdf(sdf)]
        return _mol_record(row["smiles"], seed, n_conf)
    except Exception as e:
        _log(f"skip {sdf or row.get('smiles')!r}: {type(e).__name__}: {e}")
        return None


def run_inference_mode(args):
    from fabind_tpu.data.featurize import (extract_esm_feature,
                                           extract_protein_structure)
    os.makedirs(args.out, exist_ok=True)
    with open(args.index) as f:
        rows = list(csv.DictReader(f))
    _log(f"{len(rows)} complexes")

    if args.workers > 1:
        from multiprocessing import Pool
        with Pool(args.workers) as pool:
            mol_recs = pool.starmap(
                _safe_mol_record,
                [(r, args.seed, args.num_conformers) for r in rows])
    else:
        mol_recs = [_safe_mol_record(r, args.seed, args.num_conformers)
                    for r in rows]

    protein_cache = {}
    n_ok = 0
    for row, recs in zip(rows, mol_recs):
        if recs is None:
            continue
        try:
            pdb_file = row["pdb_file"]
            if pdb_file not in protein_cache:
                st = extract_protein_structure(pdb_file)
                esm = extract_esm_feature(st["seq"], device=args.esm_device)
                protein_cache[pdb_file] = (st, esm)
            st, esm = protein_cache[pdb_file]
            for c, rec in enumerate(recs):
                suffix = f"_conf{c}" if len(recs) > 1 else ""
                out = {
                    "protein_xyz": st["coords"][:, 1],     # CA
                    "protein_full_coords": st["coords"],
                    "esm_feat": esm,
                    "lig_coords": rec["coords"],           # conformer (no GT)
                    "lig_feats": rec["feats"],
                    "bond_edges": rec["bond_edges"],
                    "bond_orders": rec["bond_orders"],
                    "iso_labels": rec["iso_labels"],
                    "las_mask": rec["las_mask"],
                    "rdkit_coords": rec["coords"],
                    "smiles": np.asarray(rec["smiles"]
                                         or row.get("smiles") or ""),
                    "seq": np.asarray(st["seq"]),
                }
                if args.isomorphisms:
                    out["isomorphisms"] = _maybe_isomorphisms(
                        rec, args.max_iso)
                np.savez(os.path.join(args.out,
                                      row["name"] + suffix + ".npz"), **out)
            n_ok += 1
        except Exception as e:  # skip-and-continue (reference
            # fabind_inference.py:374-375 / dataset skips)
            _log(f"SKIP {row.get('name')}: {type(e).__name__}: {e}")
    _log(f"wrote {n_ok}/{len(rows)} complexes -> {args.out}")


def run_pdbbind_mode(args):
    from fabind_tpu.data.dataset import PDBBindLMDBSource
    src = PDBBindLMDBSource(args.data, use_esm2_feat=True)
    os.makedirs(args.out, exist_ok=True)
    idxs = range(len(src.index)) if args.limit is None else \
        range(min(args.limit, len(src.index)))
    n_ok = 0
    for i in idxs:
        try:
            raw = src.get(i)
            name = str(raw.get("pdb", i))
            if args.isomorphisms and raw.get("isomorphisms") is None:
                from fabind_tpu.data.isomorphism import (
                    automorphisms_from_graph, iso_labels_from_arrays)
                labels = iso_labels_from_arrays(
                    raw["lig_feats"], raw["bond_edges"],
                    raw.get("bond_orders"))
                raw["isomorphisms"] = automorphisms_from_graph(
                    raw["lig_feats"].shape[0], raw["bond_edges"], labels,
                    max_iso=(args.max_iso if args.max_iso > 0 else None))
            raw.pop("group", None)
            np.savez(os.path.join(args.out, f"{name}.npz"),
                     **{k: v for k, v in raw.items() if v is not None})
            n_ok += 1
        except Exception as e:
            _log(f"SKIP {i}: {type(e).__name__}: {e}")
    _log(f"wrote {n_ok} complexes -> {args.out}")


# int-code -> residue letter of the reference's protein_1d_3d.lmdb seq
# encoding (generate_esm2_t33.py:13-18; fixed by the published dataset format)
_NUM_TO_LETTER = {4: "C", 3: "D", 15: "S", 5: "Q", 11: "K", 9: "I",
                  14: "P", 16: "T", 13: "F", 0: "A", 7: "G", 8: "H",
                  6: "E", 10: "L", 1: "R", 17: "W", 19: "V",
                  2: "N", 18: "Y", 12: "M"}


def run_inject_iso_mode(args):
    """data.pt -> data_new.pt with the `isomorphics` column: the
    reference's offline store upgrade for FABind+ permutation-invariant
    training (FABind_plus/fabind/tools/inject_isomorphism_to_data.py:30-47)
    — but computed from the compound graphs ALREADY IN the LMDB store
    (networkx VF2 over atomic-number*100 + bond-order-sum labels,
    data/isomorphism.py — the same label scheme as the reference's
    isomorphic_core) instead of re-reading a renumbered-SDF directory
    through RDKit. Rows with use_compound_com=False get an empty list,
    exactly like the reference (:35-37)."""
    import pandas as pd
    import torch

    from fabind_tpu.data.dataset import PDBBindLMDBSource
    from fabind_tpu.data.isomorphism import (automorphisms_from_graph,
                                             iso_labels_from_arrays)

    proc = os.path.join(args.data, "dataset", "processed")
    src = PDBBindLMDBSource(args.data, use_esm2_feat=False)
    # the source's own dataframe (data_new.pt when present, else data.pt):
    # injection then re-upgrades in place without a row-index mismatch
    df = src.index.copy()
    isomorphics = []
    n_nontrivial = 0
    for i in range(len(df)):
        if not bool(df.iloc[i].get("use_compound_com", True)):
            isomorphics.append([])
            continue
        raw = src.get(i)
        labels = iso_labels_from_arrays(raw["lig_feats"],
                                        raw["bond_edges"],
                                        raw.get("bond_orders"))
        autos = automorphisms_from_graph(
            raw["lig_feats"].shape[0], raw["bond_edges"], labels,
            max_iso=(args.max_iso if args.max_iso > 0 else None))
        isomorphics.append([np.asarray(a, np.int64) for a in autos])
        if len(autos) > 1:
            n_nontrivial += 1
    df = pd.DataFrame({**df.to_dict(orient="dict"),
                       "isomorphics": dict(enumerate(isomorphics))})
    out = os.path.join(proc, "data_new.pt")
    torch.save(df, out)
    _log(f"wrote {out}: {len(df)} rows, "
         f"{n_nontrivial} with a non-trivial automorphism group")


def run_esm_lmdb_mode(args):
    """protein_1d_3d.lmdb -> esm2_t33_650M_UR50D.lmdb, the reference's
    offline embedding pass (tools/generate_esm2_t33.py:25-53) — here
    batched (and, with --esm-dp, sharded over a device mesh) instead of
    the reference's strictly sequential single-GPU loop."""
    import pickle

    from fabind_tpu.data.featurize import extract_esm_features
    from fabind_tpu.data.kv import open_kv
    p = os.path.join(args.lmdb, "dataset", "processed")
    src = open_kv(os.path.join(p, "protein_1d_3d.lmdb"), readonly=True)
    dst = open_kv(os.path.join(p, "esm2_t33_650M_UR50D.lmdb"),
                  readonly=False, map_size=1024 ** 4)
    n = 0
    # flush in chunks of a few forwards' worth so bucketing has material
    # to batch while memory stays bounded
    chunk_rows = max(1, args.esm_batch * max(args.esm_dp, 1)) * 4
    with src.begin(write=False) as txn, dst.begin(write=True) as out:
        pending = []

        def flush():
            nonlocal n
            if not pending:
                return
            embs = extract_esm_features(
                [s for _, s in pending], device=args.esm_device,
                batch_size=args.esm_batch, dp=args.esm_dp)
            for (key, _), emb in zip(pending, embs):
                out.put(key, pickle.dumps(emb))
                n += 1
                if n % 100 == 0:
                    _log(f"{n} proteins embedded")
            pending.clear()

        for key, value in txn.cursor():
            seq_ids = pickle.loads(value)[1].tolist()
            pending.append(
                (key, "".join(_NUM_TO_LETTER[a] for a in seq_ids)))
            if len(pending) >= chunk_rows:
                flush()
        flush()
    src.close()
    dst.close()
    _log(f"wrote {n} embeddings -> {p}/esm2_t33_650M_UR50D.lmdb")


def run_esm_mode(args):
    """Batch ESM2 embedding tool (tools/generate_esm2_t33.py:20-53)."""
    if args.lmdb:
        return run_esm_lmdb_mode(args)
    if not (args.seqs and args.out):
        raise SystemExit("esm mode needs --seqs AND --out (or --lmdb)")
    from fabind_tpu.data.featurize import extract_esm_features
    os.makedirs(args.out, exist_ok=True)
    with open(args.seqs) as f:
        entries = []
        name = None
        parts = []
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if name:
                    entries.append((name, "".join(parts)))
                name, parts = line[1:], []
            elif line:
                parts.append(line)
        if name:
            entries.append((name, "".join(parts)))
    embs = extract_esm_features([s for _, s in entries],
                                device=args.esm_device,
                                batch_size=args.esm_batch, dp=args.esm_dp)
    for (name, _), emb in zip(entries, embs):
        np.save(os.path.join(args.out, f"{name}.npy"), emb)
        _log(f"{name}: {emb.shape}")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="mode", required=True)

    pi = sub.add_parser("inference")
    pi.add_argument("--index", required=True,
                    help="CSV with columns name,smiles,pdb_file")
    pi.add_argument("--out", required=True)
    pi.add_argument("--num-conformers", type=int, default=1)
    pi.add_argument("--workers", type=int, default=1)
    pi.add_argument("--seed", type=int, default=2024)
    pi.add_argument("--esm-device", default="cpu")
    pi.add_argument("--isomorphisms", action="store_true")
    pi.add_argument("--max-iso", type=int, default=0,
                    help="cap stored automorphisms (0 = full group; the "
                         "collator caps the device copy separately)")

    pp = sub.add_parser("pdbbind")
    pp.add_argument("--data", required=True,
                    help="reference preprocessed PDBbind root")
    pp.add_argument("--out", required=True)
    pp.add_argument("--limit", type=int, default=None)
    pp.add_argument("--isomorphisms", action="store_true")
    pp.add_argument("--max-iso", type=int, default=0,
                    help="cap stored automorphisms (0 = full group)")

    pj = sub.add_parser(
        "inject-iso",
        help="upgrade a reference-layout store's data.pt to data_new.pt "
             "with the isomorphics column (the reference's "
             "tools/inject_isomorphism_to_data.py, RDKit-free)")
    pj.add_argument("--data", required=True,
                    help="reference preprocessed PDBbind root")
    pj.add_argument("--max-iso", type=int, default=0,
                    help="cap stored automorphisms (0 = full group)")

    pe = sub.add_parser("esm")
    pe.add_argument("--seqs", default=None, help="FASTA file")
    pe.add_argument("--out", default=None)
    pe.add_argument("--lmdb", default=None,
                    help="PDBbind root: embed protein_1d_3d.lmdb into "
                         "esm2_t33_650M_UR50D.lmdb instead of FASTA->npy")
    pe.add_argument("--esm-device", default="cpu",
                    help="'jax' runs the TPU-native flax ESM2 encoder")
    pe.add_argument("--esm-batch", type=int, default=8,
                    help="sequences per device per forward (jax device "
                         "only; torch devices embed one at a time)")
    pe.add_argument("--esm-dp", type=int, default=1,
                    help="shard each embedding batch over this many "
                         "devices (jax device only)")

    args = p.parse_args(argv)
    if args.mode == "inference":
        run_inference_mode(args)
    elif args.mode == "pdbbind":
        run_pdbbind_mode(args)
    elif args.mode == "inject-iso":
        run_inject_iso_mode(args)
    else:
        run_esm_mode(args)


if __name__ == "__main__":
    main()
