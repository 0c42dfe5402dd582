"""Virtual screening through the resident engine.

The protein is featurized and uploaded once; every batch of ligands reuses
the device-resident tensors (see DockingEngine.dock_screen).
"""
from fabind_tpu import DockingEngine, preset
from fabind_tpu.data import featurize as F

engine = DockingEngine(preset("fabind"), ckpt="ckpt/best_model.bin",
                       batch_size=16, bf16=True)

struct = F.extract_protein_structure("target.pdb")   # BioPython or pure-Py
esm = F.extract_esm_feature(struct["seq"])           # HF torch or device="jax"
protein = {"protein_xyz": struct["coords"][:, 1], "esm_feat": esm}

ligands = []
for smiles in open("library.smi"):
    mol = F.generate_conformation(F.read_smiles(smiles.strip()))
    feat = F.featurize_mol(mol)
    ligands.append({"lig_coords": feat["coords"], "lig_feats": feat["feats"],
                    "bond_edges": feat["bond_edges"],
                    "las_mask": feat["las_mask"],
                    "rdkit_coords": feat["coords"]})

poses = engine.dock_screen(protein, ligands)
best = max((p for p in poses if p.error is None), key=lambda p: p.confidence)
print("best pose confidence:", best.confidence)
