"""Host-side chem/bio featurization.

Re-implements the reference's L0 featurization without torchdrug / gvp /
torch_geometric:

- the torchdrug `property_prediction` 56-d atom featurizer used via
  `td.Molecule.from_smiles(..., node_feature='property_prediction')`
  (FABind/fabind/utils/feature_utils.py:160-181, inference_mol_utils.py:71-90)
  is re-derived in pure RDKit/numpy — the feature is
  onehot(symbol, 17-vocab+unk) ++ onehot(degree, 0..6+unk) ++
  onehot(total_num_hs, 0..6+unk) ++ onehot(total_valence, 0..7+unk) ++
  onehot(formal_charge, -5..5+unk) ++ [is_aromatic]  == 56 dims;
- the LAS constraint mask (bonds ∪ 2-hop ∪ shared-SSSR-ring,
  feature_utils.py:97-128);
- protein cleaning/extraction (inference_pdb_utils.py:15-60);
- ESM2-t33-650M per-residue embeddings via HF transformers
  (inference_pdb_utils.py:63-89 uses fair-esm; layer-33 representations,
  BOS/EOS stripped).

RDKit / BioPython / transformers are imported lazily; everything pure is
importable without them.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# torchdrug vocabularies (torchdrug/data/feature.py), fixed by the released
# checkpoints' input layout — do not reorder.
ATOM_VOCAB = ["H", "B", "C", "N", "O", "F", "Mg", "Si", "P", "S", "Cl",
              "Cu", "Zn", "Se", "Br", "Sn", "I"]
DEGREE_VOCAB = list(range(7))
NUM_HS_VOCAB = list(range(7))
TOTAL_VALENCE_VOCAB = list(range(8))
FORMAL_CHARGE_VOCAB = list(range(-5, 6))

COMPOUND_FEATURE_DIM = (len(ATOM_VOCAB) + 1 + len(DEGREE_VOCAB) + 1 +
                        len(NUM_HS_VOCAB) + 1 + len(TOTAL_VALENCE_VOCAB) + 1 +
                        len(FORMAL_CHARGE_VOCAB) + 1 + 1)
assert COMPOUND_FEATURE_DIM == 56

THREE_TO_ONE = {
    'ALA': 'A', 'CYS': 'C', 'ASP': 'D', 'GLU': 'E', 'PHE': 'F', 'GLY': 'G',
    'HIS': 'H', 'ILE': 'I', 'LYS': 'K', 'LEU': 'L', 'MET': 'M', 'ASN': 'N',
    'PRO': 'P', 'GLN': 'Q', 'ARG': 'R', 'SER': 'S', 'THR': 'T', 'VAL': 'V',
    'TRP': 'W', 'TYR': 'Y'}


def onehot(value, vocab: Sequence, allow_unknown: bool = True) -> List[float]:
    """torchdrug-style one-hot with trailing unknown slot."""
    feat = [0.0] * (len(vocab) + int(allow_unknown))
    try:
        idx = list(vocab).index(value)
    except ValueError:
        idx = -1
    if idx == -1 and not allow_unknown:
        raise ValueError(f"unknown value {value!r} for vocab {vocab!r}")
    feat[idx] = 1.0
    return feat


def atom_property_prediction_feature(symbol: str, degree: int,
                                     total_num_hs: int, total_valence: int,
                                     formal_charge: int,
                                     is_aromatic: bool) -> np.ndarray:
    """Pure 56-d feature from atom attributes (testable without RDKit)."""
    return np.asarray(
        onehot(symbol, ATOM_VOCAB) + onehot(degree, DEGREE_VOCAB) +
        onehot(total_num_hs, NUM_HS_VOCAB) +
        onehot(total_valence, TOTAL_VALENCE_VOCAB) +
        onehot(formal_charge, FORMAL_CHARGE_VOCAB) + [float(is_aromatic)],
        dtype=np.float32)


def n_hops_adj(adj: np.ndarray, n_hops: int) -> np.ndarray:
    """Hop-distance matrix up to n_hops (feature_utils.py:97-107)."""
    n = adj.shape[0]
    eye = np.eye(n, dtype=np.int64)
    mats = [eye, ((adj + eye) > 0).astype(np.int64)]
    for i in range(2, n_hops + 1):
        mats.append(((mats[i - 1] @ mats[1]) > 0).astype(np.int64))
    extend = np.zeros_like(adj, dtype=np.int64)
    for i in range(1, n_hops + 1):
        extend += (mats[i] - mats[i - 1]) * i
    return extend


def las_mask_from_adj_rings(adj: np.ndarray,
                            rings: Sequence[Sequence[int]]) -> np.ndarray:
    """LAS mask = bonds ∪ 2-hop ∪ shared-ring pairs, no self loops
    (feature_utils.py:111-128)."""
    extend = n_hops_adj(adj.astype(np.int64), 2)
    for ring in rings:
        for i in ring:
            for j in ring:
                if i != j:
                    extend[i][j] += 1
    return (extend > 0)


# --------------------------------------------------------------------- RDKit

def _require_rdkit():
    try:
        from rdkit import Chem  # noqa: F401
        return True
    except ImportError as e:
        raise ImportError(
            "RDKit is required for molecule featurization; install rdkit or "
            "use precomputed feature stores") from e


def featurize_mol(mol) -> Dict[str, np.ndarray]:
    """56-d atom features + bond edge list + LAS mask for an RDKit mol whose
    atom order matches its canonical-SMILES output order (the reference's
    renumbering convention, inference_mol_utils.py:122-133).

    Features are computed on the canonical-SMILES-parsed molecule, exactly as
    torchdrug's from_smiles does (feature_utils.py:167).
    """
    _require_rdkit()
    from rdkit import Chem

    smiles = Chem.MolToSmiles(mol)
    smol = Chem.MolFromSmiles(smiles)
    if smol is None:
        raise ValueError(f"unparseable canonical smiles {smiles!r}")
    n = smol.GetNumAtoms()
    feats = np.zeros((n, COMPOUND_FEATURE_DIM), np.float32)
    for i, atom in enumerate(smol.GetAtoms()):
        feats[i] = atom_property_prediction_feature(
            atom.GetSymbol(), atom.GetDegree(), atom.GetTotalNumHs(),
            atom.GetTotalValence(), atom.GetFormalCharge(),
            atom.GetIsAromatic())

    bonds = []
    for b in smol.GetBonds():
        i, j = b.GetBeginAtomIdx(), b.GetEndAtomIdx()
        o = b.GetBondTypeAsDouble()          # 1.0/2.0/3.0/1.5(aromatic)
        bonds.append((i, j, o))
        bonds.append((j, i, o))
    bonds.sort()
    bond_edges = np.asarray([(i, j) for i, j, _ in bonds],
                            np.int64).reshape(-1, 2)
    bond_orders = np.asarray([o for _, _, o in bonds], np.float32)

    # reference-exact automorphism node labels (FABind_plus
    # isomorphism.py:49-62 atomGetnum): atomic_num*100 + incident
    # bond-type-index sum
    from fabind_tpu.data.isomorphism import ref_bond_index_from_order
    iso_labels = np.asarray(
        [a.GetAtomicNum() * 100 for a in smol.GetAtoms()], np.int64)
    for b in smol.GetBonds():
        idx = ref_bond_index_from_order(b.GetBondTypeAsDouble())
        iso_labels[b.GetBeginAtomIdx()] += idx
        iso_labels[b.GetEndAtomIdx()] += idx

    # LAS mask on the *original* conformer mol (feature_utils.py:113)
    adj = np.asarray(Chem.GetAdjacencyMatrix(mol))
    rings = [list(r) for r in Chem.GetSymmSSSR(mol)]
    las = las_mask_from_adj_rings(adj, rings)

    coords = np.asarray(mol.GetConformer().GetPositions(), np.float32)
    assert coords.shape[0] == n, (
        "atom order mismatch between conformer mol and canonical smiles; "
        "renumber the mol first (see read_smiles/renumber convention)")
    return {"coords": coords, "feats": feats, "bond_edges": bond_edges,
            "bond_orders": bond_orders, "iso_labels": iso_labels,
            "las_mask": las.astype(bool), "smiles": smiles}


def canonical_renumber(mol):
    """Renumber a mol's atoms to canonical-SMILES output order — the atom
    convention all released checkpoints were trained with
    (inference_mol_utils.py:122-133). Conformers are reordered too."""
    _require_rdkit()
    from rdkit import Chem
    Chem.MolToSmiles(mol)  # populates _smilesAtomOutputOrder
    order = list(mol.GetPropsAsDict(
        includePrivate=True, includeComputed=True)["_smilesAtomOutputOrder"])
    return Chem.RenumberAtoms(mol, order)


def read_smiles(smiles: str):
    """Canonicalize and renumber so atom order == canonical-SMILES order
    (inference_mol_utils.py:122-133)."""
    _require_rdkit()
    from rdkit import Chem
    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        raise ValueError(f"bad smiles {smiles!r}")
    return canonical_renumber(mol)


def generate_conformation(mol, seed: Optional[int] = None):
    """ETKDGv2 + MMFF conformer (inference_mol_utils.py:135-144)."""
    _require_rdkit()
    from rdkit import Chem
    from rdkit.Chem import AllChem
    mol = Chem.AddHs(mol)
    ps = AllChem.ETKDGv2()
    if seed is not None:
        ps.randomSeed = seed
    rid = AllChem.EmbedMolecule(mol, ps)
    if rid == -1:
        ps.useRandomCoords = True
        rid = AllChem.EmbedMolecule(mol, ps)
        if rid == -1:
            AllChem.Compute2DCoords(mol)
        else:
            AllChem.MMFFOptimizeMolecule(mol, confId=0)
    else:
        AllChem.MMFFOptimizeMolecule(mol, confId=0)
    return Chem.RemoveHs(mol)


def mol_from_sdf(sdf_path: str, mol2_path: Optional[str] = None):
    """read_mol with mol2 fallback (utils/utils.py:20-48)."""
    _require_rdkit()
    from rdkit import Chem
    mol = Chem.MolFromMolFile(sdf_path, sanitize=False)
    try:
        Chem.SanitizeMol(mol)
        return Chem.RemoveHs(mol)
    except Exception:
        if mol2_path is None:
            raise
    mol = Chem.MolFromMol2File(mol2_path, sanitize=False)
    Chem.SanitizeMol(mol)
    return Chem.RemoveHs(mol)


# ------------------------------------------------------------- PDB parsing

def parse_pdb_atoms(pdb_path: str) -> Dict:
    """Pure-Python PDB backbone parser (no BioPython needed).

    Fixed-column ATOM-record extraction producing the same cleaned structure
    as the reference's BioPython path (inference_pdb_utils.py:15-60): keep
    only ATOM records (hetero flag ' ' in BioPython terms) of the standard
    20 residues whose N/CA/C/O are all present; per (model, chain, resseq,
    icode) residue, per atom name keep the highest-occupancy altloc
    (BioPython's disordered-atom selection; first wins on ties).
    """
    residues: Dict = {}          # key -> {atom_name: (occupancy, xyz)}
    order: List = []
    model = 0
    with open(pdb_path) as f:
        for line in f:
            rec = line[:6]
            if rec == "MODEL ":
                try:
                    model = int(line[10:14])
                except ValueError:
                    model += 1
                continue
            if rec != "ATOM  ":
                continue
            resname = line[17:20].strip()
            if resname not in THREE_TO_ONE:
                continue
            name = line[12:16].strip()
            try:
                xyz = (float(line[30:38]), float(line[38:46]),
                       float(line[46:54]))
            except ValueError:
                continue
            try:
                occ = float(line[54:60])
            except (ValueError, IndexError):
                occ = 1.0
            key = (model, line[21], line[22:26], line[26])
            if key not in residues:
                residues[key] = {}
                order.append((key, resname))
            prev = residues[key].get(name)
            if prev is None or occ > prev[0]:
                residues[key][name] = (occ, xyz)
    seq_parts, coords = [], []
    for key, resname in order:
        atoms = residues[key]
        if all(a in atoms for a in ("N", "CA", "C", "O")):
            seq_parts.append(THREE_TO_ONE[resname])
            coords.append([atoms[a][1] for a in ("N", "CA", "C", "O")])
    return {"seq": "".join(seq_parts),
            "coords": np.asarray(coords, np.float32).reshape(-1, 4, 3)}


def sdf_coords(sdf_path: str) -> np.ndarray:
    """Pure-Python V2000 SDF atom-coordinate reader ([n_atoms, 3])."""
    with open(sdf_path) as f:
        lines = f.readlines()
    counts = lines[3]
    if "V3000" in counts:
        raise ValueError("V3000 SDF not supported by the pure reader")
    n_atoms = int(counts[:3])
    out = np.empty((n_atoms, 3), np.float32)
    for i in range(n_atoms):
        ln = lines[4 + i]
        out[i] = (float(ln[0:10]), float(ln[10:20]), float(ln[20:30]))
    return out


# --------------------------------------------- pure-Python SDF featurization

# element -> atomic number, for iso_labels without RDKit (covers the
# ATOM_VOCAB plus common organics; unknowns fall back to 0)
ATOMIC_NUM = {"H": 1, "B": 5, "C": 6, "N": 7, "O": 8, "F": 9, "Na": 11,
              "Mg": 12, "Si": 14, "P": 15, "S": 16, "Cl": 17, "K": 19,
              "Ca": 20, "Fe": 26, "Cu": 29, "Zn": 30, "Se": 34, "Br": 35,
              "Sn": 50, "I": 53}

# default valences for the implicit-H estimate when an SDF carries no
# explicit hydrogens (RDKit's common-element table)
_DEFAULT_VALENCE = {"C": 4, "N": 3, "O": 2, "S": 2, "P": 3, "B": 3,
                    "F": 1, "Cl": 1, "Br": 1, "I": 1}

# V2000 atom-block charge codes (ignored when M  CHG lines are present)
_SDF_CHG_CODE = {0: 0, 1: 3, 2: 2, 3: 1, 5: -1, 6: -2, 7: -3}


def parse_sdf(sdf_path: str) -> Dict:
    """Pure-Python V2000 molfile parser (first record of the file).

    Returns symbols [n], coords [n,3], charges [n] (M CHG overrides the
    atom-block codes, per the ctfile spec), and bonds [(i, j, type)] with
    0-based indices and V2000 type codes (1/2/3 and 4 = aromatic)."""
    with open(sdf_path) as f:
        return parse_sdf_text(f.read())


def parse_sdf_text(text: str) -> Dict:
    """parse_sdf over in-memory molfile text (the HTTP /dock_sdf body)."""
    lines = text.splitlines()
    counts = lines[3]
    if "V3000" in counts:
        raise ValueError("V3000 SDF not supported by the pure reader")
    n_atoms, n_bonds = int(counts[:3]), int(counts[3:6])
    symbols, coords, charges = [], [], []
    for i in range(n_atoms):
        ln = lines[4 + i]
        coords.append((float(ln[0:10]), float(ln[10:20]), float(ln[20:30])))
        symbols.append(ln[31:34].strip())
        try:
            charges.append(_SDF_CHG_CODE.get(int(ln[36:39]), 0))
        except (ValueError, IndexError):
            charges.append(0)
    bonds = []
    for i in range(n_bonds):
        ln = lines[4 + n_atoms + i]
        bonds.append((int(ln[0:3]) - 1, int(ln[3:6]) - 1, int(ln[6:9])))
    m_chg = {}
    for ln in lines[4 + n_atoms + n_bonds:]:
        if ln.startswith("M  END"):
            break
        if ln.startswith("M  CHG"):
            vals = ln.split()[3:]
            for a, c in zip(vals[0::2], vals[1::2]):
                m_chg[int(a) - 1] = int(c)
    if m_chg:   # presence of any M CHG zeroes the atom-block codes
        charges = [m_chg.get(i, 0) for i in range(n_atoms)]
    return {"symbols": symbols,
            "coords": np.asarray(coords, np.float32),
            "charges": np.asarray(charges, np.int64),
            "bonds": bonds}


def _sssr_like_rings(adj: np.ndarray) -> List[List[int]]:
    """Cycle basis of the heavy-atom graph — the pure-Python stand-in for
    RDKit's GetSymmSSSR in the LAS mask (ring count matches SSSR; ring
    membership can differ on bridged polycycles, documented approximation)."""
    import networkx as nx
    g = nx.from_numpy_array(adj)
    return [list(c) for c in nx.cycle_basis(g)]


def featurize_sdf(sdf_path: str) -> Dict[str, np.ndarray]:
    """featurize_mol-equivalent from a V2000 SDF without RDKit.

    Atom order is the SDF's heavy-atom order (NOT canonical-SMILES order —
    without RDKit there is no canonicalizer; for SDF-ligand redocking the
    order only has to be self-consistent, which it is: coords, features,
    bonds and the output writer all use it). Feature semantics vs the
    RDKit path (feature_utils.py:160-181):

    - exact when the SDF carries explicit hydrogens and aromatic bond
      type 4 (the reference's gt_mol_files do): degree = heavy neighbors,
      total_num_hs = explicit H neighbors, formal charge from M CHG,
      is_aromatic from incident type-4 bonds;
    - total_valence = round(sum of bond orders, aromatic = 1.5) + n_H —
      off by one vs RDKit's kekulized count on pyrrole-type aromatic
      heteroatoms (lands in the adjacent one-hot slot);
    - with NO explicit hydrogens, n_H is estimated from default valences
      (C4/N3/O2/...) adjusted by formal charge — an approximation;
    - LAS rings come from a networkx cycle basis (= SSSR count; membership
      may differ on bridged polycycles).

    Use the RDKit path (mol_from_sdf + featurize_mol) when RDKit is
    importable; this fallback keeps SDF-ligand inference available on
    hosts without it."""
    return _featurize_parsed(parse_sdf(sdf_path), sdf_path)


def featurize_sdf_text(text: str) -> Dict[str, np.ndarray]:
    """featurize_sdf over in-memory molfile text."""
    return _featurize_parsed(parse_sdf_text(text), "<sdf text>")


def _featurize_parsed(p: Dict, sdf_path: str) -> Dict[str, np.ndarray]:
    symbols, bonds = p["symbols"], p["bonds"]
    n_all = len(symbols)
    heavy = [i for i in range(n_all) if symbols[i] != "H"]
    remap = {a: k for k, a in enumerate(heavy)}
    n = len(heavy)
    if n == 0:
        raise ValueError(f"{sdf_path}: no heavy atoms")

    n_h = np.zeros(n_all, np.int64)         # explicit H neighbors
    order_sum = np.zeros(n_all, np.float32)  # heavy-bond order sum
    aromatic = np.zeros(n_all, bool)
    adj = np.zeros((n, n), np.int64)
    heavy_bonds = []                         # (i, j, order) heavy, 0-based
    for a, b, t in bonds:
        if symbols[a] == "H" or symbols[b] == "H":
            other = a if symbols[b] == "H" else b
            n_h[other] += 1
            continue
        o = 1.5 if t == 4 else float(t)
        if t == 4:
            aromatic[a] = aromatic[b] = True
        order_sum[a] += o
        order_sum[b] += o
        i, j = remap[a], remap[b]
        adj[i, j] = adj[j, i] = 1
        heavy_bonds.append((i, j, o))

    has_explicit_h = any(s == "H" for s in symbols)
    feats = np.zeros((n, COMPOUND_FEATURE_DIM), np.float32)
    iso_labels = np.zeros(n, np.int64)
    charges = p["charges"]
    # Partial-H inputs (e.g. PDB-ligand exports carrying only polar
    # hydrogens) would silently under-count H on carbons if treated as
    # fully explicit: detect heavy atoms whose bond-order sum + explicit H
    # still falls short of the element's default valence and warn — the
    # caller should either strip or complete the hydrogens.
    if has_explicit_h:
        deficit = [
            symbols[a] for a in heavy
            if int(n_h[a]) == 0 and int(charges[a]) == 0
            and not aromatic[a]
            and 0 < int(round(float(order_sum[a])))
            < _DEFAULT_VALENCE.get(symbols[a], 0)]
        if deficit:
            import warnings
            warnings.warn(
                f"SDF has explicit hydrogens but {len(deficit)} heavy "
                f"atom(s) ({','.join(sorted(set(deficit)))}) still show a "
                "valence deficit with zero H attached — input looks "
                "polar-H-only. All other heavy atoms get H counts from "
                "explicit H only, which is off-distribution for the "
                "released checkpoints (they expect all-or-nothing H).",
                stacklevel=2)
    for k, a in enumerate(heavy):
        sym = symbols[a]
        if has_explicit_h:
            hs = int(n_h[a])
        else:
            default = _DEFAULT_VALENCE.get(sym, 0)
            # cations of N/P gain a bond slot, anions lose one (approx.)
            hs = max(0, default + int(charges[a])
                     - int(round(float(order_sum[a]))))
        valence = int(round(float(order_sum[a]))) + hs
        degree = int(adj[k].sum())
        feats[k] = atom_property_prediction_feature(
            sym, degree, hs, valence, int(charges[a]), bool(aromatic[a]))
        iso_labels[k] = ATOMIC_NUM.get(sym, 0) * 100

    bond_dir = []
    for i, j, o in heavy_bonds:
        from fabind_tpu.data.isomorphism import ref_bond_index_from_order
        idx = ref_bond_index_from_order(o)
        iso_labels[i] += idx
        iso_labels[j] += idx
        bond_dir.append((i, j, o))
        bond_dir.append((j, i, o))
    bond_dir.sort()
    bond_edges = np.asarray([(i, j) for i, j, _ in bond_dir],
                            np.int64).reshape(-1, 2)
    bond_orders = np.asarray([o for _, _, o in bond_dir], np.float32)

    las = las_mask_from_adj_rings(adj, _sssr_like_rings(adj))
    return {"coords": p["coords"][heavy],
            "feats": feats, "bond_edges": bond_edges,
            "bond_orders": bond_orders, "iso_labels": iso_labels,
            "las_mask": las.astype(bool), "smiles": None,
            "symbols": [symbols[a] for a in heavy],
            "heavy_bonds": heavy_bonds,
            "charges": charges[heavy]}


def write_sdf(path: str, symbols: Sequence[str], coords: np.ndarray,
              bonds: Sequence[Tuple[int, int, float]], name: str = "",
              charges: Optional[np.ndarray] = None) -> None:
    """Pure-Python V2000 molfile writer (the no-RDKit counterpart of the
    reference's Chem.SDWriter output, inference_mol_utils.py:146-158).
    bonds: (i, j, order) 0-based with order 1/2/3/1.5 (1.5 -> type 4)."""
    with open(path, "w") as f:
        f.write(sdf_string(symbols, coords, bonds, name=name,
                           charges=charges))


def sdf_string(symbols: Sequence[str], coords: np.ndarray,
               bonds: Sequence[Tuple[int, int, float]], name: str = "",
               charges: Optional[np.ndarray] = None) -> str:
    """write_sdf as a string (HTTP responses)."""
    coords = np.asarray(coords, np.float32)
    n, nb = len(symbols), len(bonds)
    if n > 999 or nb > 999:
        # V2000 counts fields are fixed 3-char columns; overflowing shifts
        # the line and writes a silently corrupt file
        raise ValueError(
            f"V2000 SDF holds at most 999 atoms/bonds (got {n} atoms, "
            f"{nb} bonds); use a different output format for macromolecules")
    lines = [name, "  fabind_tpu", "",
             f"{n:3d}{nb:3d}  0  0  0  0  0  0  0  0999 V2000"]
    for s, (x, y, z) in zip(symbols, coords):
        lines.append(f"{x:10.4f}{y:10.4f}{z:10.4f} {s:<3s} 0  0  0  0  0")
    for i, j, o in bonds:
        t = 4 if o == 1.5 else int(o)
        lines.append(f"{i + 1:3d}{j + 1:3d}{t:3d}  0  0  0")
    if charges is not None:
        chg = [(i, int(c)) for i, c in enumerate(charges) if int(c) != 0]
        for k in range(0, len(chg), 8):
            grp = chg[k:k + 8]
            lines.append("M  CHG" + f"{len(grp):3d}" + "".join(
                f" {i + 1:3d} {c:3d}" for i, c in grp))
    lines += ["M  END", "$$$$", ""]
    return "\n".join(lines)


def select_chain_within_cutoff(pdb_path: str, lig_coords: np.ndarray,
                               cutoff: float, out_path: str) -> List[str]:
    """Keep only protein chains with any clean-residue atom within `cutoff`
    of the ligand; write the filtered PDB (dataset-construction helper,
    reference feature_utils.py:379-412 select_chain_within_cutoff_to_ligand_v2
    — pure Python here, no BioPython/scipy). Returns the kept chain ids.

    Contact test uses every atom of the standard-residue, CA-containing
    residues (the reference's get_clean_res_list(ensure_ca_exist=True));
    the output keeps all ATOM/HETATM/TER records of the contact chains
    (the reference's Select writes every residue of those chains)."""
    lig = np.asarray(lig_coords, np.float32)
    chains_atoms: Dict[str, List] = {}
    res_has_ca: Dict[Tuple, bool] = {}
    res_atoms: Dict[Tuple, List] = {}
    with open(pdb_path) as f:
        src_lines = f.readlines()
    for line in src_lines:
        if line[:6] != "ATOM  ":
            continue
        resname = line[17:20].strip()
        if resname not in THREE_TO_ONE:
            continue
        key = (line[21], line[22:26], line[26])
        try:
            xyz = (float(line[30:38]), float(line[38:46]), float(line[46:54]))
        except ValueError:
            continue
        res_atoms.setdefault(key, []).append(xyz)
        if line[12:16].strip() == "CA":
            res_has_ca[key] = True
    for key, atoms in res_atoms.items():
        if res_has_ca.get(key):
            chains_atoms.setdefault(key[0], []).extend(atoms)
    kept = []
    cut2 = float(cutoff) ** 2
    for chain, atoms in chains_atoms.items():
        a = np.asarray(atoms, np.float32)
        d2 = ((a[:, None, :] - lig[None, :, :]) ** 2).sum(-1)
        if (d2 < cut2).any():
            kept.append(chain)
    keep = set(kept)
    with open(out_path, "w") as f:
        for line in src_lines:
            rec = line[:6]
            if rec in ("ATOM  ", "HETATM") or rec.startswith("TER"):
                # short-form "TER\n" records carry no chain column
                chain = line[21] if len(line) > 21 else ""
                if chain and chain not in keep:
                    continue
            f.write(line)
    return sorted(kept)


def write_renumbered_sdf(to_file: str, sdf_path: str,
                         mol2_path: Optional[str] = None) -> None:
    """Reorder a ligand SDF's atoms to canonical-SMILES output order and
    write it (dataset-construction helper, feature_utils.py:55-63)."""
    _require_rdkit()
    from rdkit import Chem
    mol = canonical_renumber(mol_from_sdf(sdf_path, mol2_path))
    w = Chem.SDWriter(to_file)
    w.write(mol)
    w.close()


def extract_protein_structure(pdb_path: str) -> Dict:
    """Clean residues (standard AA with N/CA/C/O) -> seq + 4-atom coords
    (inference_pdb_utils.py:15-60). Uses BioPython when installed (exact
    reference stack), else the pure-Python fixed-column parser above."""
    try:
        from Bio.PDB import PDBParser
    except ImportError:
        return parse_pdb_atoms(pdb_path)
    parser = PDBParser(QUIET=True)
    s = parser.get_structure("x", pdb_path)
    res_list = []
    for res in s.get_residues():
        hetero, _, _ = res.full_id[-1]
        if hetero != " " or res.resname not in THREE_TO_ONE:
            continue
        if all(a in res for a in ("N", "CA", "C", "O")):
            res_list.append(res)
    seq = "".join(THREE_TO_ONE[r.resname] for r in res_list)
    coords = np.asarray(
        [[list(r[a].coord) for a in ("N", "CA", "C", "O")] for r in res_list],
        np.float32)
    return {"seq": seq, "coords": coords}


def _unit(v: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), eps)


def protein_gvp_features(coords: np.ndarray) -> np.ndarray:
    """15-d geometric residue features, the non-ESM protein representation.

    numpy port of the gvp-pytorch node features the reference's legacy
    `get_protein_feature` extracts (feature_utils.py:235-260; the reference's
    own non-ESM path raises at utils.py:248-251, so no released checkpoint
    fixes an ordering — we use [node_s(6) ‖ node_v.flatten(9)]):
    - node_s: sin/cos of the backbone dihedrals (phi, psi, omega) per residue
    - node_v: forward/backward CA unit vectors + imputed sidechain direction

    coords: [N, 4, 3] (N, CA, C, O per residue) -> [N, 15] float32.
    """
    coords = np.asarray(coords, np.float32)
    n_res = coords.shape[0]
    eps = 1e-7

    # dihedrals over the chained N-CA-C backbone
    X = coords[:, :3].reshape(-1, 3)                      # [3N, 3]
    dX = X[1:] - X[:-1]
    U = _unit(dX)
    u2, u1, u0 = U[:-2], U[1:-1], U[2:]
    n2 = _unit(np.cross(u2, u1))
    n1 = _unit(np.cross(u1, u0))
    cosD = np.clip(np.sum(n2 * n1, -1), -1 + eps, 1 - eps)
    D = np.sign(np.sum(u2 * n1, -1)) * np.arccos(cosD)
    D = np.pad(D, (1, 2)).reshape(n_res, 3)
    node_s = np.concatenate([np.cos(D), np.sin(D)], axis=1)        # [N, 6]

    # orientations: forward/backward CA displacement unit vectors
    ca = coords[:, 1]
    fwd = np.pad(_unit(ca[1:] - ca[:-1]), ((0, 1), (0, 0)))
    bwd = np.pad(_unit(ca[:-1] - ca[1:]), ((1, 0), (0, 0)))

    # imputed sidechain (CB) direction from the N-CA-C frame
    n_at, origin, c_at = coords[:, 0], coords[:, 1], coords[:, 2]
    c_v, n_v = _unit(c_at - origin), _unit(n_at - origin)
    bisector = _unit(c_v + n_v)
    perp = _unit(np.cross(c_v, n_v))
    side = -bisector * np.sqrt(1 / 3) - perp * np.sqrt(2 / 3)

    node_v = np.stack([fwd, bwd, side], axis=1)                    # [N, 3, 3]
    return np.concatenate([node_s, node_v.reshape(n_res, 9)],
                          axis=1).astype(np.float32)


_ESM_CACHE = {}


def extract_esm_feature(seq: str, model_name: str =
                        "facebook/esm2_t33_650M_UR50D",
                        device: str = "cpu") -> np.ndarray:
    """Layer-33 ESM2-650M residue embeddings, BOS/EOS stripped
    (inference_pdb_utils.py:63-89; tools/generate_esm2_t33.py:20-53).

    device="jax" runs the TPU-native flax encoder
    (fabind_tpu.models.esm2, weights converted once from the torch
    checkpoint); any other value is a torch device for the HF model."""
    try:
        import torch
        from transformers import AutoTokenizer, EsmModel
    except ImportError as e:
        raise ImportError("transformers required for ESM2 features") from e
    if device == "jax":
        key = (model_name, "jax")
        if key not in _ESM_CACHE:
            from fabind_tpu.models.esm2 import esm2_from_torch
            tm = EsmModel.from_pretrained(model_name).eval()
            _ESM_CACHE[key] = esm2_from_torch(tm)
        model, params = _ESM_CACHE[key]
        from fabind_tpu.models.esm2 import embed_sequences
        return embed_sequences(model, params, [seq])[0]
    key = (model_name, str(device))
    if key not in _ESM_CACHE:
        tok = AutoTokenizer.from_pretrained(model_name)
        model = EsmModel.from_pretrained(model_name).to(device).eval()
        _ESM_CACHE[key] = (tok, model)
    tok, model = _ESM_CACHE[key]
    import torch
    with torch.no_grad():
        toks = tok(seq, return_tensors="pt").to(device)
        out = model(**toks).last_hidden_state[0, 1:-1]
    assert out.shape[0] == len(seq)
    return out.cpu().numpy().astype(np.float32)


def extract_esm_features(seqs, model_name: str =
                         "facebook/esm2_t33_650M_UR50D",
                         device: str = "cpu", batch_size: int = 8,
                         dp: int = 1):
    """Batched extract_esm_feature over many sequences. With device="jax"
    the flax encoder runs batch_size sequences per device per forward and,
    with dp>1, shards the batch over a dp-device mesh (offline embedding is
    the heaviest preprocessing compute — a 650M encoder over every
    protein); the reference's pass is strictly sequential on one GPU
    (tools/generate_esm2_t33.py:25-53). Torch devices fall back to the
    per-sequence path."""
    if device != "jax":
        return [extract_esm_feature(s, model_name=model_name, device=device)
                for s in seqs]
    key = (model_name, "jax")
    if key not in _ESM_CACHE:
        from transformers import EsmModel

        from fabind_tpu.models.esm2 import esm2_from_torch
        tm = EsmModel.from_pretrained(model_name).eval()
        _ESM_CACHE[key] = esm2_from_torch(tm)
    model, params = _ESM_CACHE[key]
    from fabind_tpu.models.esm2 import embed_sequences
    mesh = None
    if dp > 1:
        mkey = (key, "mesh", dp)
        if mkey not in _ESM_CACHE:   # stable mesh identity across calls
            from fabind_tpu.parallel.mesh import make_mesh
            _ESM_CACHE[mkey] = make_mesh(dp)
        mesh = _ESM_CACHE[mkey]
    return embed_sequences(model, params, seqs,
                           batch_size=batch_size, mesh=mesh)


def compound_pair_dis_distribution(coords: np.ndarray,
                                   las_mask: Optional[np.ndarray] = None
                                   ) -> np.ndarray:
    """16-bin one-hot pairwise-distance distribution
    (reference feature_utils.py:139-154): 1Å bins from -0.5, clamped at 15;
    pairs outside the LAS constraint are forced to the last bin, the
    diagonal to bin 0. Stored alongside features for format parity with the
    reference's preprocessed mol records (a legacy TankBind input — no
    FABind model consumes it)."""
    coords = np.asarray(coords, np.float64)
    d = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
    if las_mask is not None:
        d = np.where(np.asarray(las_mask, bool), d, 15.0)
        np.fill_diagonal(d, 0.0)
    d = np.minimum(d, 15.0)
    idx = np.floor((d + 0.5) / 1.0).astype(np.int64)
    return np.eye(16, dtype=np.float32)[idx]
