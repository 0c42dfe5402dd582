"""A duck-typed stand-in for the RDKit API surface that
fabind_tpu.data.featurize's SMILES path consumes (this image has no RDKit).

Unlike monkeypatching featurize internals away, installing this stub at the
`rdkit` module boundary lets the REAL checkpoint-exact code run:
`read_smiles` -> `canonical_renumber` (_smilesAtomOutputOrder +
RenumberAtoms, reference inference_mol_utils.py:122-133),
`generate_conformation` (ETKDGv2/MMFF call sequence,
inference_mol_utils.py:135-144), and `featurize_mol` (canonical re-parse,
torchdrug 56-d feature order, bond sort, automorphism labels, SSSR LAS
mask — reference feature_utils.py:111-181).

The chemistry is HAND-DERIVED per molecule (atom H counts, valences,
degrees, aromaticity, canonical atom output order) — the registry is the
test oracle, not a chemistry engine. Registered molecules: ethanol
(as `CCO` and as the non-canonical `OCC`), benzene, acetate.
"""
from __future__ import annotations

import sys
import types
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_ATOMIC_NUM = {"H": 1, "C": 6, "N": 7, "O": 8}


class StubAtom:
    def __init__(self, symbol: str, n_hs: int, charge: int = 0,
                 aromatic: bool = False):
        self.symbol, self.n_hs = symbol, n_hs
        self.charge, self.aromatic = charge, aromatic
        self._mol: "StubMol" = None
        self._idx: int = -1

    def GetSymbol(self):
        return self.symbol

    def GetAtomicNum(self):
        return _ATOMIC_NUM[self.symbol]

    def GetDegree(self):
        return sum(1 for b in self._mol.bonds
                   if self._idx in (b.begin, b.end))

    def GetTotalNumHs(self):
        return self.n_hs

    def GetTotalValence(self):
        # total valence = explicit heavy-bond order sum (aromatic counted
        # as in RDKit: an aromatic C in benzene has valence 4) + Hs
        s = 0.0
        for b in self._mol.bonds:
            if self._idx in (b.begin, b.end):
                s += b.order
        # RDKit rounds the two aromatic 1.5 contributions of a benzene C
        # to 3 (1.5+1.5); general rule: round the sum
        return int(round(s)) + self.n_hs

    def GetFormalCharge(self):
        return self.charge

    def GetIsAromatic(self):
        return self.aromatic


class StubBond:
    def __init__(self, begin: int, end: int, order: float):
        self.begin, self.end, self.order = begin, end, order

    def GetBeginAtomIdx(self):
        return self.begin

    def GetEndAtomIdx(self):
        return self.end

    def GetBondTypeAsDouble(self):
        return self.order


class StubConformer:
    def __init__(self, coords: np.ndarray):
        self.coords = np.asarray(coords, np.float64)

    def GetPositions(self):
        return self.coords


class StubMol:
    def __init__(self, atoms: List[StubAtom], bonds: List[StubBond],
                 rings: List[List[int]], canonical_smiles: str,
                 canonical_order: Tuple[int, ...],
                 embed_coords: Optional[np.ndarray] = None):
        self.atoms, self.bonds, self.rings = atoms, bonds, rings
        self.canonical_smiles = canonical_smiles
        # _smilesAtomOutputOrder: new_mol atom i = old atom order[i]
        self.canonical_order = tuple(canonical_order)
        self.embed_coords = embed_coords   # what EmbedMolecule attaches
        self.conformers: List[StubConformer] = []
        for i, a in enumerate(self.atoms):
            a._mol, a._idx = self, i

    # --- RDKit mol API consumed by featurize.py ---
    def GetNumAtoms(self):
        return len(self.atoms)

    def GetAtoms(self):
        return list(self.atoms)

    def GetBonds(self):
        return list(self.bonds)

    def GetNumConformers(self):
        return len(self.conformers)

    def GetConformer(self):
        return self.conformers[0]

    def GetPropsAsDict(self, includePrivate=False, includeComputed=False):
        assert includePrivate and includeComputed, \
            "_smilesAtomOutputOrder is a private computed prop"
        return {"_smilesAtomOutputOrder": self.canonical_order}

    # --- helpers ---
    def _clone(self):
        atoms = [StubAtom(a.symbol, a.n_hs, a.charge, a.aromatic)
                 for a in self.atoms]
        m = StubMol(atoms, list(self.bonds), [list(r) for r in self.rings],
                    self.canonical_smiles, self.canonical_order,
                    self.embed_coords)
        m.conformers = [StubConformer(c.coords.copy())
                        for c in self.conformers]
        return m


# ------------------------------------------------------------- registry
def _ethanol(order_is_canonical=True):
    """CCO: C(H3)-C(H2)-O(H). Canonical order = (C_methyl, C, O)."""
    if order_is_canonical:
        atoms = [StubAtom("C", 3), StubAtom("C", 2), StubAtom("O", 1)]
        bonds = [StubBond(0, 1, 1.0), StubBond(1, 2, 1.0)]
        order = (0, 1, 2)
    else:
        # OCC input order: O0-C1-C2; canonical output visits C2,C1,O0
        atoms = [StubAtom("O", 1), StubAtom("C", 2), StubAtom("C", 3)]
        bonds = [StubBond(0, 1, 1.0), StubBond(1, 2, 1.0)]
        order = (2, 1, 0)
    coords = np.asarray([[0.0, 0.0, 0.0], [1.52, 0.0, 0.0],
                         [2.0, 1.33, 0.0]], np.float64)
    if not order_is_canonical:
        # conformer rows follow the INPUT atom order
        coords = coords[::-1].copy()
    return StubMol(atoms, bonds, [], "CCO", order, embed_coords=coords)


def _benzene():
    atoms = [StubAtom("C", 1, aromatic=True) for _ in range(6)]
    bonds = [StubBond(i, (i + 1) % 6, 1.5) for i in range(6)]
    t = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    coords = np.stack([1.39 * np.cos(t), 1.39 * np.sin(t),
                       np.zeros(6)], axis=1)
    return StubMol(atoms, bonds, [list(range(6))], "c1ccccc1",
                   tuple(range(6)), embed_coords=coords)


def _acetate():
    """CC(=O)[O-]: C(H3)-C(=O)(O-)."""
    atoms = [StubAtom("C", 3), StubAtom("C", 0), StubAtom("O", 0),
             StubAtom("O", 0, charge=-1)]
    bonds = [StubBond(0, 1, 1.0), StubBond(1, 2, 2.0), StubBond(1, 3, 1.0)]
    coords = np.asarray([[0, 0, 0], [1.5, 0, 0], [2.2, 1.1, 0],
                         [2.2, -1.1, 0]], np.float64)
    return StubMol(atoms, bonds, [], "CC(=O)[O-]", (0, 1, 2, 3),
                   embed_coords=coords)


REGISTRY = {
    "CCO": lambda: _ethanol(True),
    "OCC": lambda: _ethanol(False),
    "c1ccccc1": lambda: _benzene(),
    "C1=CC=CC=C1": lambda: _benzene(),
    "CC(=O)[O-]": lambda: _acetate(),
}


# ------------------------------------------------------------ Chem API
def MolFromSmiles(smiles: str):
    mk = REGISTRY.get(smiles)
    return mk() if mk else None


def MolToSmiles(mol: StubMol) -> str:
    return mol.canonical_smiles


def RenumberAtoms(mol: StubMol, order: Sequence[int]) -> StubMol:
    """new atom i = old atom order[i]; bonds and conformers follow."""
    order = list(order)
    inv = {old: new for new, old in enumerate(order)}
    atoms = [StubAtom(mol.atoms[o].symbol, mol.atoms[o].n_hs,
                      mol.atoms[o].charge, mol.atoms[o].aromatic)
             for o in order]
    bonds = [StubBond(inv[b.begin], inv[b.end], b.order)
             for b in mol.bonds]
    rings = [[inv[i] for i in r] for r in mol.rings]
    m = StubMol(atoms, bonds, rings, mol.canonical_smiles,
                tuple(range(len(order))),
                None if mol.embed_coords is None
                else np.asarray(mol.embed_coords)[order])
    m.conformers = [StubConformer(np.asarray(c.coords)[order])
                    for c in mol.conformers]
    return m


def GetAdjacencyMatrix(mol: StubMol) -> np.ndarray:
    n = mol.GetNumAtoms()
    adj = np.zeros((n, n), np.int64)
    for b in mol.bonds:
        adj[b.begin, b.end] = adj[b.end, b.begin] = 1
    return adj


def GetSymmSSSR(mol: StubMol):
    return [list(r) for r in mol.rings]


def AddHs(mol: StubMol) -> StubMol:
    # conformer generation treats Hs as scaffolding it strips again;
    # the stub embeds heavy-atom coords directly, so this is identity
    return mol._clone()


def RemoveHs(mol: StubMol) -> StubMol:
    return mol._clone()


# --------------------------------------------------------- AllChem API
class _ETKDGParams:
    def __init__(self):
        self.randomSeed = -1
        self.useRandomCoords = False


def ETKDGv2():
    return _ETKDGParams()


def EmbedMolecule(mol: StubMol, params: _ETKDGParams) -> int:
    if mol.embed_coords is None:
        return -1
    mol.conformers = [StubConformer(np.asarray(mol.embed_coords))]
    return 0


def MMFFOptimizeMolecule(mol: StubMol, confId: int = 0) -> int:
    return 0


def Compute2DCoords(mol: StubMol) -> int:
    mol.conformers = [StubConformer(
        np.zeros((mol.GetNumAtoms(), 3), np.float64))]
    return 0


# --------------------------------------------------------- installation
def install(monkeypatch) -> None:
    """Register stub `rdkit` / `rdkit.Chem` / `rdkit.Chem.AllChem` modules
    (pytest-monkeypatch scoped; does not leak across tests)."""
    chem = types.ModuleType("rdkit.Chem")
    for fn in (MolFromSmiles, MolToSmiles, RenumberAtoms,
               GetAdjacencyMatrix, GetSymmSSSR, AddHs, RemoveHs):
        setattr(chem, fn.__name__, fn)
    allchem = types.ModuleType("rdkit.Chem.AllChem")
    for fn in (ETKDGv2, EmbedMolecule, MMFFOptimizeMolecule,
               Compute2DCoords):
        setattr(allchem, fn.__name__, fn)
    chem.AllChem = allchem
    root = types.ModuleType("rdkit")
    root.Chem = chem
    monkeypatch.setitem(sys.modules, "rdkit", root)
    monkeypatch.setitem(sys.modules, "rdkit.Chem", chem)
    monkeypatch.setitem(sys.modules, "rdkit.Chem.AllChem", allchem)
