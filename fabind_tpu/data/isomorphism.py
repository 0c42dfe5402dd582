"""Ligand graph self-isomorphisms (automorphisms) for the permutation-
invariant loss and symmetric RMSD.

Replaces the reference's graph-tool subgraph_isomorphism enumeration
(FABind_plus/fabind/utils/isomorphism.py:8-72, injected offline by
tools/inject_isomorphism_to_data.py:30-47) with networkx VF2. Node labels
follow the reference: atomic_number * 100 + sum of incident bond orders
(isomorphism.py:23-31), so only chemically equivalent atoms may permute.

Pure-python host-side preprocessing; outputs static [n_iso, n_atoms] index
arrays consumed by fabind_tpu.train.losses.permutation_coord_loss.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def automorphisms_from_graph(n_atoms: int, edges: Sequence, node_labels,
                             edge_labels=None, max_iso: int = 8
                             ) -> np.ndarray:
    """Enumerate up to max_iso graph automorphisms.

    Args:
      edges: iterable of (i, j) undirected bonds (one direction suffices).
      node_labels: per-atom hashable labels.
      edge_labels: optional per-edge hashable labels (same order as edges).
    Returns:
      [n_iso, n_atoms] int32, identity first.
    """
    import networkx as nx
    from networkx.algorithms.isomorphism import GraphMatcher, categorical_node_match

    g = nx.Graph()
    for i in range(n_atoms):
        g.add_node(i, label=node_labels[i])
    for k, (i, j) in enumerate(edges):
        attrs = {"elabel": edge_labels[k]} if edge_labels is not None else {}
        g.add_edge(int(i), int(j), **attrs)

    nm = categorical_node_match("label", None)
    em = None
    if edge_labels is not None:
        from networkx.algorithms.isomorphism import categorical_edge_match
        em = categorical_edge_match("elabel", None)
    matcher = GraphMatcher(g, g, node_match=nm, edge_match=em)

    isos: List[np.ndarray] = []
    seen = set()
    identity = tuple(range(n_atoms))
    for mapping in matcher.isomorphisms_iter():
        perm = tuple(mapping[i] for i in range(n_atoms))
        if perm in seen:
            continue
        seen.add(perm)
        if perm == identity:
            continue
        isos.append(np.asarray(perm, np.int32))
        if len(isos) >= max_iso - 1:
            break
    out = [np.arange(n_atoms, dtype=np.int32)] + isos
    return np.stack(out)


_BOND_TYPES = ["AROMATIC", "TRIPLE", "DOUBLE", "SINGLE", "misc"]


def _bond_index(bond) -> int:
    """safe_index_bond (FABind_plus isomorphism.py:35-46):
    AROMATIC=1, TRIPLE=2, DOUBLE=3, SINGLE=4, other=5."""
    try:
        return _BOND_TYPES.index(str(bond.GetBondType())) + 1
    except ValueError:
        return len(_BOND_TYPES)


def mol_automorphisms(mol, max_iso: int = 8) -> np.ndarray:
    """Automorphisms of an RDKit mol with the reference's node labeling
    (atomGetnum, isomorphism.py:49-62): atomic_num * 100 + sum of bond-type
    indices over incident bonds; matching uses vertex labels only, like the
    reference's graph-tool call (isomorphism.py:23-31)."""
    n = mol.GetNumAtoms()
    labels = [atom.GetAtomicNum() * 100 for atom in mol.GetAtoms()]
    for bond in mol.GetBonds():
        idx = _bond_index(bond)
        labels[bond.GetBeginAtomIdx()] += idx
        labels[bond.GetEndAtomIdx()] += idx
    edges = [(b.GetBeginAtomIdx(), b.GetEndAtomIdx()) for b in mol.GetBonds()]
    return automorphisms_from_graph(n, edges, labels, None, max_iso)
