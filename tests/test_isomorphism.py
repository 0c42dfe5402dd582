"""Automorphism enumeration parity vs brute-force permutation search.

Reference protocol: node labels = atomic_number*100 + incident-bond-order
index sum (FABind_plus/fabind/utils/isomorphism.py:49-62 atomGetnum), match
on vertex labels only (isomorphism.py:23-31); eval-time symmetric RMSD
explores the full automorphism set (get_sym_rmsd.py:5-35 via spyrmsd).
"""
import itertools
import warnings

import numpy as np
import pytest

from fabind_tpu.data.featurize import atom_property_prediction_feature
from fabind_tpu.data.isomorphism import (HARD_ISO_LIMIT,
                                         automorphisms_from_graph,
                                         enumerate_automorphisms,
                                         iso_labels_from_arrays,
                                         ref_bond_index_from_order)


def brute_force_automorphisms(n, edges, labels):
    """All permutations preserving node labels + adjacency (vertex-label
    matching only, like the reference's graph-tool call)."""
    adj = set()
    for i, j in edges:
        adj.add((int(i), int(j)))
        adj.add((int(j), int(i)))
    out = []
    for perm in itertools.permutations(range(n)):
        if any(labels[perm[i]] != labels[i] for i in range(n)):
            continue
        if all(((perm[i], perm[j]) in adj) == ((i, j) in adj)
               for i in range(n) for j in range(n) if i != j):
            out.append(perm)
    return set(out)


def ring_edges(n):
    return [(i, (i + 1) % n) for i in range(n)]


def directed(edges):
    out = []
    for i, j in edges:
        out.append((i, j))
        out.append((j, i))
    return np.asarray(out, np.int64)


def feats_for(symbols):
    return np.stack([atom_property_prediction_feature(s, 0, 0, 0, 0, False)
                     for s in symbols])


def test_benzene_full_group_matches_brute_force():
    # 6-carbon aromatic ring: dihedral group D6, 12 automorphisms
    edges = ring_edges(6)
    labels = [6 * 100 + 2 * ref_bond_index_from_order(1.5)] * 6
    isos, truncated = enumerate_automorphisms(6, edges, labels)
    assert not truncated
    got = {tuple(p) for p in isos}
    assert got == brute_force_automorphisms(6, edges, labels)
    assert len(got) == 12


def test_tert_butyl_methyl_permutations():
    # C0 center bonded to methyls C1..C3 and O4: 3! = 6 automorphisms
    edges = [(0, 1), (0, 2), (0, 3), (0, 4)]
    feats = feats_for(["C", "C", "C", "C", "O"])
    orders = np.ones(8, np.float32)
    labels = iso_labels_from_arrays(feats, directed(edges), orders)
    # center: 4 single bonds; methyls: 1; O: 1
    assert labels[0] == 616 and labels[1] == 604 and labels[4] == 804
    isos, truncated = enumerate_automorphisms(5, edges, labels)
    assert not truncated
    assert {tuple(p) for p in isos} == \
        brute_force_automorphisms(5, edges, labels)
    assert len(isos) == 6


def test_bond_order_labels_reject_invalid_reversal():
    # C0=C1-C2-C3: element-only labels admit the chain reversal, but the
    # double bond makes it chemically invalid — the reference labeling
    # rejects it (this is the round-1 gap being closed)
    edges = [(0, 1), (1, 2), (2, 3)]
    feats = feats_for(["C", "C", "C", "C"])
    orders = np.asarray([2.0, 2.0, 1.0, 1.0, 1.0, 1.0], np.float32)
    d = directed(edges)  # sorted-ish both directions: build orders to match
    # directed() emits [(0,1),(1,0),(1,2),(2,1),(2,3),(3,2)]
    labels = iso_labels_from_arrays(feats, d, orders)
    np.testing.assert_array_equal(labels, [603, 607, 608, 604])
    isos, _ = enumerate_automorphisms(4, edges, labels)
    assert len(isos) == 1  # identity only

    element_only = [6, 6, 6, 6]
    isos_bad, _ = enumerate_automorphisms(4, edges, element_only)
    assert len(isos_bad) == 2  # reversal wrongly admitted


def test_truncation_warns_and_caps():
    edges = ring_edges(6)
    labels = [600] * 6
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        isos = automorphisms_from_graph(6, edges, labels, max_iso=4)
        assert len(isos) == 4
        assert any("truncated" in str(x.message) for x in w)
    # max_iso=None -> full enumeration, no warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        isos = automorphisms_from_graph(6, edges, labels, max_iso=None)
        assert len(isos) == 12
        assert not w


def test_symmetric_rmsd_needs_full_group():
    """A benzene pose rotated by one ring step: plain RMSD is large, the
    correct automorphism recovers ~0. The matching permutation can fall
    outside a small cap — full enumeration (meta['iso'] path) finds it."""
    from fabind_tpu.utils.metrics import symmetric_rmsd
    ang = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    true = np.stack([np.cos(ang), np.sin(ang), np.zeros(6)], 1)
    pred = np.roll(true, 1, axis=0)  # relabeled by one ring step
    edges = ring_edges(6)
    labels = [600] * 6
    full, _ = enumerate_automorphisms(6, edges, labels)
    assert symmetric_rmsd(pred, true) > 0.5
    assert symmetric_rmsd(pred, true, full) < 1e-6
    # every automorphism is a true graph automorphism: permuted coords of
    # the ideal ring keep all bond lengths
    for p in full:
        d = np.linalg.norm(true[p][[e[0] for e in edges]]
                           - true[p][[e[1] for e in edges]], axis=1)
        np.testing.assert_allclose(d, d[0], atol=1e-6)


def test_hard_limit_bounds_pathological_graphs():
    # star of 9 identical leaves: 8! = 40320 automorphisms > HARD_ISO_LIMIT
    n = 10
    edges = [(0, i) for i in range(1, n)]
    labels = [616] + [604] * (n - 1)
    isos, truncated = enumerate_automorphisms(n, edges, labels,
                                              limit=HARD_ISO_LIMIT)
    assert truncated
    assert len(isos) == HARD_ISO_LIMIT


def test_timeout_bounds_enumeration_wall_clock():
    """VF2 can backtrack exponentially BETWEEN matches; timeout_s bounds
    wall clock like the reference's 10s SIGALRM (get_sym_rmsd.py:12-24),
    returning at least the identity with truncated=True."""
    import time

    n = 12
    edges = [(0, i) for i in range(1, n)]
    labels = [616] + [604] * (n - 1)   # 11! automorphisms
    t0 = time.monotonic()
    isos, truncated = enumerate_automorphisms(
        n, edges, labels, limit=10 ** 9, timeout_s=0.2)
    assert time.monotonic() - t0 < 10
    assert truncated
    assert len(isos) >= 1
    assert (isos[0] == np.arange(n)).all()
