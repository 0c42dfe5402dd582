"""Miniature reference-format PDBbind fixture.

Writes a dataset directory in the EXACT on-disk schema the reference reads
(FABind/fabind/data.py:42-96; FABind_plus/fabind/data.py:62; key encodings
and pickle layouts from data.py:71-101 and tools/generate_esm2_t33.py:39-54):

  {root}/dataset/processed/
    data.pt                     torch-saved pandas DataFrame (or data_new.pt
                                with the FABind+ isomorphics column)
    protein_1d_3d.lmdb          key=protein_name, val=pickle((xyz[Nr,3]
                                torch f32, seq[Nr] torch long))
    compound_LAS_edge_index.lmdb key=compound_name, val=pickle((coords,
                                node_feats[n,56], edge_list[E,3],
                                edge_attr, pair_dis_distribution,
                                LAS_edge_index[2,El]))  (torch tensors)
    compound_rdkit_coords.pt    dict name -> coords
    esm2_t33_650M_UR50D.lmdb    key=protein_name, val=pickle(emb[Nr,1280])

LMDB files are real data.mdb B-trees (fabind_tpu.data.mdb when liblmdb is
absent). Complexes are synthetic but physically coherent: the ligand sits
inside the protein point cloud, bonds form a chain + one ring, LAS mask =
bonds + 2-hop + ring pairs.
"""
import os
import pickle

import numpy as np
import torch

from fabind_tpu.data.featurize import las_mask_from_adj_rings
from fabind_tpu.data.kv import write_kv

ESM_DIM = 1280


def synth_complex(seed: int, n_atoms: int = 8, n_res: int = 28,
                  symmetric: bool = False, pocket_signal: float = 0.0):
    """One synthetic complex in raw numpy form.

    symmetric=True builds the permutation-invariance probe ligand instead:
    5 atoms, triangle 0-1-2 with a tail 1-3-4, where atoms 0 and 2 are a
    genuine graph automorphism (identical features, symmetric geometry,
    5 Å apart) and the CONFORMER (init pose) is the swap(0,2) of the GT
    coords — so a model trained with the permutation-invariant loss settles
    in the swapped basin: identity RMSD ~3.2 Å (>2), symmetric RMSD -> 0.
    The matching automorphism list is returned as `autos`.
    """
    rng = np.random.RandomState(seed)
    # density-preserving spread: at the default 28 residues this is the
    # historic *6 cloud (all calibrated tests unchanged); larger proteins
    # grow in RADIUS like real globular proteins instead of packing every
    # residue inside the 20 A pocket radius (which made the mixed-size
    # perf store route half its samples to the max-pocket bucket)
    prot = (rng.randn(n_res, 3) * 6 * (n_res / 28.0) ** (1 / 3)
            ).astype(np.float32)
    seq = rng.randint(0, 20, size=n_res).astype(np.int64)
    esm = rng.randn(n_res, ESM_DIM).astype(np.float32) * 0.2

    center = prot[:4].mean(0)
    if symmetric:
        n_atoms = 5
        geo = np.asarray([[-2.5, 1.5, 0.0], [0.0, 0.0, 0.0],
                          [2.5, 1.5, 0.0], [0.0, -1.4, 0.0],
                          [0.0, -2.8, 0.0]], np.float32)
        # The pocket must sit in the BISECTOR PLANE of the automorphic
        # pair (local x=0): the distance-map losses compare pred coords
        # to the GT in LABEL order (reference training.py:64-69 — the
        # permutation min covers only the coord loss,
        # permutation_loss.py:4-38), so unless every pocket residue is
        # equidistant from GT[0] and GT[2] the dismap gradient pulls
        # toward the identity basin while the permutation coord loss
        # pulls toward the swap basin, and training compromises by
        # collapsing the pair onto the midpoint (measured:
        # |pred0-pred2| -> 0.002 from 4.97 at init). Real automorphic
        # ligands put near-identical dismap columns on the paired atoms
        # for the same reason. A 4.5-9 A in-plane shell also lands the
        # pocket-residue center ~1 A from the ligand centroid, so the
        # stage-1 init (conformer at the pocket-frame origin) starts
        # NEAR the GT pose and the probe isolates basin choice from
        # long-range pose transport.
        dirs = rng.randn(n_res, 3).astype(np.float32)
        dirs[:, 0] = 0.0
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        radii = rng.uniform(4.5, 9.0, size=(n_res, 1)).astype(np.float32)
        prot = (center + dirs * radii).astype(np.float32)
        lig = (center + geo).astype(np.float32)
        bonds = [(0, 1), (1, 2), (0, 2), (1, 3), (3, 4)]
        rings = [[0, 1, 2]]
        perm = np.asarray([2, 1, 0, 3, 4], np.int64)   # the 0<->2 swap
        autos = [np.arange(n_atoms, dtype=np.int64), perm]
    else:
        # ligand: chain 0-1-...-k plus a 3-ring on the first atoms, placed
        # near a few protein residues (so native_num_contact-style contacts
        # exist)
        lig = (center + 0.8 * rng.randn(n_atoms, 3)).astype(np.float32)
        bonds = [(i, i + 1) for i in range(n_atoms - 1)] + [(0, 2)]
        rings = [[0, 1, 2]]
        perm = None
        autos = [np.arange(n_atoms, dtype=np.int64)]
    adj = np.zeros((n_atoms, n_atoms), np.int64)
    for i, j in bonds:
        adj[i, j] = adj[j, i] = 1
    las = las_mask_from_adj_rings(adj, rings)

    feats = np.zeros((n_atoms, 56), np.float32)
    feats[np.arange(n_atoms), rng.randint(0, 17, n_atoms)] = 1.0  # symbol
    feats[np.arange(n_atoms), 18 + np.minimum(adj.sum(1), 6)] = 1.0  # degree
    if symmetric:
        feats[2] = feats[0]    # automorphic atoms must be indistinguishable

    edge_list = []           # [E,3] torchdrug layout: (i, j, relation)
    for i, j in bonds:
        edge_list.append((i, j, 0))   # SINGLE
        edge_list.append((j, i, 0))
    edge_list = np.asarray(sorted(edge_list), np.int64)
    las_idx = np.stack(np.nonzero(las)).astype(np.int64)
    if symmetric:
        # init conformer = the SWAPPED pose (atom 0 starts where GT atom 2
        # is): the permutation-invariant loss's nearest basin is the swap
        rdkit_coords = (lig[perm] - lig.mean(0)
                        + 0.05 * rng.randn(n_atoms, 3)).astype(np.float32)
    else:
        rdkit_coords = (lig - lig.mean(0)
                        + 0.15 * rng.randn(n_atoms, 3)).astype(np.float32)
    if pocket_signal > 0.0:
        # Learnable binding-site signature (opt-in; default stores are
        # unchanged). With pure-noise ESM rows the GT site (the mean of a
        # few RANDOM residues) is information-theoretically unpredictable
        # on unseen proteins — measured as ~9.5 A test-split docking on the
        # mixed-size store, which starves every downstream confidence/
        # ranking signal. Real ESM embeddings DO encode pocket identity
        # (binding-site residues share sequence signatures across
        # proteins; that predictability is what FABind's whole-protein
        # pocket stage exploits). Model it the same way: one FIXED
        # cross-complex unit direction in ESM space, amplitude decaying
        # with the residue's distance to the true site.
        sig = np.random.RandomState(987654)
        u = sig.randn(ESM_DIM).astype(np.float32)
        u /= np.linalg.norm(u)
        d = np.linalg.norm(prot - lig.mean(0), axis=1, keepdims=True)
        esm = esm + (pocket_signal * np.exp(-d / 8.0)).astype(np.float32) * u
    return dict(prot=prot, seq=seq, esm=esm, lig=lig, feats=feats,
                edge_list=edge_list, las_idx=las_idx,
                rdkit_coords=rdkit_coords, n_atoms=n_atoms, autos=autos)


def make_reference_fixture(root: str, plus: bool = False, seed: int = 0,
                           n_train: int = 4, n_valid: int = 2,
                           n_test: int = 2,
                           overfit: bool = False,
                           symmetric: bool = False,
                           train_sizes=None, test_sizes=None,
                           pocket_signal: float = 0.0) -> "list[str]":
    """Write the fixture; returns the pdb ids of the kept (filter-passing)
    rows in index order. Also includes rows the reference's split filters
    must EXCLUDE (oversize ligand, too few contacts, use_compound_com=False)
    so the filter logic is exercised, plus an unseen_test_index file.

    overfit=True makes the test rows EXACT COPIES of the first train
    complexes (same synthesis seed), so evaluating the test split after
    training measures train-set memorization — the convergence probe.

    train_sizes: optional [(n_atoms, n_res)] per train row — mixed-size
    stores for the sustained-throughput probe (tools/perf_e2e_train.py).
    test_sizes: same for test rows (ignored under overfit=True, where test
    rows are copies of train rows) — the within-protocol confidence probe
    needs LARGE unseen test proteins (tools/confidence_within_probe.py)."""
    import pandas as pd

    p = os.path.join(root, "dataset", "processed")
    os.makedirs(p, exist_ok=True)

    rows = []
    protein_kv, compound_kv, esm_kv = {}, {}, {}
    rdkit_coords = {}
    isomorphics = []
    names = []

    def add(pdb, group, c_length=None, contacts=12, use_com=True,
            n_atoms=8, n_res=28, sd=None, sym=False):
        c = synth_complex(seed * 1000 + len(rows) if sd is None else sd,
                          n_atoms=n_atoms, n_res=n_res, symmetric=sym,
                          pocket_signal=pocket_signal)
        protein_kv[pdb.encode()] = pickle.dumps(
            (torch.from_numpy(c["prot"]), torch.from_numpy(c["seq"])))
        esm_kv[pdb.encode()] = pickle.dumps(torch.from_numpy(c["esm"]))
        compound_kv[pdb.encode()] = pickle.dumps((
            torch.from_numpy(c["lig"]),
            torch.from_numpy(c["feats"]),
            torch.from_numpy(c["edge_list"]),
            torch.zeros((len(c["edge_list"]), 1)),      # edge_attr (unused)
            torch.zeros((c["n_atoms"], c["n_atoms"], 16)),  # pair_dis (unused)
            torch.from_numpy(c["las_idx"]),
        ))
        rdkit_coords[pdb] = torch.from_numpy(c["rdkit_coords"])
        pocket_com = c["lig"].mean(0, keepdims=True).astype(np.float64)
        rows.append(dict(pdb=pdb, group=group, protein_name=pdb,
                         compound_name=pdb,
                         c_length=(c["n_atoms"] if c_length is None
                                   else c_length),
                         native_num_contact=contacts,
                         use_compound_com=use_com, pocket_com=pocket_com))
        # the synthesized automorphism group: identity only for the chain
        # ligand; identity + the 0<->2 swap for the symmetric probe ligand
        isomorphics.append(list(c["autos"]))
        names.append(pdb)

    for i in range(n_train):
        kw = {}
        if train_sizes is not None:
            kw = dict(n_atoms=int(train_sizes[i][0]),
                      n_res=int(train_sizes[i][1]))
        add(f"tr{i:02d}", "train", sym=symmetric, **kw)
    # filter-exercising rows (all group=train)
    # c_length=120: excluded by the base filter (<100) but kept by the
    # FABind+ expand_clength filter (<150) — exercises both variants
    add("xxlig", "train", c_length=120)
    add("xxcon", "train", contacts=3)             # native_num_contact filter
    add("xxcom", "train", use_com=False)          # use_compound_com filter
    for i in range(n_valid):
        add(f"va{i:02d}", "valid")
    for i in range(n_test):
        kw = {}
        if test_sizes is not None and not overfit:
            kw = dict(n_atoms=int(test_sizes[i][0]),
                      n_res=int(test_sizes[i][1]))
        # overfit mode: test complex i IS train complex i (same synth seed)
        add(f"te{i:02d}", "test",
            sd=(seed * 1000 + i) if overfit else None, sym=symmetric, **kw)

    df = pd.DataFrame(rows)
    if plus:
        df["isomorphics"] = isomorphics
        torch.save(df, os.path.join(p, "data_new.pt"))
    else:
        torch.save(df, os.path.join(p, "data.pt"))
    torch.save(rdkit_coords, os.path.join(p, "compound_rdkit_coords.pt"))
    write_kv(os.path.join(p, "protein_1d_3d.lmdb"), protein_kv)
    write_kv(os.path.join(p, "compound_LAS_edge_index.lmdb"), compound_kv)
    write_kv(os.path.join(p, "esm2_t33_650M_UR50D.lmdb"), esm_kv)

    os.makedirs(os.path.join(root, "split_pdb_id"), exist_ok=True)
    with open(os.path.join(root, "split_pdb_id", "unseen_test_index"),
              "w") as f:
        f.write("te00\n")
    return names
