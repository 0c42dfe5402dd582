"""Edge-case hardening of the RDKit-free SDF path (advisor round-2 items):
partial-hydrogen inputs warn, V2000 writer refuses >999 atoms/bonds,
dock_sdf's randomize_init randomizes torsions + rigid orientation, and cli.inference
disambiguates colliding output names instead of overwriting."""
from __future__ import annotations

import csv
import os
import warnings

import numpy as np
import pytest

from fabind_tpu.data.featurize import (featurize_sdf_text, sdf_string,
                                       write_sdf)


def _propanol_with_polar_h_only():
    """n-propanol drawn PDB-export style: the hydroxyl H is explicit, the
    seven carbon H's are not — carbons show a valence deficit."""
    symbols = ["C", "C", "C", "O", "H"]
    coords = np.asarray([[0, 0, 0], [1.5, 0, 0], [3.0, 0, 0],
                         [4.2, 1.0, 0], [5.0, 0.6, 0]], np.float32)
    bonds = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)]
    return sdf_string(symbols, coords, bonds, name="polar_h_only")


def test_partial_h_input_warns():
    with pytest.warns(UserWarning, match="polar-H-only"):
        f = featurize_sdf_text(_propanol_with_polar_h_only())
    # featurization still proceeds (explicit-H counting, documented)
    assert f["feats"].shape == (4, 56)
    # O got its explicit H counted; carbons got 0 (the warned hazard)
    assert f["feats"][3, 26 + 1] == 1   # O: 1 H
    assert f["feats"][0, 26 + 0] == 1   # terminal C: 0 H (off-distribution)


def test_all_explicit_h_does_not_warn():
    # methane, fully explicit
    symbols = ["C", "H", "H", "H", "H"]
    coords = np.asarray([[0, 0, 0], [1, 0, 0], [-1, 0, 0],
                         [0, 1, 0], [0, -1, 0]], np.float32)
    bonds = [(0, i, 1.0) for i in range(1, 5)]
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        f = featurize_sdf_text(sdf_string(symbols, coords, bonds))
    assert f["feats"][0, 26 + 4] == 1   # C: 4 H


def test_no_explicit_h_does_not_warn():
    symbols = ["C", "C", "O"]
    coords = np.asarray([[0, 0, 0], [1.5, 0, 0], [3.0, 0, 0]], np.float32)
    bonds = [(0, 1, 1.0), (1, 2, 1.0)]
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        f = featurize_sdf_text(sdf_string(symbols, coords, bonds))
    assert f["feats"][0, 26 + 3] == 1   # CH3 via default-valence estimate


def test_sdf_string_refuses_v2000_overflow(tmp_path):
    n = 1000
    symbols = ["C"] * n
    coords = np.zeros((n, 3), np.float32)
    with pytest.raises(ValueError, match="999"):
        sdf_string(symbols, coords, [])
    with pytest.raises(ValueError, match="999"):
        write_sdf(str(tmp_path / "x.sdf"), symbols, coords, [])
    # 999 exactly is fine
    out = sdf_string(["C"] * 999, np.zeros((999, 3), np.float32), [])
    assert out.splitlines()[3].startswith("999  0")


def test_dock_sdf_randomize_init_torsions_and_rotation():
    """randomize_init randomizes every rotatable torsion AND applies a
    rigid rotation about the input centroid (round-3 verdict item 5: the
    protocol-comparable RDKit-free counterpart of the reference's ETKDG
    conformer regeneration, inference_mol_utils.py:135-144 +
    utils.py:280-311). Preserved exactly: bond lengths, bond-angle (2-hop)
    distances — and therefore every LAS-pair distance (LAS = bonds ∪
    2-hop ∪ shared-ring, all torsion-invariant). Changed: the rotatable
    dihedral (3-hop distances) and the global orientation. Exercised
    through the real DockingEngine.dock_sdf body with a stub engine self
    (no compile)."""
    from fabind_tpu.serve import DockingEngine

    # C-C-C-O chain: exactly one non-terminal single bond (1-2) rotatable
    symbols = ["C", "C", "C", "O"]
    coords = np.asarray([[0, 0, 0], [1.5, 0, 0], [2.2, 1.2, 0],
                         [3.6, 1.3, 0.8]], np.float32)
    bonds = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)]
    sdf = sdf_string(symbols, coords, bonds, name="probe")

    class Stub:
        raws = None

        def _protein_raw(self, path):
            struct = {"coords": np.zeros((4, 4, 3), np.float32)}
            return struct, np.zeros((4, 1280), np.float32)

        def _finish_mol_requests(self, raws):
            self.raws = raws
            from fabind_tpu.serve import Pose
            return [Pose(coords=r["lig_coords"], confidence=0.0)
                    for r in raws]

    def run(randomize, seed=0):
        stub = Stub()
        DockingEngine.dock_sdf(stub, [(sdf, "p.pdb")],
                               randomize_init=randomize, seed=seed)
        assert "_error" not in stub.raws[0], stub.raws[0]
        return stub.raws[0]

    base = run(False)
    np.testing.assert_allclose(base["lig_coords"], coords, atol=1e-4)

    rot = run(True, seed=3)
    rc = rot["lig_coords"]
    # moved, about the input centroid
    assert np.abs(rc - coords).max() > 0.1
    np.testing.assert_allclose(rc.mean(0), coords.mean(0), atol=1e-4)
    d0 = np.linalg.norm(coords[:, None] - coords[None], axis=-1)
    d1 = np.linalg.norm(rc[:, None] - rc[None], axis=-1)
    # bond lengths and 2-hop (angle) distances preserved...
    for i, j in [(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)]:
        np.testing.assert_allclose(d1[i, j], d0[i, j], atol=1e-4)
    # ...which covers every LAS pair
    las = base["las_mask"]
    np.testing.assert_allclose(d1[las], d0[las], atol=1e-4)
    # the 0-3 distance crosses the rotatable 1-2 bond: torsion randomized
    assert not las[0, 3]
    assert abs(d1[0, 3] - d0[0, 3]) > 0.05
    # LAS reference coords track the randomized init (the reference also
    # featurizes from its regenerated conformer)
    np.testing.assert_allclose(rot["rdkit_coords"], rc)
    # seeded: reproducible, and different per seed
    np.testing.assert_allclose(run(True, seed=3)["lig_coords"], rc)
    assert np.abs(run(True, seed=4)["lig_coords"] - rc).max() > 0.1


def test_cli_inference_disambiguates_duplicate_names(tmp_path, monkeypatch):
    """Two --ligand-sdf-dir rows that fall back to the same (pdb, ligand-id)
    must produce distinct output SDFs (advisor: silent overwrite)."""
    import types
    import sys

    import fabind_tpu.cli.inference as ci
    import fabind_tpu.serve as serve
    from fabind_tpu.serve import Pose

    idx = tmp_path / "rows.csv"
    with open(idx, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["pdb"])
        w.writeheader()
        w.writerow({"pdb": "1abc"})
        w.writerow({"pdb": "1abc"})

    meta = {"symbols": ["C", "C"], "bonds": [(0, 1, 1.0)],
            "charges": np.zeros(2, np.int64)}
    poses = [Pose(coords=np.zeros((2, 3), np.float32) + i, confidence=0.0,
                  sdf_meta=meta) for i in range(2)]

    class _Engine:
        def __init__(self, *a, **k):
            pass

        def dock_sdf(self, requests):
            return poses

    monkeypatch.setattr(serve, "DockingEngine", _Engine)
    out = tmp_path / "out"
    ci.main(["--preset", "fabind", "--ckpt", "unused.bin",
             "--index", str(idx), "--pdb-dir", str(tmp_path),
             "--ligand-sdf-dir", str(tmp_path), "--output", str(out)])
    rows = list(csv.DictReader(open(out / "index.csv")))
    assert len(rows) == 2
    assert rows[0]["sdf"] != rows[1]["sdf"]
    assert all(os.path.exists(r["sdf"]) for r in rows)
    # both poses actually written (not one overwritten by the other)
    a = open(rows[0]["sdf"]).read()
    b = open(rows[1]["sdf"]).read()
    assert a != b


def test_empty_protein_is_clear_error_not_nan():
    """A malformed PDB that parses to zero residues must surface as an
    error Pose (skip-and-continue), never as silent NaN coordinates
    (found by a round-4 verify drive: build_sample's protein-mean frame
    floods NaN on an empty protein)."""
    import pytest

    from fabind_tpu.config import preset
    from fabind_tpu.data.batching import build_sample

    raw = dict(protein_xyz=np.zeros((0, 3), np.float32),
               esm_feat=np.zeros((0, 1280), np.float32),
               lig_coords=np.ones((3, 3), np.float32),
               lig_feats=np.zeros((3, 56), np.float32),
               bond_edges=np.asarray([[0, 1], [1, 0]]),
               las_mask=np.zeros((3, 3), bool),
               rdkit_coords=np.ones((3, 3), np.float32))
    cfg = preset("fabind", max_ligand=8, max_pocket=16, max_protein=32)
    with pytest.raises(ValueError, match="no residues"):
        build_sample(raw, cfg, group="test")
    with pytest.raises(ValueError, match="no atoms"):
        build_sample(dict(raw, protein_xyz=np.ones((5, 3), np.float32),
                          lig_coords=np.zeros((0, 3), np.float32),
                          rdkit_coords=np.zeros((0, 3), np.float32),
                          lig_feats=np.zeros((0, 56), np.float32),
                          las_mask=np.zeros((0, 0), bool)),
                     cfg, group="test")
