"""cli.inference end-to-end with a stub DockingEngine and a minimal fake
rdkit (absent from this image): pins the CSV-request assembly, the
skip-and-continue behavior (reference fabind_inference.py:366-375), the
deterministic SDF naming, the index.csv contract, and the flexible-docking
pocket sidecar files."""
from __future__ import annotations

import csv
import os
import sys
import types

import numpy as np
import pytest

from fabind_tpu.serve import Pose


class _FakeConformer:
    def __init__(self, n):
        self.xyz = np.zeros((n, 3), np.float64)

    def SetAtomPosition(self, i, pt):
        self.xyz[i] = [pt.x, pt.y, pt.z]


class _FakeMol:
    def __init__(self, n):
        self._n = n
        self.conf = _FakeConformer(n)

    def GetNumAtoms(self):
        return self._n

    def GetConformer(self):
        return self.conf


class _FakeSDWriter:
    def __init__(self, path):
        self.path = path
        self.mol = None

    def SetKekulize(self, flag):
        pass

    def write(self, mol):
        self.mol = mol

    def close(self):
        with open(self.path, "w") as f:
            for row in self.mol.conf.xyz:
                f.write(" ".join(f"{v:.4f}" for v in row) + "\n")


class _Point3D:
    def __init__(self, x, y, z):
        self.x, self.y, self.z = x, y, z


@pytest.fixture
def fake_rdkit(monkeypatch):
    chem = types.ModuleType("rdkit.Chem")
    chem.SDWriter = _FakeSDWriter
    geom = types.ModuleType("rdkit.Geometry")
    geom.Point3D = _Point3D
    root = types.ModuleType("rdkit")
    root.Chem = chem
    monkeypatch.setitem(sys.modules, "rdkit", root)
    monkeypatch.setitem(sys.modules, "rdkit.Chem", chem)
    monkeypatch.setitem(sys.modules, "rdkit.Geometry", geom)


def _stub_engine(monkeypatch, poses, seen):
    import fabind_tpu.cli.inference as ci

    class _Engine:
        def __init__(self, cfg, **kw):
            seen["cfg"] = cfg
            seen["kw"] = kw

        def dock_smiles(self, requests):
            seen["requests"] = list(requests)
            return poses

    import fabind_tpu.serve as serve
    monkeypatch.setattr(serve, "DockingEngine", _Engine)
    return ci


def test_cli_inference_writes_sdf_and_index(tmp_path, monkeypatch,
                                            fake_rdkit):
    idx = tmp_path / "example.csv"
    with open(idx, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["Cleaned_SMILES", "pdb_file"])
        w.writeheader()
        w.writerow({"Cleaned_SMILES": "CCO", "pdb_file": "1abc"})
        w.writerow({"Cleaned_SMILES": "c1ccccc1", "pdb_file": "2xyz"})
        w.writerow({"Cleaned_SMILES": "BAD", "pdb_file": "3bad"})

    rng = np.random.default_rng(0)
    ok1 = Pose(coords=rng.normal(size=(3, 3)).astype(np.float32),
               confidence=0.9, mol=_FakeMol(3))
    ok2 = Pose(coords=rng.normal(size=(6, 3)).astype(np.float32),
               confidence=0.5, mol=_FakeMol(6))
    bad = Pose(coords=np.zeros((0, 3), np.float32), confidence=0.0,
               error="ValueError: bad smiles")
    seen = {}
    ci = _stub_engine(monkeypatch, [ok1, ok2, bad], seen)

    out = tmp_path / "out"
    ci.main(["--preset", "fabind", "--ckpt", "unused.bin",
             "--index", str(idx), "--pdb-dir", str(tmp_path / "pdbs"),
             "--output", str(out), "--post-optim", "--batch-size", "2"])

    # engine constructed from the CLI flags
    assert seen["kw"]["ckpt"] == "unused.bin"
    assert seen["kw"]["batch_size"] == 2
    assert seen["kw"]["post_optim_steps"] == 1000
    # requests join pdb ids onto --pdb-dir
    assert seen["requests"][0][0] == "CCO"
    assert seen["requests"][0][1].endswith(os.path.join("pdbs", "1abc.pdb"))

    with open(out / "index.csv") as f:
        rows = list(csv.DictReader(f))
    # the errored pose is skipped, not written
    assert [r["pdb"] for r in rows] == ["1abc", "2xyz"]
    for row, pose in zip(rows, [ok1, ok2]):
        assert os.path.exists(row["sdf"])
        got = np.loadtxt(row["sdf"]).reshape(-1, 3)
        np.testing.assert_allclose(got, pose.coords, atol=1e-3)

    # deterministic SDF names: same inputs -> same paths on a re-run
    out2 = tmp_path / "out2"
    ci.main(["--preset", "fabind", "--ckpt", "unused.bin",
             "--index", str(idx), "--pdb-dir", str(tmp_path / "pdbs"),
             "--output", str(out2)])
    with open(out2 / "index.csv") as f:
        rows2 = list(csv.DictReader(f))
    assert [os.path.basename(r["sdf"]) for r in rows2] == \
        [os.path.basename(r["sdf"]) for r in rows]


def test_cli_inference_flexible_pocket_sidecar(tmp_path, monkeypatch,
                                               fake_rdkit):
    """fabflex preset: poses with pocket coords get an .npz sidecar and a
    'pocket' column in index.csv."""
    idx = tmp_path / "example.csv"
    with open(idx, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["smiles", "pdb"])
        w.writeheader()
        w.writerow({"smiles": "CCO", "pdb": "1abc"})

    pose = Pose(coords=np.ones((2, 3), np.float32), confidence=0.7,
                mol=_FakeMol(2),
                pocket_coords=np.full((4, 3), 2.0, np.float32),
                pocket_residues=np.arange(4))
    seen = {}
    ci = _stub_engine(monkeypatch, [pose], seen)

    out = tmp_path / "out"
    ci.main(["--preset", "fabflex", "--ckpt", "unused.bin",
             "--index", str(idx), "--pdb-dir", str(tmp_path),
             "--output", str(out)])
    # alternate csv column names accepted
    assert seen["requests"][0][0] == "CCO"

    with open(out / "index.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1 and rows[0]["pocket"].endswith("_pocket.npz")
    z = np.load(rows[0]["pocket"])
    np.testing.assert_allclose(z["coords"], pose.pocket_coords)
    np.testing.assert_array_equal(z["residues"], pose.pocket_residues)
