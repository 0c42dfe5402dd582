"""End-to-end over the reference's REAL example complexes.

The reference ships 4 real complexes as its de-facto smoke test
(FABind/inference_examples/: example.csv + pdb_files + gt_mol_files,
driven by the README 3-script pipeline, FABind/README.md:95-125). This
module drives the SAME real files through this framework's pure-Python
input path (no RDKit/BioPython in this image): PDB backbone parsing,
V2000 SDF featurization, DockingEngine.dock_sdf, and the cli.inference
--ligand-sdf-dir workflow with the RDKit-free SDF writer.

Weights are random (the released .bin checkpoints are empty LFS
placeholders in this environment), so assertions are pipeline-integrity
ones: every complex featurizes, docks to finite coords in the input
structure's world frame, and round-trips through the SDF writer.
"""
import csv
import os

import numpy as np
import pytest

import dataclasses

from fabind_tpu.config import preset
from fabind_tpu.data import featurize as F

from common import TINY

EXAMPLES = "/root/reference/FABind/inference_examples"
PDB_IDS = ["6efk", "6g3c", "6n93", "6npi"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference examples not mounted")


def sdf_path(pdb):
    return os.path.join(EXAMPLES, "gt_mol_files", pdb, f"{pdb}_ligand.sdf")


def pdb_path(pdb):
    return os.path.join(EXAMPLES, "pdb_files", f"{pdb}.pdb")


def test_featurize_real_ligands():
    """All 4 real ligands featurize: valid one-hots, chemistry sanity."""
    for pdb in PDB_IDS:
        f = F.featurize_sdf(sdf_path(pdb))
        n = len(f["symbols"])
        assert f["coords"].shape == (n, 3)
        assert f["feats"].shape == (n, 56)
        # 5 one-hot blocks sum to 1 each; +1 for aromatic atoms
        rs = f["feats"].sum(1)
        assert set(np.unique(rs)) <= {5.0, 6.0}
        assert (f["las_mask"] == f["las_mask"].T).all()
        assert not f["las_mask"].diagonal().any()
        # LAS covers at least every bond
        for i, j in f["bond_edges"]:
            assert f["las_mask"][i, j]
        assert (f["iso_labels"] > 100).all()   # Z*100 + bond indices
    # 6npi = 2-(pyrrol-1-yl)benzoic acid: 11 aromatic atoms (6 + 5)
    f = F.featurize_sdf(sdf_path("6npi"))
    assert int((f["feats"].sum(1) == 6.0).sum()) == 11
    assert len(f["symbols"]) == 14
    # 6efk is a peptide: nothing aromatic
    f = F.featurize_sdf(sdf_path("6efk"))
    assert int((f["feats"].sum(1) == 6.0).sum()) == 0


def test_parse_real_proteins():
    sizes = {}
    for pdb in PDB_IDS:
        s = F.extract_protein_structure(pdb_path(pdb))
        nr = len(s["seq"])
        assert s["coords"].shape == (nr, 4, 3)
        assert np.isfinite(s["coords"]).all()
        sizes[pdb] = nr
    # real structures, fixed sizes
    assert sizes == {"6efk": 132, "6g3c": 272, "6n93": 520, "6npi": 274}


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from fabind_tpu.serve import DockingEngine
    import fabind_tpu.data.featurize as feat

    # ESM2-650M weights can't be downloaded here (zero egress): swap in
    # deterministic pseudo-embeddings of the right shape
    orig = feat.extract_esm_feature
    feat.extract_esm_feature = lambda seq, **kw: (
        np.random.RandomState(len(seq)).randn(len(seq), 1280)
        .astype(np.float32) * 0.2)
    try:
        cfg = preset("fabind", **TINY)
        # one bucket covering the largest example (6n93: 520 residues,
        # 48 heavy atoms) -> a single CPU compile for the whole module
        big = dataclasses.replace(cfg.shapes, max_ligand=48, max_pocket=24,
                                  max_protein=544)
        yield DockingEngine(cfg, buckets=[big], batch_size=2)
    finally:
        feat.extract_esm_feature = orig


@pytest.mark.slow
def test_dock_sdf_real_examples(engine):
    reqs = [(sdf_path(p), pdb_path(p)) for p in PDB_IDS]
    poses = engine.dock_sdf(reqs)
    assert len(poses) == 4
    for pdb, pose in zip(PDB_IDS, poses):
        assert pose.error is None, f"{pdb}: {pose.error}"
        f = F.featurize_sdf(sdf_path(pdb))
        assert pose.coords.shape == f["coords"].shape
        assert np.isfinite(pose.coords).all()
        # world frame restored: pose lands inside (or near) the input
        # structure's bounding box, not at the model's centered origin
        prot = F.extract_protein_structure(pdb_path(pdb))["coords"][:, 1]
        lo, hi = prot.min(0) - 30.0, prot.max(0) + 30.0
        assert (pose.coords >= lo).all() and (pose.coords <= hi).all()
        assert pose.sdf_meta is not None


def test_randomized_init_on_real_ligands(engine):
    """Protocol-comparable redocking init on the 4 REAL reference ligands
    (round-3 verdict item 5): randomize_init=True must randomize torsions
    + orientation while preserving chemistry — every LAS-pair distance
    (the post-opt / featurization constraint set) stays exact while
    non-LAS distances across rotatable bonds move. Then the poses still
    dock to finite world-frame coords through the live engine. RMSD
    degradation vs GT-init is NOT asserted here: weights are random in
    this image (see module docstring), so pose quality is meaningless —
    the init-leakage removal is the testable protocol property."""
    from fabind_tpu.data.torsion import randomize_torsions, rotatable_bonds

    rng = np.random.RandomState(0)
    any_rotatable = False
    for pdb in PDB_IDS:
        f = F.featurize_sdf(sdf_path(pdb))
        rb = rotatable_bonds(f["coords"].shape[0], f["bond_edges"],
                             f.get("bond_orders"))
        rand = randomize_torsions(f["coords"], f["bond_edges"], rng,
                                  bond_orders=f.get("bond_orders"))
        d0 = np.linalg.norm(f["coords"][:, None] - f["coords"][None], axis=-1)
        d1 = np.linalg.norm(rand[:, None] - rand[None], axis=-1)
        las = f["las_mask"]
        np.testing.assert_allclose(d1[las], d0[las], atol=2e-3,
                                   err_msg=f"{pdb}: LAS distances moved")
        if rb:
            any_rotatable = True
            # real drug-like ligands: torsion randomization must actually
            # change the conformation beyond the LAS constraint set
            assert np.abs(d1[~las] - d0[~las]).max() > 0.3, pdb
    assert any_rotatable, "no reference ligand had a rotatable bond?"

    poses = engine.dock_sdf([(sdf_path(p), pdb_path(p)) for p in PDB_IDS],
                            randomize_init=True, seed=1)
    for pdb, pose in zip(PDB_IDS, poses):
        assert pose.error is None, f"{pdb}: {pose.error}"
        assert np.isfinite(pose.coords).all()


@pytest.mark.slow
def test_cli_inference_on_reference_examples(engine, tmp_path, monkeypatch):
    """cli.inference --ligand-sdf-dir over the reference example.csv:
    the one-command counterpart of the reference's 3-script pipeline, on
    its own real inputs, RDKit-free end to end."""
    import fabind_tpu.cli.inference as ci
    import fabind_tpu.serve as serve

    monkeypatch.setattr(serve, "DockingEngine",
                        lambda *a, **k: engine)
    out = tmp_path / "out"
    ci.main(["--ckpt", "/dev/null/none",   # engine stubbed; never read
             "--index", os.path.join(EXAMPLES, "example.csv"),
             "--pdb-dir", os.path.join(EXAMPLES, "pdb_files"),
             "--ligand-sdf-dir", os.path.join(EXAMPLES, "gt_mol_files"),
             "--output", str(out)])
    rows = list(csv.DictReader(open(out / "index.csv")))
    assert len(rows) == 4
    for row in rows:
        assert os.path.exists(row["sdf"])
        parsed = F.parse_sdf(row["sdf"])
        ref = F.featurize_sdf(sdf_path(row["pdb"]))
        assert parsed["symbols"] == ref["symbols"]
        assert len(parsed["bonds"]) == len(ref["heavy_bonds"])
        assert np.isfinite(parsed["coords"]).all()
        # the written pose re-featurizes (the SDF-out is a valid SDF-in)
        F.featurize_sdf(row["sdf"])


def test_preprocess_sdf_column_builds_npz(tmp_path, monkeypatch):
    """preprocess inference mode with an `sdf` column: featurizes the real
    6npi ligand + protein into the NPZ store without RDKit, with
    isomorphism injection, and the store loads through NPZSource."""
    import fabind_tpu.data.featurize as feat
    from fabind_tpu.cli import preprocess as pp
    from fabind_tpu.data.dataset import NPZSource

    monkeypatch.setattr(
        feat, "extract_esm_feature",
        lambda seq, **kw: np.random.RandomState(len(seq))
        .randn(len(seq), 1280).astype(np.float32) * 0.2)

    idx = tmp_path / "pairs.csv"
    with open(idx, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["name", "smiles", "sdf",
                                          "pdb_file"])
        w.writeheader()
        w.writerow({"name": "6npi", "smiles": "",
                    "sdf": sdf_path("6npi"), "pdb_file": pdb_path("6npi")})
        # a bad sdf path is skipped, not fatal (skip-and-continue)
        w.writerow({"name": "bad", "smiles": "",
                    "sdf": str(tmp_path / "missing.sdf"),
                    "pdb_file": pdb_path("6npi")})
    out = tmp_path / "npz"
    pp.main(["inference", "--index", str(idx), "--out", str(out),
             "--isomorphisms"])

    src = NPZSource(str(out))
    assert src.names == ["6npi"]
    rec = src.get("6npi")
    assert rec["lig_feats"].shape == (14, 56)
    assert rec["protein_xyz"].shape == (274, 3)
    assert rec["esm_feat"].shape == (274, 1280)
    assert rec["las_mask"].shape == (14, 14)
    iso = rec["isomorphisms"]
    assert iso.ndim == 2 and iso.shape[1] == 14
    # every automorphism is a permutation
    for p in iso:
        assert sorted(p.tolist()) == list(range(14))


def test_featurize_sdf_implicit_h_and_charges():
    """The no-explicit-H estimate: kekulized benzene (no H atoms drawn)
    gets 1 implicit H and valence 4 per carbon; an M CHG carboxylate O-
    gets 0 H (default valence adjusted by the formal charge)."""
    from fabind_tpu.data.featurize import featurize_sdf_text, sdf_string
    import numpy as np

    hexa = np.asarray([[np.cos(t), np.sin(t), 0.0]
                       for t in np.linspace(0, 2 * np.pi, 6, endpoint=False)])
    benzene = sdf_string(["C"] * 6, hexa,
                         [(i, (i + 1) % 6, 1.0 + (i % 2)) for i in range(6)],
                         name="benzene_kekulized")
    f = featurize_sdf_text(benzene)
    # blocks: symbol[0:18] degree[18:26] hs[26:34] valence[34:43]
    assert (f["feats"][:, 18 + 2] == 1).all()     # degree 2
    assert (f["feats"][:, 26 + 1] == 1).all()     # 1 implicit H
    assert (f["feats"][:, 34 + 4] == 1).all()     # valence 4
    assert (f["feats"][:, 55] == 0).all()         # kekulized: not aromatic
    # LAS: ring pairs all constrained (6 ring atoms fully connected)
    assert f["las_mask"].sum() == 30

    # acetate: C-C(=O)[O-] with explicit charge
    acet = sdf_string(["C", "C", "O", "O"],
                      np.asarray([[0, 0, 0], [1.5, 0, 0], [2.2, 1.1, 0],
                                  [2.2, -1.1, 0]], np.float32),
                      [(0, 1, 1.0), (1, 2, 2.0), (1, 3, 1.0)],
                      name="acetate", charges=np.asarray([0, 0, 0, -1]))
    f = featurize_sdf_text(acet)
    chg_block = 43
    assert f["feats"][3, chg_block + 5 + (-1)] == 1   # formal charge -1
    assert f["feats"][3, 26 + 0] == 1                 # O-: 0 H
    assert f["feats"][2, 26 + 0] == 1                 # =O: 0 H
    assert f["feats"][0, 26 + 3] == 1                 # CH3: 3 H
