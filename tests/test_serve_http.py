"""HTTP serving daemon (fabind_tpu.serve_http) driven over a real socket."""
import io
import json
import threading
import urllib.request

import numpy as np

from fabind_tpu.config import preset
from fabind_tpu.serve import DockingEngine
from fabind_tpu.serve_http import make_server

from common import TINY
from test_serve import make_raw


def _post(url, body, ctype):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def _npz_bytes(entries):
    buf = io.BytesIO()
    np.savez(buf, **entries)
    return buf.getvalue()


def test_http_dock_raw_screen_and_health():
    cfg = preset("fabind", **TINY)
    eng = DockingEngine(cfg, batch_size=2, bf16=False)
    srv = make_server(eng, "127.0.0.1", 0)   # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(base + "/health", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["batch_size"] == 2

        # /dock_raw: two requests in one npz
        raws = [make_raw(n=5, nr=20, seed=1), make_raw(n=6, nr=20, seed=2)]
        entries = {}
        for i, raw in enumerate(raws):
            for k, v in raw.items():
                entries[f"r{i}_{k}"] = v
        status, poses = _post(base + "/dock_raw", _npz_bytes(entries),
                              "application/octet-stream")
        assert status == 200 and len(poses) == 2
        for i, pose in enumerate(poses):
            assert pose["error"] is None
            arr = np.asarray(pose["coords"], np.float32)
            assert arr.shape == (5 + i, 3) and np.isfinite(arr).all()

        # /screen: shared protein + two ligands
        base_raw = make_raw(n=6, nr=20, seed=3)
        entries = {k: base_raw[k] for k in ("protein_xyz", "esm_feat")}
        for i in range(2):
            lig = make_raw(n=5 + i, nr=20, seed=4 + i)
            for k in ("lig_coords", "lig_feats", "bond_edges", "las_mask",
                      "rdkit_coords"):
                entries[f"r{i}_{k}"] = lig[k]
        status, poses = _post(base + "/screen", _npz_bytes(entries),
                              "application/octet-stream")
        assert status == 200 and len(poses) == 2
        assert all(p["error"] is None for p in poses)

        # unknown path -> 404
        try:
            _post(base + "/nope", b"{}", "application/json")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_rejects_oversized_body():
    cfg = preset("fabind", **TINY)
    eng = DockingEngine(cfg, batch_size=2, bf16=False)
    srv = make_server(eng, "127.0.0.1", 0, max_body_bytes=1024)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        try:
            _post(f"http://127.0.0.1:{port}/dock_raw", b"x" * 2048,
                  "application/octet-stream")
            raise AssertionError("expected 413")
        except urllib.error.HTTPError as e:
            assert e.code == 413
            assert "exceeds limit" in json.loads(e.read())["error"]
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_flexible_pocket_fields_and_truncation():
    """A fabflex engine's JSON poses carry pocket_coords/pocket_residues;
    a truncated predicted crop surfaces pocket_truncated (rigid engines
    and untruncated poses omit these keys — see _poses_json)."""
    cfg = preset("fabflex", **TINY)
    eng = DockingEngine(cfg, batch_size=2, bf16=False)
    srv = make_server(eng, "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        rng = np.random.RandomState(5)
        raw = make_raw(n=9, nr=30, seed=5)
        # one tight blob: any predicted center keeps all 30 residues within
        # the 20A radius, so the Np=24 bucket truncates exactly 6
        raw["protein_xyz"] = (rng.randn(30, 3) * 2).astype(np.float32)
        raw["lig_coords"] = (raw["protein_xyz"][:3].mean(0)
                             + rng.randn(9, 3)).astype(np.float32)
        raw["rdkit_coords"] = raw["lig_coords"].copy()
        small = make_raw(n=5, nr=20, seed=6)
        entries = {}
        for i, r in enumerate([raw, small]):
            for k, v in r.items():
                entries[f"r{i}_{k}"] = v
        status, poses = _post(f"http://127.0.0.1:{port}/dock_raw",
                              _npz_bytes(entries),
                              "application/octet-stream")
        assert status == 200 and len(poses) == 2
        assert poses[0]["error"] is None
        assert poses[0]["pocket_truncated"] == 6
        assert "pocket_truncated" not in poses[1]
        for p in poses:
            pc = np.asarray(p["pocket_coords"], np.float32)
            pr = np.asarray(p["pocket_residues"])
            assert pc.ndim == 2 and pc.shape[0] == pr.shape[0] > 0
            assert np.isfinite(pc).all()
    finally:
        srv.shutdown()
        srv.server_close()


def _tiny_pdb(path, n_res=20, seed=7):
    """Minimal valid PDB: n_res ALA residues with N/CA/C/O backbones."""
    rng = np.random.RandomState(seed)
    ca = rng.randn(n_res, 3).astype(np.float32) * 2
    serial = 1
    lines = []
    for ri in range(n_res):
        for ai, name in enumerate(["N", "CA", "C", "O"]):
            x, y, z = ca[ri] + 0.3 * ai
            lines.append(
                f"ATOM  {serial:5d} {(' ' + name).ljust(4)} ALA A"
                f"{ri + 1:4d}    {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00")
            serial += 1
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\nEND\n")
    return ca


def test_http_dock_sdf_inline_molfile(tmp_path, monkeypatch):
    """/dock_sdf: inline V2000 ligand + --pdb-root protein, RDKit-free;
    the response carries a ready-to-save molfile of the docked pose."""
    import fabind_tpu.data.featurize as F
    from fabind_tpu.data.featurize import featurize_sdf_text, sdf_string

    monkeypatch.setattr(
        F, "extract_esm_feature",
        lambda seq, **kw: np.random.RandomState(len(seq))
        .randn(len(seq), 1280).astype(np.float32) * 0.2)

    ca = _tiny_pdb(tmp_path / "prot.pdb")
    rng = np.random.RandomState(8)
    lig = (ca[:3].mean(0) + rng.randn(5, 3)).astype(np.float32)
    sdf = sdf_string(["C", "C", "N", "O", "C"], lig,
                     [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 2.0), (3, 4, 1.0)],
                     name="lig")

    cfg = preset("fabind", **TINY)
    eng = DockingEngine(cfg, batch_size=2, bf16=False)
    srv = make_server(eng, "127.0.0.1", 0, pdb_root=str(tmp_path))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        body = json.dumps([{"sdf": sdf, "pdb": "prot.pdb"}]).encode()
        status, poses = _post(base + "/dock_sdf", body, "application/json")
        assert status == 200 and len(poses) == 1
        p = poses[0]
        assert p["error"] is None
        arr = np.asarray(p["coords"], np.float32)
        assert arr.shape == (5, 3) and np.isfinite(arr).all()
        # response molfile round-trips through the pure featurizer
        out = featurize_sdf_text(p["sdf"])
        assert out["symbols"] == ["C", "C", "N", "O", "C"]
        np.testing.assert_allclose(out["coords"], arr, atol=5e-4)

        # ligand paths are refused on this endpoint
        body = json.dumps([{"sdf": "/etc/passwd", "pdb": "prot.pdb"}]).encode()
        try:
            _post(base + "/dock_sdf", body, "application/json")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "inline molfile" in json.loads(e.read())["error"]

        # pdb escape refused
        body = json.dumps([{"sdf": sdf, "pdb": "../../etc/passwd"}]).encode()
        try:
            _post(base + "/dock_sdf", body, "application/json")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_dock_best_of_and_randomized_sdf_init():
    """Round-4 serving-surface completion: /dock_best_of (FABind+ sampling
    over the wire, ?sample_size&seed) and /dock_sdf?randomize_init=1
    (seeded torsion+orientation randomization)."""
    from fabind_tpu.data.featurize import sdf_string

    cfg = preset("fabind_plus_sampling", **TINY)
    eng = DockingEngine(cfg, batch_size=2, bf16=False)
    srv = make_server(eng, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        raws = [make_raw(n=5, nr=20, seed=1), make_raw(n=6, nr=20, seed=2)]
        entries = {}
        for i, raw in enumerate(raws):
            for k, v in raw.items():
                entries[f"r{i}_{k}"] = v
        status, poses = _post(base + "/dock_best_of?sample_size=2&seed=3",
                              _npz_bytes(entries),
                              "application/octet-stream")
        assert status == 200 and len(poses) == 2
        for i, pose in enumerate(poses):
            assert pose["error"] is None
            arr = np.asarray(pose["coords"], np.float32)
            assert arr.shape == (5 + i, 3) and np.isfinite(arr).all()
            assert np.isfinite(pose["confidence"])
        # deterministic per seed over the wire
        _, again = _post(base + "/dock_best_of?sample_size=2&seed=3",
                         _npz_bytes(entries), "application/octet-stream")
        np.testing.assert_array_equal(np.asarray(poses[0]["coords"]),
                                      np.asarray(again[0]["coords"]))

        # /dock_sdf?randomize_init=1: same request twice with the same seed
        # is deterministic; different seeds move the (randomized) pose
        import os
        import tempfile
        symbols = ["C", "C", "C", "O"]
        coords = np.asarray([[0, 0, 0], [1.5, 0, 0], [2.2, 1.2, 0],
                             [3.6, 1.3, 0.8]], np.float32)
        sdf = sdf_string(symbols, coords,
                         [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)])
        import fabind_tpu.data.featurize as F
        pdb_dir = tempfile.mkdtemp()
        prot = make_raw(n=5, nr=20, seed=9)
        orig_extract = F.extract_protein_structure
        orig_esm = F.extract_esm_feature
        F.extract_protein_structure = lambda p: {
            "seq": "A" * 20,
            "coords": np.repeat(prot["protein_xyz"][:, None], 4, axis=1)}
        F.extract_esm_feature = lambda seq, **kw: prot["esm_feat"]
        try:
            body = json.dumps([{"sdf": sdf,
                                "pdb": os.path.join(pdb_dir, "x.pdb")}])
            st1, p1 = _post(base + "/dock_sdf?randomize_init=1&seed=5",
                            body.encode(), "application/json")
            st2, p2 = _post(base + "/dock_sdf?randomize_init=1&seed=5",
                            body.encode(), "application/json")
            st3, p3 = _post(base + "/dock_sdf?randomize_init=1&seed=6",
                            body.encode(), "application/json")
            assert st1 == st2 == st3 == 200
            assert p1[0]["error"] is None, p1[0]["error"]
            np.testing.assert_array_equal(np.asarray(p1[0]["coords"]),
                                          np.asarray(p2[0]["coords"]))
            assert not np.array_equal(np.asarray(p1[0]["coords"]),
                                      np.asarray(p3[0]["coords"]))
        finally:
            F.extract_protein_structure = orig_extract
            F.extract_esm_feature = orig_esm
    finally:
        srv.shutdown()
        srv.server_close()
