"""Serving-layer hardening (round-2 review findings): non-default feature
dims at engine init, npz index abuse, /dock path restriction, /screen
validation, NaN-safe JSON, protein-cache LRU bound."""
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np

from fabind_tpu.config import preset
from fabind_tpu.serve import DockingEngine, Pose
from fabind_tpu.serve_http import _group_npz, _poses_json, make_server

from common import TINY
from test_serve import make_raw


def test_engine_init_uses_config_feature_dims():
    """DockingEngine(params=None) must init with the CONFIG's feature dims:
    a use_esm2_feat=False preset (15-d gvp protein features) previously got
    a [1280,h] input kernel from the default dummy batch and failed on the
    first real request."""
    cfg = preset("fabind", use_esm2_feat=False, **TINY)
    eng = DockingEngine(cfg, batch_size=2, bf16=False)
    raw = make_raw(n=5, nr=20, seed=1)
    del raw["esm_feat"]
    rng = np.random.RandomState(0)
    raw["protein_full_coords"] = (
        raw["protein_xyz"][:, None, :]
        + 0.5 * rng.randn(20, 4, 3).astype(np.float32))
    poses = eng.dock_raw([raw])
    assert poses[0].error is None
    assert poses[0].coords.shape == (5, 3)
    assert np.isfinite(poses[0].coords).all()


def test_group_npz_huge_index_no_expansion():
    """One tiny entry named r4000000000_x must NOT allocate 4e9 request
    dicts (would OOM the host past the 413 body-size guard)."""
    buf = io.BytesIO()
    np.savez(buf, **{"r4000000000_lig_coords": np.zeros((3, 3)),
                     "r2_lig_coords": np.ones((2, 3))})
    reqs = _group_npz(buf.getvalue())
    assert len(reqs) == 2   # indices present, ascending — no gap filling
    assert reqs[0]["lig_coords"].shape == (2, 3)
    assert reqs[1]["lig_coords"].shape == (3, 3)


def test_poses_json_nan_safe():
    """Non-finite coords/confidence serialize as null, never as the bare
    NaN token that strict JSON parsers reject."""
    p = Pose(coords=np.array([[1.0, np.nan, 3.0]], np.float32),
             confidence=float("nan"))
    out = json.loads(_poses_json([p]))   # json.loads accepts NaN; strict
    assert out[0]["coords"][0][1] is None        # parsers need the null
    assert out[0]["confidence"] is None
    assert "NaN" not in _poses_json([p]).decode()


def _serve(engine, **kw):
    srv = make_server(engine, "127.0.0.1", 0, **kw)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def _post(url, body, ctype="application/octet-stream"):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_http_screen_empty_and_dock_pdb_root(tmp_path):
    cfg = preset("fabind", **TINY)
    eng = DockingEngine(cfg, batch_size=2, bf16=False)
    srv, base = _serve(eng, pdb_root=str(tmp_path))
    try:
        # /screen without a protein -> 400, not IndexError-500
        buf = io.BytesIO()
        np.savez(buf, **{"r0_lig_coords": np.zeros((3, 3), np.float32)})
        try:
            _post(base + "/screen", buf.getvalue())
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "protein" in json.loads(e.read())["error"]

        # /dock path escaping --pdb-root -> 400 with no filesystem probe
        body = json.dumps(
            [{"smiles": "CCO", "pdb": "../../etc/passwd"}]).encode()
        try:
            _post(base + "/dock", body, "application/json")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "escapes" in json.loads(e.read())["error"]
    finally:
        srv.shutdown()
        srv.server_close()


def test_protein_cache_lru_bounded(monkeypatch):
    """The per-path featurization cache is bounded (a client cycling many
    paths must not grow host memory without limit)."""
    cfg = preset("fabind", **TINY)
    eng = DockingEngine(cfg, batch_size=2, bf16=False)

    import fabind_tpu.data.featurize as F
    monkeypatch.setattr(F, "extract_protein_structure",
                        lambda path: {"seq": "AAA", "coords": np.zeros(
                            (3, 4, 3), np.float32)})
    monkeypatch.setattr(F, "extract_esm_feature",
                        lambda seq, **kw: np.zeros((3, 1280), np.float32))
    for i in range(300):
        eng._protein_raw(f"/fake/{i}.pdb")
    assert len(eng._protein_cache) == 256
    assert "/fake/299.pdb" in eng._protein_cache
    assert "/fake/0.pdb" not in eng._protein_cache


def test_engine_refuses_nonoverlapping_ckpt(tmp_path):
    """A torch checkpoint that fills none of the model's params must raise
    at engine construction instead of serving fresh-init garbage."""
    import torch

    bad = tmp_path / "junk.bin"
    torch.save({"some.module.weight": torch.zeros(3, 3)}, str(bad))
    cfg = preset("fabind", **TINY)
    try:
        DockingEngine(cfg, ckpt=str(bad), batch_size=2, bf16=False)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "filled none" in str(e)


def test_restore_params_refuses_zero_overlap(tmp_path):
    """restore_params on a checkpoint sharing no keys with the template
    raises; a PARTIAL overlap (confidence superset) still restores."""
    import jax.numpy as jnp

    from fabind_tpu.train import checkpoints

    full = {"trunk": {"w": jnp.ones((2, 2))},
            "ranking_head": {"w": jnp.zeros((2,))}}
    ckpt_dir = tmp_path / "run" / "ckpt"
    # write a params-only StandardCheckpointer step dir (legacy layout)
    checkpoints.save_params(str(ckpt_dir / "step_1"),
                            {"params": {"trunk": {"w": jnp.full((2, 2),
                                                                7.0)}}})
    out = checkpoints.restore_params(str(ckpt_dir), full)
    assert float(out["trunk"]["w"][0, 0]) == 7.0           # restored
    assert float(out["ranking_head"]["w"][0]) == 0.0       # template kept

    wrong = {"other": {"w": jnp.ones((4,))}}
    try:
        checkpoints.restore_params(str(ckpt_dir), wrong)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "shares no parameters" in str(e)

    # shape mismatch on an overlapping leaf raises with the path
    bad_shape = {"trunk": {"w": jnp.ones((3, 3))}}
    try:
        checkpoints.restore_params(str(ckpt_dir), bad_shape)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "shape" in str(e)
