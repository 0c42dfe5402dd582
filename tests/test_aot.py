"""AOT export/serving (fabind_tpu.aot + DockingEngine.from_exported):
weights-baked jax.export artifacts must reproduce the live engine."""
import dataclasses
import json
import os

import numpy as np
import pytest

from fabind_tpu.aot import ExportedInference, export_inference
from fabind_tpu.config import preset
from fabind_tpu.serve import DockingEngine

from common import TINY
from test_serve import make_raw


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = preset("fabind", **TINY)
    small = dataclasses.replace(cfg.shapes, max_ligand=8, max_pocket=16,
                                max_protein=32)
    buckets = [small, cfg.shapes]
    live = DockingEngine(cfg, buckets=buckets, batch_size=2, bf16=True)
    # identical seed -> identical init params; export wants the fp32 tree
    # (it applies the same bf16 deployment cast itself)
    fp32 = DockingEngine(cfg, batch_size=2, bf16=False).params
    out = str(tmp_path_factory.mktemp("aot"))
    manifest = export_inference(cfg, fp32, out, buckets=buckets,
                                batch_size=2, bf16=True, platforms=("cpu",))
    return cfg, live, out, manifest


def test_manifest_and_artifacts(setup):
    cfg, _, out, manifest = setup
    assert manifest["format_version"] == 2
    assert manifest["batch_size"] == 2 and manifest["bf16"] is True
    assert manifest["outputs"] == ["lig_coords", "confidence", "overflow"]
    assert len(manifest["buckets"]) == 2
    for e in manifest["buckets"]:
        f = os.path.join(out, e["file"])
        assert os.path.getsize(f) > 1000
    # manifest on disk round-trips
    with open(os.path.join(out, "manifest.json")) as fh:
        assert json.load(fh)["config"]["model"]["hidden_size"] == \
            cfg.model.hidden_size


def test_exported_engine_matches_live(setup):
    _, live, out, _ = setup
    aot = DockingEngine.from_exported(out)
    assert aot.params is None and not aot._models
    raws = [make_raw(n=5, nr=20, seed=1),     # small bucket
            make_raw(n=12, nr=40, seed=2),    # large bucket
            make_raw(n=40, nr=40, seed=3),    # oversize -> error pose
            make_raw(n=6, nr=20, seed=4)]
    got = aot.dock_raw(raws)
    want = live.dock_raw(raws)
    assert got[2].error is not None and "exceeds" in got[2].error
    for i in (0, 1, 3):
        assert got[i].error is None
        # same weights, same HLO: the exported program must reproduce the
        # live jit bit-for-bit on the same backend
        np.testing.assert_array_equal(got[i].coords, want[i].coords)
        assert got[i].confidence == pytest.approx(want[i].confidence)
        assert got[i].pocket_truncated == want[i].pocket_truncated


def test_exported_engine_warmup_and_screen(setup):
    _, _, out, _ = setup
    aot = DockingEngine.from_exported(out)
    assert aot.warmup() > 0.0       # dummy batches: sample_valid=None path
    prot = make_raw(n=5, nr=20, seed=7)
    ligs = [make_raw(n=4, nr=20, seed=8), make_raw(n=6, nr=20, seed=9)]
    for l in ligs:
        for k in ("protein_xyz", "esm_feat"):
            l.pop(k)
    poses = aot.dock_screen({k: prot[k] for k in ("protein_xyz", "esm_feat")},
                            ligs)
    assert all(p.error is None and np.isfinite(p.coords).all() for p in poses)


def test_exported_engine_without_sampling_programs_raises(setup):
    """Artifacts exported without sampling=True refuse dock_best_of with a
    re-export hint (round-3 verdict item 7 closed the capability; the
    refusal remains only for artifacts that lack the programs)."""
    _, _, out, _ = setup
    aot = DockingEngine.from_exported(out)
    with pytest.raises(ValueError, match="re-export"):
        aot.dock_best_of([make_raw(n=5, nr=20, seed=1)], sample_size=2)


def test_sampling_export_serves_dock_best_of(tmp_path):
    """sampling=True exports the pocket half + the STOCHASTIC dock half
    (explicit uint32 rng-key input) per bucket; the AOT engine's
    dock_best_of must reproduce the live engine bit-for-bit with the same
    seed (identical fold_in key schedule, identical host DBSCAN draws)."""
    cfg = preset("fabind_plus_sampling", **TINY)
    small = dataclasses.replace(cfg.shapes, max_ligand=8, max_pocket=16,
                                max_protein=32)
    cfg = cfg.replace(shapes=small)
    live = DockingEngine(cfg, batch_size=2, bf16=False)
    out = str(tmp_path / "aot_sampling")
    m = export_inference(cfg, live.params, out, batch_size=2, bf16=False,
                         platforms=("cpu",), sampling=True)
    assert m["sampling"] is True
    for e in m["buckets"]:
        assert os.path.getsize(os.path.join(out, e["pocket_file"])) > 1000
        assert os.path.getsize(os.path.join(out, e["sample_file"])) > 1000

    aot = DockingEngine.from_exported(out)
    raws = [make_raw(n=5, nr=20, seed=1), make_raw(n=6, nr=20, seed=2),
            make_raw(n=7, nr=24, seed=3)]
    got = aot.dock_best_of(raws, sample_size=3, seed=5)
    want = live.dock_best_of(raws, sample_size=3, seed=5)
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        assert g.error is None and w.error is None
        np.testing.assert_array_equal(g.coords, w.coords)
        assert g.confidence == pytest.approx(w.confidence)
    # the regression surface of the same artifact still serves
    poses = aot.dock_raw(raws[:1])
    assert poses[0].error is None and np.isfinite(poses[0].coords).all()


def test_sampling_export_requires_confidence_head(tmp_path):
    cfg = preset("fabind", **TINY)
    fp32 = DockingEngine(cfg, batch_size=2, bf16=False).params
    with pytest.raises(AssertionError, match="confidence head"):
        export_inference(cfg, fp32, str(tmp_path / "x"), batch_size=2,
                         platforms=("cpu",), sampling=True)


def test_wrong_bucket_batch_clear_error(setup):
    cfg, _, out, _ = setup
    from fabind_tpu.data.types import dummy_batch
    from fabind_tpu.utils.precision import cast_tree_bf16

    ex = ExportedInference(out)
    small_cfg, large_cfg = ex.bucket_cfgs
    b = cast_tree_bf16(dummy_batch(small_cfg.shapes, batch_size=2,
                                   prot_feat_dim=cfg.model.protein_feat_dim))
    with pytest.raises(ValueError, match="calling convention"):
        ex.fn(large_cfg)(None, b)


def test_post_optim_baked_and_guarded(setup, tmp_path):
    cfg, _, _, _ = setup
    small = dataclasses.replace(cfg.shapes, max_ligand=8, max_pocket=16,
                                max_protein=32)
    fp32 = DockingEngine(cfg, batch_size=2, bf16=False).params
    out = str(tmp_path / "aot_po")
    export_inference(cfg.replace(shapes=small), fp32, out, batch_size=2,
                     bf16=True, platforms=("cpu",), post_optim_steps=3)
    with pytest.raises(ValueError, match="baked into the artifact"):
        DockingEngine.from_exported(out, post_optim_steps=5)
    aot = DockingEngine.from_exported(out)
    assert aot.post_optim_steps == 0    # runs INSIDE the program
    poses = aot.dock_raw([make_raw(n=5, nr=20, seed=1)])
    assert poses[0].error is None and np.isfinite(poses[0].coords).all()


def test_cross_platform_tpu_artifact_from_cpu_host(tmp_path):
    """A CPU-only build host can emit an artifact that also targets TPU
    (multi-platform lowering) and still serve it locally on CPU."""
    cfg = preset("fabind", **TINY).replace(shapes=dataclasses.replace(
        preset("fabind", **TINY).shapes, max_ligand=8, max_pocket=16,
        max_protein=32))
    fp32 = DockingEngine(cfg, batch_size=2, bf16=False).params
    out = str(tmp_path / "aot_xplat")
    m = export_inference(cfg, fp32, out, batch_size=2, bf16=True,
                         platforms=("cpu", "tpu"))
    assert m["platforms"] == ["cpu", "tpu"]
    poses = DockingEngine.from_exported(out).dock_raw(
        [make_raw(n=5, nr=20, seed=1)])
    assert poses[0].error is None and np.isfinite(poses[0].coords).all()


def test_flexible_export_round_trip(tmp_path):
    cfg = preset("fabflex", **TINY)
    live = DockingEngine(cfg, batch_size=2, bf16=False)
    out = str(tmp_path / "aot_flex")
    m = export_inference(cfg, live.params, out, batch_size=2, bf16=False,
                         platforms=("cpu",))
    assert m["flexible"] is True and "pocket_coords" in m["outputs"]
    aot = DockingEngine.from_exported(out)
    raw = make_raw(n=5, nr=20, seed=1)
    got, want = aot.dock_raw([raw])[0], live.dock_raw([raw])[0]
    assert got.error is None
    np.testing.assert_array_equal(got.coords, want.coords)
    np.testing.assert_array_equal(got.pocket_coords, want.pocket_coords)
    np.testing.assert_array_equal(got.pocket_residues, want.pocket_residues)


def test_cli_export_runs(tmp_path, capsys):
    """cli.export end-to-end with an orbax checkpoint."""
    import orbax.checkpoint as ocp

    from fabind_tpu.cli import export as cli_export

    cfg = preset("fabind", **TINY)
    params = DockingEngine(cfg, batch_size=2, bf16=False).params
    ck = str(tmp_path / "ck")
    ocp.StandardCheckpointer().save(os.path.abspath(ck), params)
    out = str(tmp_path / "aot_cli")
    argv = ["--preset", "fabind", "--ckpt", ck, "--output", out,
            "--batch-size", "2", "--platforms", "cpu"]
    argv += [v for kv in TINY.items() for v in ("--set", f"{kv[0]}={kv[1]}")]
    cli_export.main(argv)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["artifacts"] == 1 and rec["bytes"] > 1000
    poses = DockingEngine.from_exported(out).dock_raw(
        [make_raw(n=5, nr=20, seed=1)])
    assert poses[0].error is None
