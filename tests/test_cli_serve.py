"""cli.serve driver wiring: auto-bucket inference from a reference-format
dataset, explicit bucket parsing, and flag->engine plumbing (serve_forever
stubbed; the HTTP layer itself is covered by test_serve_http.py)."""
from __future__ import annotations

import pytest

from common import TINY
from fixture_pdbbind import make_reference_fixture

_TINY_SET = [f"--set={k}={v}" for k, v in TINY.items()]


def _capture_serve(monkeypatch):
    import fabind_tpu.serve_http as sh
    captured = {}

    def fake(engine, host="127.0.0.1", port=8400, **kw):
        captured["engine"], captured["hp"] = engine, (host, port)
        captured["kw"] = kw

    monkeypatch.setattr(sh, "serve_forever", fake)
    return captured


def test_cli_serve_auto_buckets(tmp_path, monkeypatch):
    make_reference_fixture(str(tmp_path))
    captured = _capture_serve(monkeypatch)
    from fabind_tpu.cli import serve as cs
    cs.main(["--preset", "fabind", "--buckets", "auto:2",
             "--data", str(tmp_path), "--batch-size", "2",
             "--port", "8123"] + _TINY_SET)
    eng = captured["engine"]
    assert captured["hp"] == ("127.0.0.1", 8123)
    assert eng.batch_size == 2
    assert 1 <= len(eng.bucket_cfgs) <= 2
    # suggest_buckets contract: the largest bucket covers the preset shapes
    last = eng.bucket_cfgs[-1].shapes
    assert last.max_ligand <= TINY["max_ligand"]
    assert last.max_protein <= TINY["max_protein"]
    # buckets are usable: fixture-sized complexes route into some bucket
    assert all(b.max_ligand >= 8 and b.max_protein >= 28
               for b in (c.shapes for c in eng.bucket_cfgs))


def test_cli_serve_explicit_buckets_and_flags(tmp_path, monkeypatch):
    captured = _capture_serve(monkeypatch)
    from fabind_tpu.cli import serve as cs
    cs.main(["--preset", "fabind", "--buckets", "8:16:32,16:24:48",
             "--no-bf16", "--batch-size", "4", "--host", "0.0.0.0"]
            + _TINY_SET)
    eng = captured["engine"]
    assert captured["hp"] == ("0.0.0.0", 8400)
    assert eng.bf16 is False
    dims = [(c.shapes.max_ligand, c.shapes.max_pocket, c.shapes.max_protein)
            for c in eng.bucket_cfgs]
    assert dims == [(8, 16, 32), (16, 24, 48)]


def test_cli_serve_auto_requires_data():
    from fabind_tpu.cli import serve as cs
    with pytest.raises(SystemExit):
        cs.main(["--preset", "fabind", "--buckets", "auto"] + _TINY_SET)


def test_cli_serve_exported_artifact(tmp_path, monkeypatch):
    from fabind_tpu.aot import export_inference
    from fabind_tpu.config import preset
    from fabind_tpu.serve import DockingEngine

    cfg = preset("fabind", **TINY)
    out = str(tmp_path / "art")
    export_inference(cfg, DockingEngine(cfg, batch_size=2, bf16=False).params,
                     out, batch_size=2, bf16=True, platforms=("cpu",))

    captured = _capture_serve(monkeypatch)
    from fabind_tpu.cli import serve as cs
    cs.main(["--exported", out, "--port", "8321"])
    eng = captured["engine"]
    assert captured["hp"] == ("127.0.0.1", 8321)
    # manifest-driven engine: config/batch/bf16 from the artifact, no live
    # models, executables prepopulated for every bucket
    assert eng.batch_size == 2 and eng.bf16 is True
    assert eng.cfg.model.hidden_size == TINY["hidden_size"]
    assert not eng._models and len(eng._fns) == len(eng.bucket_cfgs) == 1

    # model flags alongside --exported are rejected, not silently ignored
    with pytest.raises(SystemExit, match="re-export"):
        cs.main(["--exported", out, "--buckets", "8:16:32"])
    with pytest.raises(SystemExit, match="re-export"):
        cs.main(["--exported", out, "--no-bf16"])
