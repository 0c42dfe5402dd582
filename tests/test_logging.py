"""Logger observability surfaces: JSONL (primary) + optional W&B wiring.

The reference logs to W&B behind a --wandb flag
(FABind_plus/fabind/main_fabind.py:35-49, utils/logging_utils.py:33-47);
here the same flag threads Logger(use_wandb=True) -> log_to_wandb. The wandb
package is absent in CI, so these tests drive the wiring through a stub
module and the refusal path through an import failure.
"""
import json
import sys
import types

import pytest

from fabind_tpu.utils.logging_utils import Logger, init_wandb, log_to_wandb


def _fake_wandb(calls):
    fake = types.ModuleType("wandb")
    fake.run = None

    def init(project=None, name=None, config=None):
        fake.run = types.SimpleNamespace(project=project, name=name,
                                         config=config)
    fake.init = init
    fake.log = calls.append
    return fake


def test_wandb_wiring(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setitem(sys.modules, "wandb", _fake_wandb(calls))
    init_wandb("run1", {"lr": 1e-4})
    assert sys.modules["wandb"].run.project == "fabind_tpu"
    lg = Logger(str(tmp_path), use_wandb=True)
    lg.log_metrics({"loss": 1.5, "rmsd": 2.0}, step=3, phase="train")
    assert calls == [{"train/loss": 1.5, "train/rmsd": 2.0, "epoch": 3}]
    # JSONL stays the primary surface regardless of wandb
    rec = json.loads((tmp_path / "metrics.jsonl").read_text().splitlines()[-1])
    assert rec["loss"] == 1.5 and rec["phase"] == "train"


def test_wandb_noop_without_active_run(monkeypatch):
    calls = []
    monkeypatch.setitem(sys.modules, "wandb", _fake_wandb(calls))
    assert log_to_wandb({"loss": 1.0}, "train", 0) is False
    assert calls == []


def test_init_wandb_refuses_without_package(monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> ImportError
    with pytest.raises(SystemExit, match="wandb"):
        init_wandb("run2")


def test_train_cli_exposes_wandb_flag():
    """Both training CLIs accept --wandb (the reference's flag,
    main_fabind.py:35-49) — parse-level check, no training run."""
    from fabind_tpu.cli import train, train_confidence

    for mod in (train, train_confidence):
        src = open(mod.__file__).read()
        assert "--wandb" in src and "use_wandb=args.wandb" in src
