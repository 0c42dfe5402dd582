"""The deployment self-test must pass on a fresh install (CPU here)."""
import json

from fabind_tpu.cli import selftest


def test_selftest_inference(capsys):
    assert selftest.main([]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    checks = {l["check"]: l for l in lines if "check" in l}
    assert checks["devices"]["ok"] and checks["devices"]["n"] >= 1
    assert checks["inference_tiny"]["ok"]
    assert lines[-1] == {"selftest": "ok"}


def test_selftest_train_step(capsys):
    assert selftest.main(["--train"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    checks = {l["check"]: l for l in lines if "check" in l}
    assert checks["train_step"]["grad_norm"] > 0
