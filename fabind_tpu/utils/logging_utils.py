"""Console + file logger and metric formatting.

Replaces the reference's accelerate Logger + TensorBoard writers
(FABind/fabind/utils/logging_utils.py:5-30, metrics_to_tsb.py:4-9).
TensorBoard/W&B are optional; metrics always stream to a JSONL file, which is
the primary observability surface here.
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, Optional


class Logger:
    def __init__(self, log_dir: Optional[str] = None, name: str = "fabind_tpu",
                 use_wandb: bool = False):
        self.use_wandb = use_wandb
        self.logger = logging.getLogger(name)
        self.logger.setLevel(logging.INFO)
        self.logger.handlers.clear()
        fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        self.logger.addHandler(sh)
        self.jsonl = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
            fh.setFormatter(fmt)
            self.logger.addHandler(fh)
            self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(log_dir, "tsb"))
            except Exception:
                self._tb = None

    def log_message(self, msg: str):
        self.logger.info(msg)

    def log_metrics(self, metrics: Dict[str, float], step: int,
                    phase: str = "train"):
        clean = {k: (float(v) if hasattr(v, "item") or isinstance(
            v, (int, float)) else v) for k, v in metrics.items()}
        parts = ", ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                          for k, v in sorted(clean.items()))
        self.logger.info(f"[{phase} step {step}] {parts}")
        if self.jsonl:
            rec = {"ts": time.time(), "phase": phase, "step": step, **clean}
            self.jsonl.write(json.dumps(rec) + "\n")
            self.jsonl.flush()
        if self._tb:
            for k, v in clean.items():
                if isinstance(v, float):
                    self._tb.add_scalar(f"{phase}/{k}", v, step)
        if self.use_wandb:
            log_to_wandb(clean, phase, step)


def init_wandb(run_name: str, config: Optional[dict] = None,
               project: str = "fabind_tpu") -> None:
    """Start a W&B run for a --wandb'd training CLI
    (FABind_plus/fabind/main_fabind.py:35-49 wandb.init path). Raises
    SystemExit with a clear message when the optional wandb package is not
    installed — the user explicitly asked for W&B, silently degrading to
    JSONL-only would hide the misconfiguration. No-op when a run is already
    active (e.g. a sweep agent started one)."""
    try:
        import wandb
    except ImportError:
        raise SystemExit(
            "--wandb requires the `wandb` package (pip install wandb); "
            "metrics always stream to <output>/metrics.jsonl regardless")
    if wandb.run is None:
        wandb.init(project=project, name=run_name, config=config or {})


def log_to_wandb(metrics: Dict[str, float], phase: str, epoch: int) -> bool:
    """Per-phase metric logging to Weights & Biases
    (FABind_plus/fabind/utils/logging_utils.py:33-47); wired into
    Logger.log_metrics via Logger(use_wandb=True) (the CLIs' --wandb flag).
    The wandb package is optional: when it is not installed (or no run is
    active) this is a no-op returning False — the JSONL stream from
    Logger.log_metrics remains the primary observability surface.
    """
    try:
        import wandb
    except ImportError:
        return False
    if wandb.run is None:
        return False
    log_dict = {f"{phase}/{k}": v for k, v in metrics.items()}
    log_dict["epoch"] = epoch
    wandb.log(log_dict)
    return True
