"""Orbax checkpointing.

Replaces `accelerator.save_state`/auto-resume (FABind/fabind/main_fabind.py:
298-306, 594-596): per-epoch directories + a `last` alias, restoring model,
optimizer and step.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_state(ckpt_dir: str, state, step: Optional[int] = None) -> str:
    path = os.path.join(os.path.abspath(ckpt_dir),
                        f"step_{int(step if step is not None else state.step)}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_state(ckpt_dir: str, target, step: Optional[int] = None):
    """Restore into the structure of `target` (a TrainState template)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            return None
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)


def save_params(path: str, params: Any) -> str:
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
    return path


def restore_params(path: str, template: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
