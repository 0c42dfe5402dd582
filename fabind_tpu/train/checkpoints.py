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


class TrainCheckpointer:
    """Production checkpointing for long TPU runs, beyond the reference's
    per-epoch `accelerator.save_state` (main_fabind.py:594-596):

    - async saves (training continues while orbax writes),
    - retention (keep the newest `max_to_keep` step dirs),
    - a JSON metadata item carrying the data-order position
      (epoch, batch_in_epoch) so a preempted run resumes mid-epoch with
      the exact batch sequence (Loader.epoch(skip_batches=...)).
    """

    def __init__(self, ckpt_dir: str, max_to_keep: int = 3,
                 async_save: bool = True):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(ckpt_dir),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, state, meta: Optional[dict] = None,
             step: Optional[int] = None) -> None:
        step = int(step if step is not None else state.step)
        self._mgr.save(step, args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            meta=ocp.args.JsonSave(meta or {}),
        ))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target, step: Optional[int] = None):
        """Returns (state, meta) or None if no checkpoint exists."""
        if step is None:
            step = self._mgr.latest_step()
            if step is None:
                return None
        out = self._mgr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(target),
            meta=ocp.args.JsonRestore(),
        ))
        return out["state"], (out["meta"] or {})

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params(path: str, params: Any) -> str:
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()
    return path


def restore_params(path: str, template: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
