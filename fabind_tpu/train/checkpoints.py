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


def _scan_steps(ckpt_dir: str):
    """(step, is_manager_layout) entries for both on-disk layouts:
    legacy `step_N` dirs (save_state) and bare-int dirs written by
    TrainCheckpointer's orbax CheckpointManager."""
    out = []
    if not os.path.isdir(ckpt_dir):
        return out
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                out.append((int(name.split("_", 1)[1]), False))
            except ValueError:
                pass
        elif name.isdigit():
            out.append((int(name), True))
    return out


def latest_step(ckpt_dir: str) -> Optional[int]:
    steps = _scan_steps(ckpt_dir)
    return max(s for s, _ in steps) if steps else None


def restore_state(ckpt_dir: str, target, step: Optional[int] = None):
    """Restore into the structure of `target` (a TrainState template).

    Reads either layout: legacy `step_N` StandardCheckpointer dirs, or the
    CheckpointManager layout TrainCheckpointer writes (bare-int step dirs
    with `state`/`meta` items) — so e.g. `train_confidence --init-ckpt`
    accepts a directory produced by `cli/train.py`."""
    steps = dict(_scan_steps(ckpt_dir))
    if step is None:
        if not steps:
            return None
        step = max(steps)
    if step not in steps:
        return None
    if steps[step]:   # manager layout
        ck = TrainCheckpointer(ckpt_dir)
        try:
            state, _ = ck.restore(target, step=step)
        finally:
            ck.close()
        return state
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


def _leaf_paths(tree: Any, path: str, out: list) -> None:
    """Append one path entry PER LEAF under tree (so missing-leaf counts
    compare directly against tree_leaves totals)."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            _leaf_paths(v, f"{path}/{k}", out)
    else:
        out.append(path)


def overlay(template: Any, restored: Any, _path: str = "",
            _missing: list = None) -> Any:
    """Recursively overlay restored params onto a template: entries missing
    from the checkpoint keep their template (fresh-init) values — the
    strict=False torch load_state_dict semantics the reference relies on for
    the confidence-head superset (test_sampling_fabind.py:114).

    A restored leaf whose shape disagrees with the template raises
    immediately with its path (otherwise the mismatch surfaces as a cryptic
    jit shape error far downstream). Pass a list as _missing to collect the
    template paths the checkpoint did not provide; restore_params uses this
    to refuse checkpoints with ZERO overlap (a wrong-model checkpoint would
    otherwise 'restore' 100% fresh-init params silently)."""
    if isinstance(template, dict):
        out = {}
        for k, v in template.items():
            if isinstance(restored, dict) and k in restored:
                out[k] = overlay(v, restored[k], f"{_path}/{k}", _missing)
            else:
                out[k] = v
                if _missing is not None:
                    _leaf_paths(v, f"{_path}/{k}", _missing)
        return out
    if restored is None:
        if _missing is not None:
            _missing.append(_path)
        return template
    ts = getattr(template, "shape", None)
    rs = getattr(restored, "shape", None)
    if ts is not None and rs is not None and tuple(ts) != tuple(rs):
        raise ValueError(f"checkpoint leaf {_path} has shape {tuple(rs)}, "
                         f"model expects {tuple(ts)}")
    return restored


_overlay = overlay


def restore_params(path: str, template: Any) -> Any:
    """Restore a params tree from a StandardCheckpointer dir, or — when
    given a training run's checkpoint directory (either layout) — the
    params of its latest TrainState, overlaid onto `template` (entries the
    checkpoint lacks, e.g. a fresh confidence head over a regression
    checkpoint, keep their template init)."""
    steps = dict(_scan_steps(path))
    if steps:
        step = max(steps)
        if steps[step]:   # manager layout: raw-restore the state item
            mgr = ocp.CheckpointManager(os.path.abspath(path))
            try:
                out = mgr.restore(step, args=ocp.args.Composite(
                    state=ocp.args.StandardRestore()))
            finally:
                mgr.close()
            restored = out["state"]["params"]
        else:
            p = os.path.join(os.path.abspath(path), f"step_{step}")
            restored = ocp.StandardCheckpointer().restore(p)["params"]
        import jax
        missing: list = []
        out = _overlay(jax.tree_util.tree_map(lambda x: x, template),
                       restored, _missing=missing)
        n_total = len(jax.tree_util.tree_leaves(template))
        if missing and len(missing) >= n_total:
            raise ValueError(
                f"checkpoint at {path} shares no parameters with this "
                f"model (all {n_total} leaves would stay fresh-init) — "
                f"wrong checkpoint or wrong preset?")
        if missing:
            import sys
            print(f"restore_params: {len(missing)}/{n_total} param leaves "
                  f"not in checkpoint, kept at template init (strict=False "
                  f"overlay); first: {missing[:3]}", file=sys.stderr)
        return out
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def load_params(ckpt: str, template: Any, verbose: bool = True
                ) -> "tuple[Any, Any]":
    """One-stop parameter load for eval/sample/serve-style drivers: a torch
    .bin/.pt is auto-converted (missing/unused reported), anything else is
    an orbax checkpoint (StandardCheckpointer dir or a training run's
    checkpoint dir, restore_params semantics). Returns (params on device,
    report dict or None). Shared so the drivers cannot drift apart in how
    they read checkpoints."""
    import jax
    import jax.numpy as jnp
    if ckpt.endswith(".bin") or ckpt.endswith(".pt"):
        from fabind_tpu.train.convert import convert_checkpoint
        params, report = convert_checkpoint(ckpt, template)
        if verbose:
            print(f"converted torch ckpt: {report['n_torch']} tensors, "
                  f"{len(report['missing'])} missing, "
                  f"{len(report['unused'])} unused")
            if report["missing"]:
                print("MISSING:", report["missing"][:20])
    else:
        params, report = restore_params(ckpt, template), None
    return jax.tree_util.tree_map(jnp.asarray, params), report


def save_params_npz(path: str, params: Any) -> str:
    """Single-file portable params artifact (compressed npz of the
    flattened tree). NOT a training-checkpoint format — orbax
    (`save_state`/`save_params`) remains that; this exists for small
    committed artifacts (e.g. the within-protocol confidence regression
    checkpoint, tests/assets/) and lightweight interchange."""
    import numpy as np

    from fabind_tpu.train.convert import _flatten

    import jax

    host = jax.device_get(params)
    flat = {"/".join(k): np.asarray(v) for k, v in _flatten(host)}
    np.savez_compressed(path, **flat)
    return path


def load_params_npz(path: str) -> Any:
    """Inverse of `save_params_npz` (plain nested-dict params tree)."""
    import numpy as np

    from fabind_tpu.train.convert import _unflatten

    with np.load(path) as z:
        return _unflatten({tuple(k.split("/")): z[k] for k in z.files})
