"""Data-parallel training step (jit + sharding), checkpointable train state.

Replaces the reference's accelerate training driver
(FABind/fabind/main_fabind.py:289-306, 383-426): one jitted train step over a
1-D dp mesh; grads are averaged by XLA-inserted psum over ICI. NaN batches are
skipped inside the step (reference skips them in Python,
main_fabind.py:394-396).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fabind_tpu.config import FABindConfig
from fabind_tpu.models.fabind import FABind, make_model
from fabind_tpu.train.losses import fabind_losses
from fabind_tpu.train.schedule import build_optimizer

Array = jax.Array


@struct.dataclass
class TrainState:
    step: Array
    params: Any
    opt_state: Any
    rng: Array


def create_train_state(cfg: FABindConfig, rng: Array, batch) -> Tuple[FABind, TrainState]:
    model = make_model(cfg)
    init_rng, state_rng = jax.random.split(rng)
    # one compiled program: eager op-by-op init costs minutes on a remote
    # TPU (every op is a tunnel round-trip) and dominates startup. The
    # batch is a jit ARGUMENT, not a closure capture: capturing a
    # device-resident batch makes lowering fetch every leaf back to host
    # to inline as MLIR constants — a ~30MB device->host transfer at b12
    # training shapes that can wedge the tunnel (measured round 5)
    variables = jax.jit(lambda b: model.init(
        {"params": init_rng, "dropout": init_rng, "sample": init_rng},
        b, train=True))(batch)
    tx = build_optimizer(cfg.train)
    opt_state = jax.jit(tx.init)(variables["params"])
    return model, TrainState(step=jnp.zeros((), jnp.int32),
                             params=variables["params"],
                             opt_state=opt_state, rng=state_rng)


def make_train_step(model: FABind, cfg: FABindConfig):
    tx = build_optimizer(cfg.train)
    bf16 = cfg.train.bf16

    def loss_fn(params, batch, key):
        p, b = params, batch
        if bf16:
            # mixed precision with fp32 master weights: params AND batch
            # floats are cast so every matmul runs bf16 (casting params only
            # is a no-op — fp32 inputs re-promote each matmul to fp32; the
            # serving path, serve.py _cast_batch_bf16, casts both for the
            # same reason). Losses read the original fp32 batch.
            from fabind_tpu.utils.precision import cast_tree_bf16
            p = cast_tree_bf16(params)
            b = cast_tree_bf16(batch)
        dk, sk = jax.random.split(key)
        out = model.apply({"params": p}, b, train=True,
                          rngs={"dropout": dk, "sample": sk})
        if bf16:
            out = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, out)
        return fabind_losses(out, batch, cfg.model, cfg.train)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, Array]]:
        key = jax.random.fold_in(state.rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, key)
        # NaN-batch skip (main_fabind.py:394-396): zero the update instead of
        # a host-side `continue`. One check suffices: NaN/Inf in any grad
        # leaf propagates into the global norm (which the metrics need
        # anyway); step time is unchanged vs per-leaf checks (XLA fused
        # them), this is just fewer HLO ops.
        grad_norm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates)
        # a skipped batch must leave the optimizer untouched too, like the
        # reference's host-side `continue`: otherwise Adam's moments decay
        # and its bias-correction count advances on a zero gradient (and
        # under MultiSteps the NaN micro-batch would be averaged into the
        # accumulation window as zeros)
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old),
            opt_state, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        # report 0 for every metric on skipped-NaN steps: the raw values are
        # NaN exactly then, and one such step would poison any averaged
        # logging window (skipped_nan carries the signal instead)
        metrics = {k: jnp.where(ok, v, jnp.zeros_like(v))
                   for k, v in metrics.items()}
        metrics["skipped_nan"] = (~ok).astype(jnp.float32)
        metrics["grad_norm"] = jnp.where(ok, grad_norm, 0.0)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, rng=state.rng), metrics

    return train_step


def make_sharded_train_step(model: FABind, cfg: FABindConfig, mesh: Mesh):
    """jit the train step over a dp mesh: params/opt replicated, batch
    sharded on the leading axis."""
    step = make_train_step(model, cfg)
    bsh = NamedSharding(mesh, P("dp"))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def sharded_step(state, batch):
        batch = jax.lax.with_sharding_constraint(batch, bsh)
        new_state, metrics = step(state, batch)
        return new_state, metrics

    return sharded_step


class BucketedTrainStep:
    """Shape-bucketed training: one jitted train step per shape bucket,
    all sharing the same params/optimizer state.

    The TPU answer to the reference's per-sample ragged train batches
    (FABind/fabind/main_fabind.py:383): the Loader routes each complex to the
    smallest bucket it fits, and this dispatcher runs the matching compiled
    step. Steps compile lazily on first use (the persistent XLA cache makes
    restarts cheap); params and optimizer state are shape-independent, so
    the TrainState threads through unchanged whichever bucket ran.

    NOT safe under multi-host dp: bucket routing is data-dependent per host,
    so per-host batch counts per bucket can diverge and hang the collective
    step — cli.train degrades to one auto-sized bucket there (the Loader
    enforces the same invariant)."""

    def __init__(self, cfg: FABindConfig, mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.mesh = mesh
        self._steps: Dict[Any, Any] = {}

    def step_for(self, bucket_cfg: FABindConfig):
        key = bucket_cfg.shapes  # frozen dataclass: hashable, stable
        if key not in self._steps:
            model = make_model(bucket_cfg)
            if self.mesh is not None:
                self._steps[key] = make_sharded_train_step(
                    model, bucket_cfg, self.mesh)
            else:
                self._steps[key] = jax.jit(
                    make_train_step(model, bucket_cfg), donate_argnums=0)
        return self._steps[key]

    def __call__(self, state: TrainState, batch,
                 bucket_cfg: Optional[FABindConfig] = None):
        return self.step_for(bucket_cfg or self.cfg)(state, batch)


def make_eval_step(model: FABind, stage: int = 2):
    @jax.jit
    def eval_step(params, batch):
        out = model.apply({"params": params}, batch, train=False, stage=stage)
        return out
    return eval_step


def make_inference_step(model: FABind):
    @jax.jit
    def infer(params, batch):
        return model.apply({"params": params}, batch, method="inference")
    return infer
