"""AOT deployment artifacts: weights-baked `jax.export` of the inference
program, one serialized StableHLO module per shape bucket.

A TPU-native packaging step with no reference counterpart (the reference
serves straight from Python torch checkpoints — FABind/fabind/
fabind_inference.py builds the whole model per run): `jax.export`
serializes the fully-lowered inference program together with its calling
convention, with the (optionally bf16-cast) checkpoint weights baked in as
constants. A serving container then needs neither the flax model code nor
the checkpoint file — only `jax` and the artifact directory — and a
CPU-only build host can emit TPU-servable artifacts
(`platforms=("cpu", "tpu")` multi-platform lowering).

Artifact directory layout:
    manifest.json                   config, bucket dims, batch size, dtypes
    bucket_<L>_<P>_<R>.jaxexport    serialized jax.export artifact (bytes)

The exported program's signature is the flattened `FABindBatch` leaf list
(pytree registration is a process-local concern that serialized artifacts
must not depend on); `ExportedInference.__call__` does the flatten/
unflatten and returns the same 6-tuple the live engine's per-bucket
executable returns, so `DockingEngine.from_exported` drops in with zero
change to the dock_* serving surface.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

MANIFEST = "manifest.json"
# v2: sampling programs take unsafe_rbg raw key data (uint32[4], wrapped
# inside the program) instead of threefry uint32[2], and the manifest
# records sampling_pocket_mode
_FORMAT_VERSION = 2

# engine contract: (lig, conf, pkt, idx, mask, overflow); base models have
# no pkt/idx/mask (exported as an empty slot, reconstructed as None)
_OUTPUTS_BASE = ("lig_coords", "confidence", "overflow")
_OUTPUTS_FLEX = ("lig_coords", "confidence", "pocket_coords",
                 "pocket_residues", "pocket_mask", "overflow")


def _bucket_name(shapes) -> str:
    return (f"bucket_{shapes.max_ligand}_{shapes.max_pocket}_"
            f"{shapes.max_protein}.jaxexport")


def _sampling_names(shapes) -> Tuple[str, str]:
    """(pocket half, stochastic dock half) artifact file names — the
    sampling path's two-program split (cli/sample.py)."""
    stem = (f"{shapes.max_ligand}_{shapes.max_pocket}_"
            f"{shapes.max_protein}.jaxexport")
    return f"pocket_{stem}", f"sample_{stem}"


def _spec_batch(cfg_b, batch_size: int, bf16: bool):
    """(flat ShapeDtypeStruct leaves, treedef) of the serving-time batch:
    `collate(..., n_valid=...)` output — sample_valid present, isomorphism
    fields absent (data/batching.py:276) — after the bf16 deployment cast."""
    import jax
    import jax.numpy as jnp

    from fabind_tpu.data.types import dummy_batch

    tmpl = jax.eval_shape(lambda: dummy_batch(
        cfg_b.shapes, batch_size=batch_size,
        feat_dim=cfg_b.model.compound_feat_dim,
        prot_feat_dim=cfg_b.model.protein_feat_dim))
    tmpl = tmpl.replace(
        sample_valid=jax.ShapeDtypeStruct((batch_size,), jnp.bool_))
    if bf16:
        # mirror utils.precision.cast_tree_bf16 on specs
        tmpl = jax.tree_util.tree_map(
            lambda s: (jax.ShapeDtypeStruct(s.shape, jnp.bfloat16)
                       if s.dtype == jnp.float32 else s), tmpl)
    return jax.tree_util.tree_flatten(tmpl)


def normalize_batch(batch, batch_size: int):
    """Match a live FABindBatch to the exported calling convention:
    sample_valid materialized (all rows real when the caller left it None —
    e.g. DockingEngine.warmup's dummy batches), isomorphism fields stripped
    (inference never reads them; eval Loaders may carry them)."""
    import jax.numpy as jnp

    if batch.sample_valid is None:
        batch = batch.replace(sample_valid=jnp.ones(batch_size, bool))
    if batch.isomorphisms is not None or batch.iso_mask is not None:
        batch = batch.replace(isomorphisms=None, iso_mask=None)
    return batch


def export_inference(cfg, params, out_dir: str, *,
                     buckets: Optional[Sequence] = None,
                     batch_size: int = 8, bf16: bool = True,
                     platforms: Sequence[str] = ("cpu", "tpu"),
                     post_optim_steps: int = 0,
                     sampling: bool = False) -> Dict:
    """Export the per-bucket inference executables to `out_dir`.

    `params` is the restored checkpoint param tree (fp32; the bf16
    deployment cast happens here so the artifact bakes the exact serving
    weights). Returns the manifest dict. Each bucket's program mirrors
    `DockingEngine._fn` (serve.py): inference_diag (or the flexible
    variant) plus the optional on-device LAS post-optimization.

    sampling=True additionally exports the FABind+ best-of-N path per
    bucket (round-3 verdict item 7 — the deployment mode that needs AOT
    most, at ~sample_size x the regression cost; reference
    inference_sampling_fabind.py:148-210): the pocket half and the
    STOCHASTIC dock half with an explicit uint32[2] rng-key input (jax
    threefry is platform-independent, so dropout draws are reproducible
    across cpu/tpu), consumed by `DockingEngine.from_exported(...)
    .dock_best_of`. Requires a config with the confidence head
    (e.g. preset('fabind_plus_sampling'))."""
    import jax

    from fabind_tpu.data.buckets import sort_bucket_cfgs
    from fabind_tpu.models.fabind import make_model
    from fabind_tpu.utils.precision import cast_tree_bf16
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    bucket_cfgs = sort_bucket_cfgs(cfg, buckets)
    if bf16:
        params = cast_tree_bf16(params)
    params = jax.tree_util.tree_map(np.asarray, params)
    flexible = bool(cfg.model.flexible_docking)

    entries: List[Dict] = []
    for cfg_b in bucket_cfgs:
        model = make_model(cfg_b)
        specs, treedef = _spec_batch(cfg_b, batch_size, bf16)

        def run_flat(*leaves, _model=model, _treedef=treedef):
            batch = jax.tree_util.tree_unflatten(_treedef, leaves)
            if flexible:
                lig, pkt, idx, mask, conf, overflow = _model.apply(
                    {"params": params}, batch,
                    method="inference_flexible_diag")
            else:
                lig, conf, overflow = _model.apply(
                    {"params": params}, batch, method="inference_diag")
            if post_optim_steps:
                from fabind_tpu.postopt import post_optimize_batch
                lig, _ = post_optimize_batch(
                    lig, batch.lig_rdkit_coords, batch.las_adj,
                    batch.lig_mask, steps=post_optim_steps)
            if flexible:
                return lig, conf, pkt, idx, mask, overflow
            return lig, conf, overflow

        exp = jexport.export(jax.jit(run_flat),
                             platforms=list(platforms))(*specs)
        name = _bucket_name(cfg_b.shapes)
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        s = cfg_b.shapes
        entry = {"file": name, "shapes": dataclasses.asdict(s)}

        if sampling:
            import jax.numpy as jnp
            assert cfg_b.model.confidence_training, \
                ("sampling export needs the confidence head — use a "
                 "fabind_plus_sampling config")
            mode = getattr(cfg_b.model, "sampling_pocket_mode", "fixed")
            center_spec = jax.ShapeDtypeStruct((batch_size, 3), jnp.float32)
            # raw key DATA crosses the export boundary (extended PRNG
            # dtypes don't); wrapped back inside the program. uint32[4] =
            # the sampling path's unsafe_rbg impl (cli/sample.py
            # _SAMPLING_PRNG_IMPL — measured 0.85 -> 1.20 c/s best-of-40)
            from fabind_tpu.cli.sample import _SAMPLING_PRNG_IMPL
            key_spec = jax.ShapeDtypeStruct((4,), jnp.uint32)

            def _wrap(raw):
                return jax.random.wrap_key_data(raw,
                                                impl=_SAMPLING_PRNG_IMPL)

            if mode == "stochastic":
                # reference protocol (cli/sample.py sample_poses): per-pass
                # stochastic pocket half (returns its outputs + rounded
                # center) and the dock-from-pocket continuation
                def pocket_flat(*args, _model=model, _treedef=treedef):
                    *leaves, key = args
                    batch = jax.tree_util.tree_unflatten(_treedef, leaves)
                    from fabind_tpu.cli.sample import _pocket_stoch_impl
                    return _pocket_stoch_impl(_model, params, batch,
                                              _wrap(key))

                def sample_flat(*args, _model=model, _treedef=treedef):
                    *leaves, co, po, cl, ra, center, key = args
                    batch = jax.tree_util.tree_unflatten(_treedef, leaves)
                    from fabind_tpu.cli.sample import _dock_from_impl
                    return _dock_from_impl(_model, params, batch,
                                           (co, po, cl, ra), center,
                                           _wrap(key))

                pexp = jexport.export(jax.jit(pocket_flat),
                                      platforms=list(platforms))(
                    *specs, key_spec)
                pocket_out, _center = jax.eval_shape(
                    pocket_flat, *specs, key_spec)
                pocket_specs = [jax.ShapeDtypeStruct(o.shape, o.dtype)
                                for o in pocket_out]
                sexp = jexport.export(jax.jit(sample_flat),
                                      platforms=list(platforms))(
                    *specs, *pocket_specs, center_spec, key_spec)
            else:
                def pocket_flat(*leaves, _model=model, _treedef=treedef):
                    batch = jax.tree_util.tree_unflatten(_treedef, leaves)
                    return _model.apply({"params": params}, batch,
                                        method="_pocket_pred",
                                        deterministic=True)

                def sample_flat(*args, _model=model, _treedef=treedef):
                    *leaves, center, key = args
                    batch = jax.tree_util.tree_unflatten(_treedef, leaves)

                    def run(mdl, batch, center):
                        return mdl.inference(batch, center_override=center,
                                             deterministic=False)
                    k = _wrap(key)
                    return _model.apply({"params": params}, batch, center,
                                        method=run,
                                        rngs={"dropout": k, "sample": k})

                pexp = jexport.export(jax.jit(pocket_flat),
                                      platforms=list(platforms))(*specs)
                sexp = jexport.export(jax.jit(sample_flat),
                                      platforms=list(platforms))(
                    *specs, center_spec, key_spec)
            pname, sname = _sampling_names(cfg_b.shapes)
            with open(os.path.join(out_dir, pname), "wb") as f:
                f.write(pexp.serialize())
            with open(os.path.join(out_dir, sname), "wb") as f:
                f.write(sexp.serialize())
            entry["pocket_file"] = pname
            entry["sample_file"] = sname
        entries.append(entry)

    manifest = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "config": dataclasses.asdict(cfg),
        "buckets": entries,
        "batch_size": batch_size,
        "bf16": bf16,
        "flexible": flexible,
        "post_optim_steps": post_optim_steps,
        "sampling": bool(sampling),
        "sampling_pocket_mode": (getattr(cfg.model, "sampling_pocket_mode",
                                         "fixed") if sampling else None),
        "platforms": list(platforms),
        "outputs": list(_OUTPUTS_FLEX if flexible else _OUTPUTS_BASE),
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def config_from_dict(d: Dict):
    """Rebuild a FABindConfig from manifest JSON (all fields are scalars —
    config.py keeps the dataclasses JSON-clean by construction)."""
    from fabind_tpu.config import (FABindConfig, ModelConfig, ShapeConfig,
                                   TrainConfig)
    return FABindConfig(model=ModelConfig(**d["model"]),
                        shapes=ShapeConfig(**d["shapes"]),
                        train=TrainConfig(**d["train"]))


class ExportedInference:
    """A loaded artifact directory: bucket-keyed callables with the live
    engine's (params, batch) -> (lig, conf, pkt, idx, mask, overflow)
    contract (params are baked into the artifact and ignored)."""

    def __init__(self, path: str):
        from jax import export as jexport

        with open(os.path.join(path, MANIFEST)) as f:
            self.manifest = json.load(f)
        v = self.manifest.get("format_version")
        if v != _FORMAT_VERSION:
            raise ValueError(f"{path}: unsupported artifact format {v!r} "
                             f"(this build reads {_FORMAT_VERSION})")
        self.cfg = config_from_dict(self.manifest["config"])
        self.batch_size = int(self.manifest["batch_size"])
        self.bf16 = bool(self.manifest["bf16"])
        self.flexible = bool(self.manifest["flexible"])
        self.post_optim_steps = int(self.manifest["post_optim_steps"])
        self.sampling = bool(self.manifest.get("sampling", False))
        # artifacts predating the protocol choice carry the fixed halves
        self.sampling_pocket_mode = (
            self.manifest.get("sampling_pocket_mode") or "fixed")
        self.bucket_cfgs = [
            self.cfg.replace(
                shapes=dataclasses.replace(self.cfg.shapes, **e["shapes"]))
            for e in self.manifest["buckets"]]
        self._exported = {}
        self._sampling_exported = {}
        for cfg_b, e in zip(self.bucket_cfgs, self.manifest["buckets"]):
            with open(os.path.join(path, e["file"]), "rb") as f:
                self._exported[id(cfg_b)] = jexport.deserialize(f.read())
            if self.sampling:
                with open(os.path.join(path, e["pocket_file"]), "rb") as f:
                    pexp = jexport.deserialize(f.read())
                with open(os.path.join(path, e["sample_file"]), "rb") as f:
                    sexp = jexport.deserialize(f.read())
                self._sampling_exported[id(cfg_b)] = (pexp, sexp)

    def fn(self, cfg_b):
        """Engine-contract callable for one bucket config (identity-keyed,
        like DockingEngine._fn)."""
        import jax

        exp = self._exported[id(cfg_b)]

        def call(_params, batch):
            batch = normalize_batch(batch, self.batch_size)
            leaves = jax.tree_util.tree_leaves(batch)
            try:
                out = exp.call(*leaves)
            except (TypeError, ValueError) as e:
                raise ValueError(
                    f"batch does not match the exported calling convention "
                    f"(batch_size {self.batch_size}, bf16={self.bf16}, "
                    f"bucket lig {cfg_b.shapes.max_ligand}/pkt "
                    f"{cfg_b.shapes.max_pocket}/prot "
                    f"{cfg_b.shapes.max_protein}) — re-export or fix the "
                    f"caller: {e}") from e
            if self.flexible:
                lig, conf, pkt, idx, mask, overflow = out
            else:
                (lig, conf, overflow), pkt, idx, mask = out, None, None, None
            return lig, conf, pkt, idx, mask, overflow

        return call

    def sampling_halves(self, cfg_b):
        """(pocket_fn, dock_fn) with cli/sample.py's live-halves contract
        for the artifact's `sampling_pocket_mode`:
          - "fixed": pocket_fn(params, batch) -> 4-tuple;
            dock_fn(params, batch, center, key) -> (coords, conf)
          - "stochastic": pocket_fn(params, batch, key) -> (4-tuple,
            center); dock_fn(params, batch, pocket, center, key)
        Raises when the artifact was exported without `sampling=True`."""
        import jax
        import jax.numpy as jnp

        if id(cfg_b) not in self._sampling_exported:
            raise ValueError(
                "this artifact was exported without the sampling programs "
                "— re-export with export_inference(..., sampling=True) / "
                "cli.export --sampling to serve dock_best_of")
        pexp, sexp = self._sampling_exported[id(cfg_b)]

        def _raw(key):
            # live halves take typed unsafe_rbg keys; the exported programs
            # take their raw data (wrap_key_data happens inside the program)
            import jax.random as jr
            return (jr.key_data(key) if jnp.issubdtype(key.dtype, jax.dtypes.prng_key)
                    else jnp.asarray(key, jnp.uint32))

        if self.sampling_pocket_mode == "stochastic":
            def pocket_fn(_params, batch, key):
                batch = normalize_batch(batch, self.batch_size)
                return pexp.call(*jax.tree_util.tree_leaves(batch),
                                 _raw(key))

            def dock_fn(_params, batch, pocket, center, key):
                batch = normalize_batch(batch, self.batch_size)
                return sexp.call(*jax.tree_util.tree_leaves(batch), *pocket,
                                 jnp.asarray(center, jnp.float32),
                                 _raw(key))
        else:
            def pocket_fn(_params, batch):
                batch = normalize_batch(batch, self.batch_size)
                return pexp.call(*jax.tree_util.tree_leaves(batch))

            def dock_fn(_params, batch, center, key):
                batch = normalize_batch(batch, self.batch_size)
                return sexp.call(*jax.tree_util.tree_leaves(batch),
                                 jnp.asarray(center, jnp.float32),
                                 _raw(key))

        return pocket_fn, dock_fn
