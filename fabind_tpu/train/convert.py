"""PyTorch checkpoint → flax params converter.

Maps the reference's released state dicts (ckpt/best_model.bin for FABind,
ckpt/fabind_plus_best_ckpt.bin + confidence_model.bin for FABind+; loaded by
test_fabind.py:240 / test_sampling_fabind.py:114) onto the fabind_tpu param
tree. Module names were chosen to mirror the torch names, so conversion is a
mechanical rename + transpose:

- torch Linear weight [out, in]   -> flax Dense kernel [in, out] (transpose)
- torch LayerNorm weight/bias     -> flax LayerNorm scale/bias
- Sequential MLP indices .0/.2    -> MLPBlock linear1/linear2
- MC_Att_L linear_kv              -> linear_kv_kernel/_bias (the interleaved
  k/v split kv[...,0::2]/kv[...,1::2], egnn.py:205, is reproduced at runtime,
  so weights convert untouched)

Unused reference params (e.g. the dead inter_layer/attn_bias_proj created but
unused when add_cross_attn_layer is on) are reported and dropped.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

# torch module path component -> flax path component(s)
_RENAMES = {
    "0": "linear1",      # Sequential index in base MLPs
    "2": "linear2",
}


def _to_flax_path(torch_key: str) -> Tuple[List[str], str]:
    """Return (flax path components, leaf kind) for a torch param key."""
    parts = torch_key.split(".")
    leaf = parts[-1]                      # weight | bias
    mods = parts[:-1]
    # special case: MC_Att_L linear_kv -> flat params
    if mods and mods[-1] == "linear_kv":
        name = "linear_kv_kernel" if leaf == "weight" else "linear_kv_bias"
        return mods[:-1] + [name], "flat"
    # special case: RBFDistanceModule's Sequential is named 'mlp'
    # (model_utils.py:239-252) -> flax mlp_0 / mlp_3
    if len(mods) >= 2 and mods[-2] == "mlp" and mods[-1] in ("0", "3"):
        return mods[:-2] + [f"mlp_{mods[-1]}"], leaf
    mods = [_RENAMES.get(m, m) for m in mods]
    return mods, leaf


def convert_state_dict(sd: Dict[str, Any], template: Any
                       ) -> Tuple[Any, List[str], List[str]]:
    """Convert a torch state dict into the flax param tree `template`.

    Returns (params, missing_flax_paths, unused_torch_keys). Every template
    leaf must be filled for a successful conversion.
    """
    import jax

    flat_template = dict(_flatten(template))
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    unused = []

    for key, val in sd.items():
        arr = np.asarray(val.detach().cpu().numpy()
                         if hasattr(val, "detach") else val)
        mods, leaf = _to_flax_path(key)
        if leaf == "flat":
            path = tuple(mods)
            if path in flat_template:
                if arr.ndim == 2:          # linear_kv weight [2C, 1+C]
                    arr = arr.T
                out[path] = arr
            else:
                unused.append(key)
            continue
        base = tuple(mods)
        if leaf == "weight":
            if arr.ndim == 2:
                cand = [(base + ("kernel",), arr.T)]
            else:
                cand = [(base + ("scale",), arr),   # LayerNorm
                        (base + ("kernel",), arr)]
        elif leaf == "bias":
            cand = [(base + ("bias",), arr)]
        else:
            # bare parameter like glb_c
            cand = [(base + (leaf,), arr), (base, arr)]
        placed = False
        for path, a in cand:
            if path in flat_template:
                out[path] = a
                placed = True
                break
        if not placed:
            unused.append(key)

    missing = []
    result = {}
    for path, tmpl in flat_template.items():
        if path in out:
            a = out[path]
            if tuple(a.shape) != tuple(tmpl.shape):
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}: torch {a.shape} "
                    f"vs flax {tmpl.shape}")
            result[path] = a.astype(np.asarray(tmpl).dtype
                                    if hasattr(tmpl, "dtype") else np.float32)
        else:
            missing.append("/".join(path))
            result[path] = np.asarray(tmpl)

    params = _unflatten(result)
    return params, missing, unused


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    # strip DDP prefix
    return {re.sub(r"^module\.", "", k): v for k, v in sd.items()}


def convert_checkpoint(path: str, template: Any):
    """Load + convert; returns (params, report dict)."""
    sd = load_torch_checkpoint(path)
    params, missing, unused = convert_state_dict(sd, template)
    return params, {"missing": missing, "unused": unused,
                    "n_torch": len(sd)}


# base-FABind modules that are nn.Sequential in torch (children named 0/2):
# egnn.py:40-60 edge/node/coord/att MLPs, model.py:67 distmap_mlp. Everything
# else (Transition_diff_out_dim, all FABind+ MLP classes) uses named
# linear1/linear2 attributes, so those paths export unchanged.
_SEQUENTIAL_PARENTS = ("edge_mlp", "node_mlp", "coord_mlp", "att_mlp",
                       "distmap_mlp")


def export_torch_state_dict(params: Any, is_plus: bool = False
                            ) -> Dict[str, np.ndarray]:
    """Inverse mapping (flax -> torch naming), for round-trip tests and for
    shipping fabind_tpu-trained weights back to the torch reference. For base
    checkpoints (is_plus=False) the Sequential-index renames are inverted
    (linear1/linear2 -> 0/2 under the Sequential MLPs); FABind+ torch MLPs
    use named linear1/linear2 attributes, so is_plus=True leaves them as-is.
    The RBFDistanceModule rename (mlp_0/mlp_3 -> mlp.0/mlp.3) is inverted
    unconditionally, mirroring the import side: those component names exist
    exactly when keep_trig_attn instantiates RBFDistanceModule, for either
    variant."""
    flat = _flatten(params)
    sd = {}
    inv = {"linear1": "0", "linear2": "2"}
    for path, arr in flat:
        arr = np.asarray(arr)
        parts = list(path)
        if not is_plus:
            parts = [inv[c] if c in inv and i > 0
                     and parts[i - 1] in _SEQUENTIAL_PARENTS else c
                     for i, c in enumerate(parts)]
        parts = [c2 for c in parts
                 for c2 in (("mlp", c[4:]) if c in ("mlp_0", "mlp_3")
                            else (c,))]
        if parts[-1] == "linear_kv_kernel":
            sd[".".join(parts[:-1] + ["linear_kv", "weight"])] = arr.T
            continue
        if parts[-1] == "linear_kv_bias":
            sd[".".join(parts[:-1] + ["linear_kv", "bias"])] = arr
            continue
        leaf = parts[-1]
        if leaf == "kernel":
            sd[".".join(parts[:-1] + ["weight"])] = arr.T if arr.ndim == 2 else arr
        elif leaf == "scale":
            sd[".".join(parts[:-1] + ["weight"])] = arr
        elif leaf == "bias":
            sd[".".join(parts)] = arr
        else:
            sd[".".join(parts)] = arr
    return sd


def _flatten(tree, prefix=()):
    items = []
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            items.extend(_flatten(v, prefix + (str(k),)))
    else:
        items.append((prefix, tree))
    return items


def _unflatten(flat: Dict[Tuple[str, ...], Any]):
    root: Dict[str, Any] = {}
    for path, val in flat.items():
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = val
    return root
