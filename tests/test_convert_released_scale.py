"""Converter plumbing exercised at RELEASED scale with synthetic state dicts
(round-4 verdict item 5).

The value-level goldens (tests/test_golden_flagship.py, tests/test_esm2.py)
convert REAL reference state dicts, but the ESM2 one only at a small random
config (the 650M weights are not downloadable here). These tests generate
state dicts with the released checkpoints' exact NAMES and SHAPES — random
values — and drive the full conversion path end-to-end, so the first
contact with real released weights can only fail on values, never on
plumbing:

- esm2_t33_650M_UR50D-shaped HF `EsmModel` state dict (33 layers, hidden
  1280, heads 20, intermediate 5120; tools/generate_esm2_t33.py:20-53)
  through `convert_esm_state_dict`: every flax leaf filled from the torch
  side, buffers/heads land in `unused`.
- released-width fabind / fabind_plus param trees through
  `export_torch_state_dict` -> torch.save(.bin) -> `checkpoints.load_params`
  (the auto-convert route users hit with ckpt/best_model.bin,
  FABind/README.md:69): zero missing, zero unused, bit-identical
  round-trip on every leaf.
"""
from __future__ import annotations

import os

import numpy as np
import pytest


def test_esm2_650m_shaped_state_dict_converts_fully():
    import jax

    from fabind_tpu.models.esm2 import Esm2Config, Esm2Model, \
        convert_esm_state_dict

    cfg = Esm2Config()          # defaults ARE esm2_t33_650M_UR50D
    assert (cfg.num_layers, cfg.hidden_size, cfg.intermediate_size) == \
        (33, 1280, 5120)
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    rng = np.random.RandomState(0)

    def t(*shape):
        # small + cheap: low-entropy random so allocation dominates, but
        # every tensor is distinct from the zero template
        return (rng.standard_normal(shape) * 0.02 + 0.01).astype(np.float32)

    sd = {"embeddings.word_embeddings.weight": t(V, H),
          # buffer present in HF checkpoints; must be reported, not placed
          "embeddings.position_ids": np.arange(1026)[None].astype(np.int64)}
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"
        for name, shape in [
                ("attention.self.query", (H, H)),
                ("attention.self.key", (H, H)),
                ("attention.self.value", (H, H)),
                ("attention.output.dense", (H, H)),
                ("intermediate.dense", (I, H)),
                ("output.dense", (H, I))]:
            sd[f"{p}.{name}.weight"] = t(*shape)
            sd[f"{p}.{name}.bias"] = t(shape[0])
        for name in ("attention.LayerNorm", "LayerNorm"):
            sd[f"{p}.{name}.weight"] = t(H)
            sd[f"{p}.{name}.bias"] = t(H)
        sd[f"{p}.attention.self.rotary_embeddings.inv_freq"] = t(32)
    sd["encoder.emb_layer_norm_after.weight"] = t(H)
    sd["encoder.emb_layer_norm_after.bias"] = t(H)
    # task-model leftovers the converter must skip
    sd["pooler.dense.weight"] = t(H, H)
    sd["pooler.dense.bias"] = t(H)
    sd["contact_head.regression.weight"] = t(1, 660)
    sd["contact_head.regression.bias"] = t(1)

    model = Esm2Model(cfg)
    import jax.numpy as jnp
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4), jnp.int32),
                           jnp.ones((1, 4), jnp.int32)))["params"]
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)

    params, unused = convert_esm_state_dict(sd, template)

    # every expected leftover, and ONLY those, is unused
    assert set(unused) == {k for k in sd
                           if "position_ids" in k or "inv_freq" in k
                           or k.startswith(("pooler.", "contact_head."))}
    # every flax leaf was written (zero template -> nonzero everywhere)
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert len(flat) == 2 + 1 + 16 * cfg.num_layers  # final LN + emb + layers
    for path, leaf in flat:
        assert np.abs(leaf).max() > 0, jax.tree_util.keystr(path)
    # spot-check value + transpose orientation on a middle layer
    np.testing.assert_array_equal(
        params["layer_16"]["intermediate"]["kernel"],
        sd["encoder.layer.16.intermediate.dense.weight"].T)
    np.testing.assert_array_equal(
        params["layer_16"]["attn_ln"]["scale"],
        sd["encoder.layer.16.attention.LayerNorm.weight"])


@pytest.mark.parametrize("name,is_plus", [("fabind", False),
                                          ("fabind_plus_sampling", True)])
def test_released_width_bin_roundtrip(tmp_path, name, is_plus):
    """export -> .bin -> load_params at the RELEASED widths: the inverse
    naming maps onto exactly the keys convert_state_dict expects (zero
    missing flax leaves, zero unused torch keys) and every value survives
    bit-identically — the full path a user's fabind_plus_best_ckpt.bin
    takes (train/checkpoints.py:load_params auto-convert)."""
    import jax
    import jax.numpy as jnp
    import torch

    from fabind_tpu.config import preset
    from fabind_tpu.data.types import dummy_batch
    from fabind_tpu.models.fabind import make_model
    from fabind_tpu.train import checkpoints
    from fabind_tpu.train.convert import export_torch_state_dict

    cfg = preset(name)
    model = make_model(cfg)
    k = jax.random.PRNGKey(0)
    tmpl_batch = dummy_batch(cfg.shapes, batch_size=1,
                             feat_dim=cfg.model.compound_feat_dim,
                             prot_feat_dim=cfg.model.protein_feat_dim)
    shapes = jax.eval_shape(lambda: model.init(
        {"params": k, "dropout": k, "sample": k}, tmpl_batch, train=False,
        stage=2))["params"]
    rng = np.random.RandomState(1)
    params = jax.tree_util.tree_map(
        lambda s: (rng.standard_normal(s.shape) * 0.02 + 0.01
                   ).astype(s.dtype), shapes)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    assert n_params > 10_000_000  # released width, not a toy

    sd = {k2: torch.tensor(v)
          for k2, v in export_torch_state_dict(params, is_plus=is_plus
                                               ).items()}
    path = os.path.join(tmp_path, "released.bin")
    torch.save(sd, path)

    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)
    loaded, report = checkpoints.load_params(path, template, verbose=False)
    assert report["missing"] == [], report["missing"][:8]
    assert report["unused"] == [], report["unused"][:8]
    assert report["n_torch"] == len(sd)
    jax.tree_util.tree_map(np.testing.assert_array_equal, params, loaded)
