"""TPU-native ESM2 encoder (flax) + torch-checkpoint converter.

The reference pipeline embeds every protein with fair-esm ESM2-t33-650M on
GPU/CPU torch (tools/generate_esm2_t33.py:20-53,
utils/inference_pdb_utils.py:61-89). This is the same architecture
implemented for TPU: rotary self-attention encoder, ESM's exact erf-GELU,
query-side scaling *before* rotary, fp32 softmax, token-dropout embedding
rescale (the constant 0.88 factor at inference), and the trailing encoder
LayerNorm. Weights convert mechanically from any HuggingFace/fair-esm ESM2
torch state_dict via `convert_esm_state_dict`; parity is golden-tested
against the torch module in tests/test_esm2.py.

Behavioral reference: the public ESM2 architecture as shipped in
transformers' modeling_esm.py (independent flax implementation).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

# fair-esm alphabet, the token order all released ESM2 checkpoints use
ESM_VOCAB: List[str] = [
    "<cls>", "<pad>", "<eos>", "<unk>",
    "L", "A", "G", "V", "S", "E", "R", "T", "I", "D", "P", "K", "Q", "N",
    "F", "Y", "M", "H", "W", "C", "X", "B", "U", "Z", "O", ".", "-",
    "<null_1>", "<mask>",
]
ESM_TOKEN_TO_ID = {t: i for i, t in enumerate(ESM_VOCAB)}
CLS_ID, PAD_ID, EOS_ID, UNK_ID, MASK_ID = 0, 1, 2, 3, 32


def tokenize(seq: str, pad_to: Optional[int] = None) -> np.ndarray:
    """<cls> + residues + <eos> (+ <pad>...), fair-esm token ids."""
    ids = ([CLS_ID] + [ESM_TOKEN_TO_ID.get(a, UNK_ID) for a in seq]
           + [EOS_ID])
    if pad_to is not None:
        assert len(ids) <= pad_to, (len(ids), pad_to)
        ids = ids + [PAD_ID] * (pad_to - len(ids))
    return np.asarray(ids, np.int32)


@dataclasses.dataclass(frozen=True)
class Esm2Config:
    """Defaults = esm2_t33_650M_UR50D."""

    vocab_size: int = 33
    hidden_size: int = 1280
    num_layers: int = 33
    num_heads: int = 20
    intermediate_size: int = 5120
    layer_norm_eps: float = 1e-5
    token_dropout: bool = True
    mask_ratio_train: float = 0.15 * 0.8


def _gelu_erf(x: Array) -> Array:
    # ESM's original gelu (erf form; tanh-approx gelu is subtly different)
    return x * 0.5 * (1.0 + jax.lax.erf(x / np.sqrt(2.0).astype(x.dtype)))


def _rotary_tables(L: int, dim: int, dtype) -> Tuple[Array, Array]:
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2, np.float32) / dim))
    t = np.arange(L, dtype=np.float32)
    freqs = np.outer(t, inv_freq)                     # [L, dim/2]
    emb = np.concatenate([freqs, freqs], axis=-1)     # [L, dim]
    return jnp.asarray(np.cos(emb), dtype), jnp.asarray(np.sin(emb), dtype)


def _apply_rotary(x: Array, cos: Array, sin: Array) -> Array:
    # x: [B, H, L, D]; cos/sin: [L, D]
    d = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)
    return x * cos[None, None] + rot * sin[None, None]


class Esm2Layer(nn.Module):
    cfg: Esm2Config

    @nn.compact
    def __call__(self, h: Array, bias: Array) -> Array:
        cfg = self.cfg
        H, D = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        B, L, _ = h.shape

        # ---- self attention (pre-LN block) ----
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False, name="attn_ln")(h)
        q = nn.Dense(H * D, name="query")(x).reshape(B, L, H, D)
        k = nn.Dense(H * D, name="key")(x).reshape(B, L, H, D)
        v = nn.Dense(H * D, name="value")(x).reshape(B, L, H, D)
        q = jnp.moveaxis(q, 2, 1) * (D ** -0.5)  # scale BEFORE rotary (ESM)
        k = jnp.moveaxis(k, 2, 1)
        v = jnp.moveaxis(v, 2, 1)                # [B, H, L, D]
        cos, sin = _rotary_tables(L, D, h.dtype)
        q = _apply_rotary(q, cos, sin)
        k = _apply_rotary(k, cos, sin)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) + bias
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(h.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        o = jnp.moveaxis(o, 1, 2).reshape(B, L, H * D)
        h = h + nn.Dense(cfg.hidden_size, name="attn_out")(o)

        # ---- feed forward (pre-LN block) ----
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False, name="ffn_ln")(h)
        x = _gelu_erf(nn.Dense(cfg.intermediate_size, name="intermediate")(x))
        h = h + nn.Dense(cfg.hidden_size, name="ffn_out")(x)
        return h


class Esm2Model(nn.Module):
    """Encoder returning the final-layer hidden states [B, L, hidden]."""

    cfg: Esm2Config = Esm2Config()

    @nn.compact
    def __call__(self, input_ids: Array, attention_mask: Array) -> Array:
        cfg = self.cfg
        emb = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       name="word_embeddings")(input_ids)
        if cfg.token_dropout:
            is_mask = input_ids == MASK_ID
            emb = jnp.where(is_mask[..., None], 0.0, emb)
            src_len = jnp.sum(attention_mask, axis=-1)
            observed = jnp.sum(is_mask, axis=-1).astype(emb.dtype) / src_len
            emb = emb * ((1.0 - cfg.mask_ratio_train)
                         / (1.0 - observed))[:, None, None]
        emb = emb * attention_mask[..., None].astype(emb.dtype)

        bias = (1.0 - attention_mask[:, None, None, :].astype(emb.dtype)) * -1e9
        h = emb
        for i in range(cfg.num_layers):
            h = Esm2Layer(cfg, name=f"layer_{i}")(h, bias)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_fast_variance=False,
                         name="emb_layer_norm_after")(h)
        return h


# ------------------------------------------------------------- conversion

def convert_esm_state_dict(torch_sd: Dict, params) -> Tuple[Dict, list]:
    """Map a torch EsmModel state_dict onto the flax Esm2Model tree.

    Accepts both the bare `EsmModel` naming (embeddings.*, encoder.*) and the
    `esm.`-prefixed naming of task heads. Returns (params, unused_keys);
    pooler/contact-head/buffer entries are expected leftovers."""
    import numpy as _np

    flat = {}
    for k, v in torch_sd.items():
        flat[k[4:] if k.startswith("esm.") else k] = _np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    out = jax.device_get(out)
    used = set()

    def put(path, val):
        node = out
        for p in path[:-1]:
            node = node[p]
        assert node[path[-1]].shape == val.shape, \
            (path, node[path[-1]].shape, val.shape)
        node[path[-1]] = val

    def dense(tname, fpath):
        put(fpath + ["kernel"], flat[tname + ".weight"].T)
        used.add(tname + ".weight")
        if tname + ".bias" in flat:
            put(fpath + ["bias"], flat[tname + ".bias"])
            used.add(tname + ".bias")

    def ln(tname, fpath):
        put(fpath + ["scale"], flat[tname + ".weight"])
        put(fpath + ["bias"], flat[tname + ".bias"])
        used.update({tname + ".weight", tname + ".bias"})

    put(["word_embeddings", "embedding"],
        flat["embeddings.word_embeddings.weight"])
    used.add("embeddings.word_embeddings.weight")
    n_layers = len(out) - 2  # word_embeddings + emb_layer_norm_after
    for i in range(n_layers):
        t = f"encoder.layer.{i}"
        f = [f"layer_{i}"]
        ln(f"{t}.attention.LayerNorm", f + ["attn_ln"])
        dense(f"{t}.attention.self.query", f + ["query"])
        dense(f"{t}.attention.self.key", f + ["key"])
        dense(f"{t}.attention.self.value", f + ["value"])
        dense(f"{t}.attention.output.dense", f + ["attn_out"])
        ln(f"{t}.LayerNorm", f + ["ffn_ln"])
        dense(f"{t}.intermediate.dense", f + ["intermediate"])
        dense(f"{t}.output.dense", f + ["ffn_out"])
    ln("encoder.emb_layer_norm_after", ["emb_layer_norm_after"])

    unused = [k for k in flat if k not in used]
    return out, unused


def esm2_from_torch(torch_model, cfg: Optional[Esm2Config] = None):
    """(flax model, params) from a torch EsmModel/EsmForMaskedLM instance."""
    tc = torch_model.config
    cfg = cfg or Esm2Config(
        vocab_size=tc.vocab_size, hidden_size=tc.hidden_size,
        num_layers=tc.num_hidden_layers, num_heads=tc.num_attention_heads,
        intermediate_size=tc.intermediate_size,
        layer_norm_eps=tc.layer_norm_eps, token_dropout=tc.token_dropout)
    model = Esm2Model(cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    mask = jnp.ones((1, 4), jnp.int32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), ids, mask))["params"]
    params = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), params)
    params, unused = convert_esm_state_dict(torch_model.state_dict(), params)
    return model, params


@functools.partial(jax.jit, static_argnames=("model",))
def _esm_forward(model: "Esm2Model", params, ids, mask):
    return model.apply({"params": params}, ids, mask)


_DEVICE_PARAMS: dict = {}


def embed_sequences(model: Esm2Model, params, seqs: List[str],
                    pad_multiple: int = 128,
                    dtype=jnp.float32,
                    batch_size: int = 1,
                    mesh=None) -> List[np.ndarray]:
    """Batch-embed sequences on the available accelerator; returns per-seq
    [len, hidden] arrays with <cls>/<eos> stripped (generate_esm2_t33.py:
    40-46 takes representations[1:len+1]). Sequences are bucketed to
    pad_multiple lengths so jit re-specializes once per bucket.

    batch_size sequences per device run in one forward (exact: padded rows
    are excluded by the attention mask, so batching never changes a
    sequence's embedding beyond reduction-order noise); the tail of a bucket
    is padded by repeating its last row — one executable per bucket length.
    mesh (an optional jax.sharding.Mesh) additionally shards the batch's
    leading axis over the mesh (dp over ICI, params replicated): the
    offline embedding pass — the heaviest compute in preprocessing, a 650M
    encoder over every protein — scales across chips with no code change
    at the call site. Rows per forward = batch_size * mesh.size.

    The jitted forward is module-level (flax modules hash structurally, so
    every call with the same config shares executables) and the converted
    ~2.6GB param tree is cast + device_put once per (id(params), dtype,
    mesh) — a per-call cast/upload used to cost more than the forward
    itself."""
    # keyed by identity; the cached entry keeps a strong reference to the
    # source tree so its id() cannot be recycled while cached
    key = (id(params), jnp.dtype(dtype).name, id(mesh) if mesh else None)
    if key not in _DEVICE_PARAMS:
        _DEVICE_PARAMS.clear()   # hold at most one resident tree
        cast = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype)
            if jnp.asarray(x).dtype == jnp.float32 else jnp.asarray(x),
            params)
        if mesh is not None:
            from fabind_tpu.parallel.mesh import replicate
            cast = replicate(cast, mesh)
        _DEVICE_PARAMS[key] = (params, mesh, cast)
    dparams = _DEVICE_PARAMS[key][-1]
    run = functools.partial(_esm_forward, model)

    sharding = None
    rows = batch_size
    if mesh is not None:
        from fabind_tpu.parallel.mesh import batch_sharding
        sharding = batch_sharding(mesh)
        rows = batch_size * mesh.size

    # bucket by padded length; results land back at original positions
    buckets: dict = {}
    for i, seq in enumerate(seqs):
        pad = -(-(len(seq) + 2) // pad_multiple) * pad_multiple
        buckets.setdefault(pad, []).append(i)

    out: List = [None] * len(seqs)
    for pad in sorted(buckets):
        idxs = buckets[pad]
        for c0 in range(0, len(idxs), rows):
            chunk = idxs[c0:c0 + rows]
            ids = np.stack([tokenize(seqs[i], pad_to=pad) for i in chunk])
            if len(chunk) < rows:
                # repeat the last row so every chunk hits one executable
                ids = np.concatenate(
                    [ids, np.repeat(ids[-1:], rows - len(chunk), 0)], 0)
            mask = (ids != PAD_ID).astype(np.int32)
            ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)
            if sharding is not None:
                ids_j = jax.device_put(ids_j, sharding)
                mask_j = jax.device_put(mask_j, sharding)
            h = np.asarray(run(dparams, ids_j, mask_j), np.float32)
            for row, i in enumerate(chunk):
                out[i] = h[row, 1:len(seqs[i]) + 1]
    return out
