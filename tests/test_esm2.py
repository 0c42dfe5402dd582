"""Golden parity: flax Esm2Model vs the real torch EsmModel (rotary,
token-dropout, erf-gelu), through convert_esm_state_dict."""
from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from fabind_tpu.models.esm2 import (ESM_VOCAB, MASK_ID, PAD_ID,
                                    convert_esm_state_dict, embed_sequences,
                                    esm2_from_torch, tokenize)


def _torch_esm(hidden=32, layers=2, heads=4, inter=64):
    from transformers import EsmConfig, EsmModel
    cfg = EsmConfig(
        vocab_size=33, mask_token_id=32, pad_token_id=1,
        hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=inter,
        position_embedding_type="rotary", token_dropout=True,
        emb_layer_norm_before=False, layer_norm_eps=1e-5,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        attn_implementation="eager")
    torch.manual_seed(0)
    m = EsmModel(cfg, add_pooling_layer=False)
    # HF init uses std=0.02 everywhere, leaving the residual stream at ~0.02
    # scale — the final LayerNorm then amplifies platform matmul noise ~50x.
    # Real checkpoints have O(1) streams; recreate that conditioning.
    with torch.no_grad():
        m.embeddings.word_embeddings.weight.normal_(0, 1.0)
    m.eval()
    return m


def test_golden_esm2_vs_torch():
    """Padded flax batch vs torch per-sequence UNPADDED forwards.

    Two deliberate choices: (1) float64 on both sides — with HF's std-0.02
    init the residual stream is ~0.02-scale and every LayerNorm amplifies
    platform matmul noise ~50x, so fp32 can't separate real bugs from
    accumulation order; (2) the torch oracle runs each sequence unpadded
    because this transformers version's EsmModel.forward computes the
    embeddings WITHOUT the attention mask, making its token-dropout rescale
    use the padded length — the reference pipeline is fair-esm, which embeds
    per sequence with true lengths (generate_esm2_t33.py:33-46), i.e. the
    unpadded semantics this flax model reproduces under padding. This also
    pins padding invariance of the flax batch path."""
    tm = _torch_esm().double()
    fm, params = esm2_from_torch(tm)
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float64), params)

    # two sequences, ragged -> padded, one with a <mask> token
    ids = np.full((2, 12), PAD_ID, np.int64)
    ids[0, :12] = tokenize("LAGVSERTIL")          # full row
    ids[1, :8] = tokenize("KQNFAM")               # padded row
    ids[1, 3] = MASK_ID                           # exercise token dropout
    mask = (ids != PAD_ID).astype(np.int64)

    refs = []
    with torch.no_grad():
        for b in range(2):
            n = int(mask[b].sum())
            row = torch.tensor(ids[b:b + 1, :n])
            refs.append(tm(input_ids=row,
                           attention_mask=torch.ones_like(row)
                           ).last_hidden_state[0].numpy())

    jax.config.update("jax_enable_x64", True)
    try:
        got = np.asarray(fm.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)))
    finally:
        jax.config.update("jax_enable_x64", False)

    # compare valid positions only (padded positions are don't-care)
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(got[b, :n], refs[b], atol=1e-6,
                                   err_msg=f"row {b}")


def test_esm2_converter_accounts_for_all_encoder_weights():
    tm = _torch_esm()
    fm, params = esm2_from_torch(tm)
    _, unused = convert_esm_state_dict(tm.state_dict(), params)
    for k in unused:
        assert ("pooler" in k or "contact_head" in k or "inv_freq" in k
                or "position_ids" in k or "position_embeddings" in k), k


def test_embed_sequences_strips_cls_eos():
    tm = _torch_esm()
    fm, params = esm2_from_torch(tm)
    seqs = ["LAGVSE", "KQNFAMWYHD"]
    outs = embed_sequences(fm, params, seqs, pad_multiple=8)
    assert [o.shape for o in outs] == [(6, 32), (10, 32)]

    with torch.no_grad():
        ids = torch.tensor(tokenize(seqs[0])[None].astype(np.int64))
        ref = tm(input_ids=ids,
                 attention_mask=torch.ones_like(ids)).last_hidden_state
    np.testing.assert_allclose(outs[0], ref[0, 1:-1].numpy(), atol=2e-5)


def test_tokenizer_matches_hf_vocab_order():
    """The hard-coded fair-esm alphabet must match the tokenizer the
    checkpoints were trained with (spot-checked against the published ESM2
    vocab: cls=0, pad=1, eos=2, unk=3, L=4, mask=32)."""
    assert ESM_VOCAB.index("<cls>") == 0
    assert ESM_VOCAB.index("<pad>") == 1
    assert ESM_VOCAB.index("<eos>") == 2
    assert ESM_VOCAB.index("L") == 4
    assert ESM_VOCAB.index("A") == 5
    assert ESM_VOCAB.index("<mask>") == 32
    ids = tokenize("LA")
    np.testing.assert_array_equal(ids, [0, 4, 5, 2])


def test_embed_sequences_batched_matches_single():
    """Batching is exact: padded rows are masked out of attention and
    token-dropout rescale, so batch_size>1 (with a repeated-tail chunk)
    reproduces the per-sequence path."""
    tm = _torch_esm()
    fm, params = esm2_from_torch(tm)
    seqs = ["LAGVSE", "KQNFAMWYHD", "AC", "GG", "MKV", "WYHDKQ", "A"]
    ref = embed_sequences(fm, params, seqs, pad_multiple=8)
    out = embed_sequences(fm, params, seqs, pad_multiple=8, batch_size=4)
    assert [o.shape for o in out] == [r.shape for r in ref]
    for r, o in zip(ref, out):
        np.testing.assert_allclose(r, o, atol=1e-5)


def test_preprocess_esm_lmdb_mode_jax(tmp_path, monkeypatch):
    """End-to-end `preprocess esm --lmdb` on the jax device: reads
    protein_1d_3d.lmdb, embeds batched (batch=2, dp=2) through the flax
    encoder, and writes esm2_t33_650M_UR50D.lmdb matching the
    per-sequence path exactly."""
    import pickle

    import torch

    import fabind_tpu.data.featurize as fz
    from fabind_tpu.cli import preprocess as pp
    from fabind_tpu.data.kv import open_kv

    tm = _torch_esm()
    fm, params = esm2_from_torch(tm)
    monkeypatch.setitem(
        fz._ESM_CACHE, ("facebook/esm2_t33_650M_UR50D", "jax"), (fm, params))

    p = tmp_path / "dataset" / "processed"
    p.mkdir(parents=True)
    rng = np.random.default_rng(0)
    codes = np.array(sorted(pp._NUM_TO_LETTER))
    seqs = {}
    src = open_kv(str(p / "protein_1d_3d.lmdb"), readonly=False,
                  map_size=1 << 24)
    with src.begin(write=True) as txn:
        for i, L in enumerate([7, 13, 5, 13, 9]):
            ids = codes[rng.integers(0, len(codes), L)]
            seqs[f"p{i}"] = "".join(pp._NUM_TO_LETTER[c] for c in ids)
            txn.put(f"p{i}".encode(),
                    pickle.dumps((torch.zeros(L, 3), torch.from_numpy(ids))))
    src.close()

    pp.main(["esm", "--lmdb", str(tmp_path), "--esm-device", "jax",
             "--esm-batch", "2", "--esm-dp", "2"])

    out = open_kv(str(p / "esm2_t33_650M_UR50D.lmdb"), readonly=True)
    with out.begin(write=False) as txn:
        got = {k.decode(): pickle.loads(v) for k, v in txn.cursor()}
    out.close()
    assert sorted(got) == sorted(seqs)
    for k, s in seqs.items():
        ref = embed_sequences(fm, params, [s])[0]
        assert got[k].shape == ref.shape
        np.testing.assert_allclose(got[k], ref, atol=2e-5)


def test_embed_sequences_mesh_dp():
    """dp-sharded offline embedding over the 8-virtual-device mesh matches
    single-device output (the preprocess --esm-dp path)."""
    from fabind_tpu.parallel.mesh import make_mesh
    tm = _torch_esm()
    fm, params = esm2_from_torch(tm)
    seqs = ["LAGVSE", "KQNFAMWYHD", "AC", "GG", "MKV"]
    ref = embed_sequences(fm, params, seqs, pad_multiple=8)
    mesh = make_mesh(8)
    out = embed_sequences(fm, params, seqs, pad_multiple=8, batch_size=1,
                          mesh=mesh)
    assert [o.shape for o in out] == [r.shape for r in ref]
    for r, o in zip(ref, out):
        np.testing.assert_allclose(r, o, atol=1e-5)
