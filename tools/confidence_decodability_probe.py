"""Negative control for the confidence probe: is within-complex pose
quality present AT ALL in the confidence head's input at probe scale?

The FABind+ confidence head scores a pose from the sum-pooled complex
embedding (reference FABind_plus/fabind/models/model.py:393-399). On the
overfit probe backbone the only within-complex pose diversity is dropout
jitter, so this probe measures the ceiling any head could reach: draw many
dropout copies per training complex, capture the head's exact input (the
complex_model output h_out, pooled), and ridge-decode RMSD from it with
per-complex centering and held-out copies. Holdout Spearman ~0 means the
within-complex ranking signal is absent from the input — head training
cannot manufacture it — while the cross-complex (absolute-quality) signal
the reference's global ranking loss trains on remains learnable.

Measured (seed 0, hidden 32, dropout 0.3, 64 copies x 5 complexes):
holdout Spearman mean ~0.03 (per complex: 0.07/0.02/-0.12/0.25/-0.07);
hidden 64 with a 900-epoch backbone reaches only ~0.13. This is why
tools/confidence_strength_probe.py asserts the reference's GLOBAL
ranking_accuracy (which learns 0.5 -> ~0.7) and best-of-N aggregate, but
documents hit_rate at chance as a probe-scale property.

Usage: python tools/confidence_decodability_probe.py [--root DIR]
  --root: reuse a tools/confidence_strength_probe.py tmp dir (expects
  pdbbind_plus/ + reg/ckpt inside); otherwise builds a fresh one (~5 min).
One JSON line out.
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
jax.config.update("jax_platforms", os.environ.get("FABIND_PROBE_PLATFORM",
                                                  "cpu"))

import numpy as np

from confidence_strength_probe import KV, make_overfit_backbone


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra * ra).sum() * (rb * rb).sum()))


def main(root=None, dropout=0.3, copies=64):
    import jax.numpy as jnp

    from fabind_tpu.config import preset
    from fabind_tpu.data.dataset import Loader, PDBBindLMDBSource
    from fabind_tpu.data.types import dummy_batch
    from fabind_tpu.models.fabind import make_model
    from fabind_tpu.train import checkpoints

    if root is None:
        root = tempfile.mkdtemp(prefix="fabind_conf_decode_")
        make_overfit_backbone(root)
    data = os.path.join(root, "pdbbind_plus")
    ckpt = os.path.join(root, "reg", "ckpt")

    cfg = preset("fabind_plus", confidence_training=True, batch_size=4,
                 dropout=dropout, **KV)
    model = make_model(cfg)
    key = jax.random.PRNGKey(0)
    first = jax.jit(lambda: dummy_batch(
        cfg.shapes, batch_size=4,
        prot_feat_dim=cfg.model.protein_feat_dim))()
    tmpl = jax.jit(lambda: model.init(
        {"params": key, "dropout": key, "sample": key}, first,
        train=True))()["params"]
    params, _ = checkpoints.load_params(ckpt, tmpl, verbose=False)

    H = KV["hidden_size"]
    # capture the docking trunk's h_out — the exact tensor the head pools
    filt = lambda mdl, _: mdl.name == "complex_model"

    def one_copy(params, batch, k):
        dk, sk = jax.random.split(k)
        out, inter = model.apply({"params": params}, batch, train=True,
                                 rngs={"dropout": dk, "sample": sk},
                                 capture_intermediates=filt)
        flat = jax.tree_util.tree_leaves(inter)
        h_out = [x for x in flat if x.ndim == 3 and x.shape[-1] == H][0]
        return out.coords, h_out

    @jax.jit
    def draw(params, batch, key):
        ks = jax.random.split(key, copies)
        return jax.lax.map(lambda k: one_copy(params, batch, k), ks)

    src = PDBBindLMDBSource(data)
    idx = src.splits("fabind_plus")["train"]
    loader = Loader(src, idx, cfg, group="train", seed=0)

    E, R, CIDX = [], [], []
    cid = 0
    for batch in loader.epoch(0):
        coords, h_out = draw(params, batch, jax.random.PRNGKey(7))
        # masked nodes carry zero embeddings upstream, so a plain axis sum
        # equals the head's masked sum-pool
        pooled = np.asarray(h_out).sum(axis=2)          # [C, B, H]
        gt = np.asarray(batch.lig_coords)
        lm = np.asarray(batch.lig_mask)
        sv = (np.asarray(batch.sample_valid).astype(bool)
              if batch.sample_valid is not None
              else np.ones(gt.shape[0], bool))
        coords = np.asarray(coords)
        for b in range(gt.shape[0]):
            if not sv[b]:
                continue
            n = int(lm[b].sum())
            r = np.sqrt(((coords[:, b, :n] - gt[b, :n]) ** 2)
                        .sum(-1).mean(-1))
            E.append(pooled[:, b])
            R.append(r)
            CIDX.append(np.full(copies, cid))
            cid += 1

    E = np.concatenate(E)
    R = np.concatenate(R)
    CIDX = np.concatenate(CIDX)

    # per-complex centering removes the (strong, learnable) cross-complex
    # component; what remains is exactly the within-complex signal
    Ec, Rc = E.copy(), R.copy()
    for c in np.unique(CIDX):
        m = CIDX == c
        Ec[m] -= Ec[m].mean(0)
        Rc[m] -= Rc[m].mean()
    half = np.arange(len(R)) % copies < copies // 2
    lam = 1e-2 * len(R)
    w = np.linalg.solve(Ec[half].T @ Ec[half] + lam * np.eye(E.shape[1]),
                        Ec[half].T @ Rc[half])
    pred = Ec @ w
    hs = []
    for c in np.unique(CIDX):
        m = (CIDX == c) & (~half)
        hs.append(round(spearman(pred[m], R[m]), 3))
    res = {
        "hidden": H, "dropout": dropout, "copies": copies,
        "complexes": int(cid),
        "rmsd_mean": float(R.mean()),
        "rmsd_std_within": float(np.mean(
            [R[CIDX == c].std() for c in np.unique(CIDX)])),
        "ridge_holdout_spearman": hs,
        "ridge_holdout_spearman_mean": round(float(np.mean(hs)), 3),
    }
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=None)
    p.add_argument("--dropout", type=float, default=0.3)
    p.add_argument("--copies", type=int, default=64)
    a = p.parse_args()
    main(a.root, a.dropout, a.copies)
