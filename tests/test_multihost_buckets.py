"""Multi-host dp + shape buckets: the globally-deterministic schedule
(round-3 verdict item 6).

Round 3 degraded `--buckets auto` to ONE bucket under multi-host dp
(per-host batch counts were data-dependent and could desync the collective
step). Round 4 replaces that with `Loader._epoch_global_schedule`: every
host derives the SAME (bucket, global-batch) sequence from the shared
index/seed + a static (noise-free) routing table, then emits only its own
stride of each global batch — count-stability across hosts holds by
construction, and the 2.6x bucket win (DESIGN.md) survives at scale.
Reference contract replaced: DDP DistributedSampler sharding (SURVEY §2.3).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from fabind_tpu.config import preset
from fabind_tpu.data.dataset import Loader
from test_data import make_raw


def _cfg(batch_size=2):
    return preset("fabind", max_ligand=24, max_pocket=32, max_protein=64,
                  ctx_k=8, ctx_k_whole=8, batch_size=batch_size)


def _buckets(cfg):
    small = dataclasses.replace(cfg.shapes, max_ligand=8, max_pocket=32,
                                max_protein=32)
    return [small, cfg.shapes]


class MixedSrc:
    """12 samples: 7 small (6 atoms / 25 res), 5 large (16 atoms / 50 res)."""

    def __init__(self):
        self.samples = [
            make_raw(n=(6 if i % 2 == 0 or i >= 10 else 16),
                     nr=(25 if i % 2 == 0 or i >= 10 else 50), seed=i)
            for i in range(12)]

    def get(self, idx):
        return dict(self.samples[idx], pdb=f"x{idx}")


def _host_batches(src, cfg, pi, pc, epoch=2, workers=0, skip=0):
    ld = Loader(src, range(len(src.samples)), cfg, group="train", seed=5,
                buckets=_buckets(cfg), host_shard=(pi, pc), workers=workers)
    return list(ld.epoch(epoch, with_meta=True, skip_batches=skip)), ld


def test_schedule_identical_across_hosts():
    cfg = _cfg()
    pc = 4
    per_host = []
    for pi in range(pc):
        batches, _ = _host_batches(MixedSrc(), cfg, pi, pc)
        per_host.append(batches)
    # SAME schedule on every host: batch count, bucket sequence, n_valid
    counts = [len(b) for b in per_host]
    assert len(set(counts)) == 1 and counts[0] > 1, counts
    for step in range(counts[0]):
        dims = {(m["cfg"].shapes.max_ligand, m["cfg"].shapes.max_protein)
                for _, m in (h[step] for h in per_host)}
        assert len(dims) == 1, f"bucket desync at step {step}: {dims}"
        nvs = [h[step][1]["n_valid"] for h in per_host]
        # per-host batch rows are always full (batch_size each)
        assert all(h[step][0].lig_feat.shape[0] == cfg.train.batch_size
                   for h in per_host)
        assert sum(nvs) <= cfg.train.batch_size * pc
    # both buckets actually exercised (the point of the feature)
    all_dims = {(m["cfg"].shapes.max_ligand, m["cfg"].shapes.max_protein)
                for _, m in per_host[0]}
    assert len(all_dims) == 2, all_dims
    # every sample served exactly once across hosts (real rows only)
    seen = [p for h in per_host for _, m in h for p in m["pdb"]]
    assert sorted(seen) == sorted(f"x{i}" for i in range(12)), seen


def test_small_samples_route_small_bucket():
    cfg = _cfg()
    batches, _ = _host_batches(MixedSrc(), cfg, 0, 2)
    for batch, meta in batches:
        small = meta["cfg"].shapes.max_ligand == 8
        for p in meta["pdb"]:
            i = int(p[1:])
            is_small = i % 2 == 0 or i >= 10
            assert is_small == small, (p, meta["cfg"].shapes)


def test_oversize_dropped_identically_on_all_hosts():
    cfg = _cfg()

    class SrcBig(MixedSrc):
        def get(self, idx):
            r = super().get(idx)
            if idx == 3:
                r = dict(r, lig_feats=np.zeros((64, 56), np.float32),
                         lig_coords=np.zeros((64, 3), np.float32),
                         rdkit_coords=np.zeros((64, 3), np.float32),
                         las_mask=np.zeros((64, 64), bool),
                         bond_edges=np.zeros((0, 2), np.int64))
            return r

    counts, seen, dropped = [], [], []
    for pi in range(2):
        batches, ld = _host_batches(SrcBig(), cfg, pi, 2)
        counts.append(len(batches))
        dropped.append(ld.n_dropped)
        seen += [p for _, m in batches for p in m["pdb"]]
    assert counts[0] == counts[1]
    # the oversize sample is dropped GLOBALLY (every host agrees) — no
    # substitution machinery needed on this path
    assert dropped == [1, 1]
    assert "x3" not in seen
    assert sorted(set(seen)) == sorted(f"x{i}" for i in range(12) if i != 3)


def test_resume_and_worker_determinism():
    """skip_batches resumes the exact global sequence, and threaded
    featurization is bit-identical to inline (per-(batch, slot) seeds)."""
    cfg = _cfg()
    full, _ = _host_batches(MixedSrc(), cfg, 1, 2, workers=0)
    tail, _ = _host_batches(MixedSrc(), cfg, 1, 2, workers=0, skip=2)
    threaded, _ = _host_batches(MixedSrc(), cfg, 1, 2, workers=4)
    assert len(tail) == len(full) - 2
    assert len(threaded) == len(full)

    def assert_same(a, b):
        import jax
        (ba, ma), (bb, mb) = a, b
        assert ma["pdb"] == mb["pdb"] and ma["n_valid"] == mb["n_valid"]
        la = jax.tree_util.tree_leaves(ba)
        lb = jax.tree_util.tree_leaves(bb)
        assert len(la) == len(lb)
        for fa, fb in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))

    for a, b in zip(full[2:], tail):
        assert_same(a, b)
    for a, b in zip(full, threaded):
        assert_same(a, b)


def test_single_host_unaffected():
    """host_shard=None keeps the original bucketed path (stream-order
    routing with per-bucket trailing flush)."""
    cfg = _cfg()
    ld = Loader(MixedSrc(), range(12), cfg, group="train", seed=5,
                buckets=_buckets(cfg))
    batches = list(ld.epoch(2, with_meta=True))
    seen = [p for _, m in batches for p in m["pdb"]]
    assert sorted(seen) == sorted(f"x{i}" for i in range(12))
