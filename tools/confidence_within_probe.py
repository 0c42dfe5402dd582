"""WITHIN-protocol confidence learning at a scale where the signal exists
(round-4 verdict item 1).

Round 4 goldened the reference's within-complex ranking protocol bit-tight
(tests/test_golden_confidence.py) and measured why it cannot learn at the
overfit-probe scale: dropout jitter was the only within-complex pose
diversity, and a ridge decode showed the signal absent from the head's
input. This probe runs the protocol where the signal EXISTS:

- a mixed-size store (ligands 8-32 atoms, proteins 80-400 residues,
  density-preserving backbones — shifted centers on a 400-residue protein
  ARE misdocked) with UNSEEN large test complexes;
- a non-overfit backbone: `cli.train` over n_train complexes for a bounded
  epoch budget (disk-cached, tests/cached_train.py);
- GENUINE pose diversity: copies are full stochastic inference passes with
  torsion/orientation-randomized ligand inits + DBSCAN-cluster-sampled
  centers (train/confidence.py pose_source="inference" — the deployment
  distribution of cli.sample / serve.dock_best_of);
- confidence training with ranking_pair_scope="within" — the reference's
  mandatory-bs=1 protocol (train_confidence.py:218,
  training_confidence.py:50-79) — and head-only Adam.

Measured on the UNSEEN test split, against the untrained-head baseline:
  - within-complex ranking_accuracy (chance 0.5) and hit_rate (chance
    1/num_copies), with normal-approx binomial z-scores;
  - best-of-C selection-by-confidence RMSD vs the mean single-pose RMSD
    (win fraction + z-score vs the 0.5 coin flip);
  - the misdocked-pose negative control: on large test proteins, poses
    docked from 8 A-shifted centers must be (a) objectively worse (RMSD)
    and (b) scored lower by the trained head.

Usage: python tools/confidence_within_probe.py [--n-train 96]
       [--backbone-epochs 160] [--conf-epochs 40] [--num-copies 4]
Env: FABIND_PROBE_PLATFORM=cpu|tpu (default cpu — CI uses cpu; the
development runs used the chip).
Emits one JSON line; mirrored by
tests/test_real_data.py::test_confidence_within_protocol_learns.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

# "default" leaves the platform alone (the axon TPU plugin registers its
# own name, so forcing jax_platforms would hide the chip)
_plat = os.environ.get("FABIND_PROBE_PLATFORM", "cpu")
if _plat != "default":
    jax.config.update("jax_platforms", _plat)

import numpy as np

# hidden 64: the head decodes pose quality from the sum-pooled complex
# embedding; 32 was measured borderline on the strength probe, and the
# mixed-size store's signal (center/torsion-driven RMSD spread) deserves a
# non-lossy pool. Protein cap (default 408) covers the store's tail;
# `shape_sets(max_res)` shrinks both for the CPU/CI variant.


def shape_sets(max_res: int = 400):
    cap = int(-(-(max_res + 8) // 8) * 8)
    return ["--set", "max_ligand=32", "--set", "max_pocket=64",
            "--set", f"max_protein={cap}", "--set", "ctx_k=12",
            "--set", "ctx_k_whole=12", "--set", "hidden_size=64",
            "--set", "pocket_pred_hidden_size=64",
            "--set", "mean_layers=2", "--set", "n_iter=4"]


def store_sizes(n_train: int, n_test: int, seed: int = 7,
                max_res: int = 400):
    """PDBbind-shaped mixed sizes (cf. tools/perf_e2e_train.py): ligands
    8-32 atoms, proteins 80-`max_res` residues."""
    rng = np.random.RandomState(seed)
    scale = max_res / 400.0
    def draw(n):
        atoms = np.clip((8 + rng.gamma(3.0, 4.0, size=n)).astype(int), 8, 32)
        res = np.clip((80 + rng.gamma(2.5, 70.0 * scale, size=n)).astype(int),
                      80, max_res)
        return list(zip(atoms.tolist(), res.tolist()))
    return draw(n_train), draw(n_test)


def backbone_spec(n_train: int, n_test: int, backbone_epochs: int,
                  max_res: int = 400):
    """(tag, fixture_kwargs, train_argv) for the cached backbone run."""
    train_sizes, test_sizes = store_sizes(n_train, n_test, max_res=max_res)

    def argv(root, out):
        return ["--preset", "fabind_plus", "--data", root,
                "--output", out, "--epochs", str(backbone_epochs),
                "--batch-size", "8", "--workers", "0", "--dp", "1",
                "--seed", "0", "--eval-every", "0",
                "--save-every-epochs", str(backbone_epochs),
                "--buckets", "none",
                "--compile-cache", "~/.jax_cache_tests",
                # non-overfit regime: a real lr on a real-size store for a
                # bounded budget (the strength probe's 1e-3 overfits a
                # 5-complex fixture; here 1e-3 over n_train complexes
                # reaches docking-usable, not memorized, quality)
                "--set", "lr=1e-3", "--set", "warmup_epochs=2",
                "--set", f"steps_per_epoch={max(1, n_train // 8)}"
                ] + shape_sets(max_res)

    return (
        f"conf-within-backbone-n{n_train}-e{backbone_epochs}-r{max_res}",
        {"plus": True, "n_train": n_train, "n_valid": 2, "n_test": n_test,
         "train_sizes": train_sizes, "test_sizes": test_sizes,
         # learnable binding-site signature (fixture_pdbbind.synth_complex):
         # with pure-noise ESM the GT site is unpredictable on unseen
         # proteins (measured 9.5 A test docking -> no rankable signal);
         # real ESM encodes pocket identity, so the probe store must too
         "pocket_signal": 1.0}, argv)


def _per_complex_metrics(scores, rmsds, sv):
    """Per valid complex: (ranking_acc, hit, chosen_rmsd, mean_rmsd,
    min_rmsd) over the copy axis. scores/rmsds: [C, B]."""
    out = []
    C = scores.shape[0]
    for b in range(scores.shape[1]):
        if not sv[b]:
            continue
        s, r = scores[:, b], rmsds[:, b]
        order = np.argsort(r, kind="stable")
        ss = s[order]
        correct = sum(float(ss[j] > ss[i])
                      for i in range(C) for j in range(i))
        acc = correct / (C * (C - 1) / 2)
        hit = float(ss[0] > ss[1:].max())
        chosen = float(r[int(np.argmax(s))])
        out.append((acc, hit, chosen, float(r.mean()), float(r.min())))
    return out


def evaluate(model, params, cfg, source, idx, num_copies, seeds,
             misdock_shift=None, min_prot_for_control=224):
    """Within-protocol metrics over the given split x eval seeds.

    misdock_shift: when set (A), runs the negative control instead: copies
    0..C/2-1 dock from the predicted center, C/2.. from an 8 A-shifted one;
    returns per-complex (good_rmsd, bad_rmsd, good_score, bad_score) means
    for complexes with >= min_prot_for_control residues."""
    from fabind_tpu.data.dataset import Loader
    from fabind_tpu.train.confidence import (make_confidence_eval_fn,
                                             randomized_init_copies,
                                             sample_copy_inputs)
    import jax.numpy as jnp

    evalf = make_confidence_eval_fn(model, cfg)
    per, control = [], []
    for seed in seeds:
        host_rng = np.random.RandomState(1000 + seed)
        loader = Loader(source, idx, cfg, group="test", batch_size=8)
        for bi, (batch, meta) in enumerate(loader.epoch(0, with_meta=True)):
            sv = (np.asarray(batch.sample_valid).astype(bool)
                  if batch.sample_valid is not None
                  else np.ones(batch.batch_size, bool))
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(seed), bi), 0)
            if misdock_shift is None:
                inits, centers = sample_copy_inputs(
                    model, params, batch, cfg, num_copies, host_rng)
                scores, rmsds = jax.device_get(evalf(
                    params, batch, key, jnp.asarray(inits),
                    jnp.asarray(centers)))
                per.extend(_per_complex_metrics(
                    np.asarray(scores, np.float32),
                    np.asarray(rmsds, np.float32), sv))
            else:
                inits, centers = sample_copy_inputs(
                    model, params, batch, cfg, num_copies, host_rng,
                    use_clustering=False)   # predicted center for all...
                half = num_copies // 2
                for c in range(half, num_copies):
                    d = host_rng.randn(batch.batch_size, 3)
                    d /= np.linalg.norm(d, axis=1, keepdims=True)
                    centers[c] = centers[c] + misdock_shift * d
                scores, rmsds = jax.device_get(evalf(
                    params, batch, key, jnp.asarray(inits),
                    jnp.asarray(centers)))
                scores = np.asarray(scores, np.float32)
                rmsds = np.asarray(rmsds, np.float32)
                nres = np.asarray(batch.prot_mask).sum(1)
                for b in range(batch.batch_size):
                    if not sv[b] or nres[b] < min_prot_for_control:
                        continue
                    control.append((float(rmsds[:half, b].mean()),
                                    float(rmsds[half:, b].mean()),
                                    float(scores[:half, b].mean()),
                                    float(scores[half:, b].mean())))
    return per, control


def summarize(per, num_copies):
    per = np.asarray(per)   # [n, 5]: acc, hit, chosen, mean, min
    n = per.shape[0]
    acc, hit = per[:, 0].mean(), per[:, 1].mean()
    wins = (per[:, 2] < per[:, 3]).mean()     # chosen < mean single pose
    def z(p_hat, p0):
        return float((p_hat - p0) / np.sqrt(p0 * (1 - p0) / n))
    return {
        "n_pairs": int(n),
        "ranking_accuracy": float(acc),
        "ranking_accuracy_z_vs_0.5": z(acc, 0.5),
        "hit_rate": float(hit),
        "hit_rate_chance": 1.0 / num_copies,
        "hit_rate_z_vs_chance": z(hit, 1.0 / num_copies),
        "chosen_rmsd": float(per[:, 2].mean()),
        "mean_single_pose_rmsd": float(per[:, 3].mean()),
        "oracle_best_rmsd": float(per[:, 4].mean()),
        "best_of_win_fraction": float(wins),
        "best_of_win_z_vs_0.5": z(wins, 0.5),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n-train", type=int, default=96)
    p.add_argument("--n-test", type=int, default=16)
    p.add_argument("--backbone-epochs", type=int, default=160)
    p.add_argument("--conf-epochs", type=int, default=40)
    p.add_argument("--num-copies", type=int, default=4)
    p.add_argument("--eval-seeds", type=int, default=3)
    p.add_argument("--max-res", type=int, default=400,
                   help="store protein-size ceiling; the CI variant uses a "
                        "smaller cap to keep CPU step cost bounded")
    p.add_argument("--export-params", default=None,
                   help="write the trained confidence params as a portable "
                        "npz (checkpoints.save_params_npz) — the committed "
                        "regression artifact the CI mirror evaluates "
                        "(training this probe takes ~1 chip-hour-equivalent "
                        "on the 1-core CPU CI host, so CI replays the "
                        "learned head instead of retraining it)")
    args = p.parse_args(argv)

    from cached_train import cached_confidence_run
    from fabind_tpu.config import preset, parse_overrides
    from fabind_tpu.data.dataset import PDBBindLMDBSource
    from fabind_tpu.data.types import dummy_batch
    from fabind_tpu.models.fabind import make_model
    from fabind_tpu.train import checkpoints

    SHAPE_SETS = shape_sets(args.max_res)
    tag, fixture_kwargs, train_argv = backbone_spec(
        args.n_train, args.n_test, args.backbone_epochs, args.max_res)

    def conf_argv(root, reg_ckpt, out):
        return ["--data", root, "--output", out,
                "--init-ckpt", reg_ckpt,
                "--pose-source", "inference",
                "--pair-scope", "within",
                "--epochs", str(args.conf_epochs),
                "--batch-size", "8",
                "--num-copies", str(args.num_copies),
                # head-only Adam sized for the probe's epoch budget
                "--set", "lr=3e-3"] + SHAPE_SETS

    root, reg, conf = cached_confidence_run(
        tag, fixture_kwargs, train_argv, conf_argv)

    over = parse_overrides([kv for kv in (
        s for s in SHAPE_SETS if s != "--set")])
    cfg = preset("fabind_plus", confidence_training=True, use_clustering=True,
                 num_copies=args.num_copies, **over)
    model = make_model(cfg)
    k = jax.random.PRNGKey(0)
    first = jax.jit(lambda: dummy_batch(
        cfg.shapes, batch_size=1,
        prot_feat_dim=cfg.model.protein_feat_dim))()
    tmpl = jax.jit(lambda b: model.init(
        {"params": k, "dropout": k, "sample": k}, b,
        train=True))(first)["params"]
    ckpt_dir = os.path.join(conf, "ckpt")
    last = sorted(d for d in os.listdir(ckpt_dir)
                  if d.startswith("params_epoch"))[-1]
    params = checkpoints.restore_params(os.path.join(ckpt_dir, last), tmpl)
    if args.export_params:
        checkpoints.save_params_npz(args.export_params, params)
        print(f"exported trained params -> {args.export_params}",
              file=sys.stderr)
    # untrained-head baseline = exactly the state confidence training
    # started from: the regression backbone overlaid on a fresh-init head
    # (the conf_cli --init-ckpt path)
    import dataclasses as _dc
    from fabind_tpu.train.trainer import create_train_state
    reg_cfg = cfg.replace(model=_dc.replace(cfg.model,
                                            confidence_training=False))
    _, reg_state = create_train_state(reg_cfg, k, first)
    restored = checkpoints.restore_state(os.path.join(reg, "ckpt"),
                                         reg_state)
    base_params = (checkpoints.overlay(tmpl, restored.params)
                   if restored is not None else None)

    src = PDBBindLMDBSource(root)
    test_idx = src.splits("fabind_plus")["test"]
    seeds = list(range(11, 11 + args.eval_seeds))

    res = {"n_train": args.n_train, "n_test": len(test_idx),
           "backbone_epochs": args.backbone_epochs,
           "conf_epochs": args.conf_epochs,
           "num_copies": args.num_copies, "max_res": args.max_res}
    per, _ = evaluate(model, params, cfg, src, test_idx,
                      args.num_copies, seeds)
    res["trained"] = summarize(per, args.num_copies)
    if base_params is not None:
        per0, _ = evaluate(model, base_params, cfg, src, test_idx,
                           args.num_copies, seeds)
        res["untrained_head_baseline"] = summarize(per0, args.num_copies)

    # misdocked-pose negative control on large unseen proteins
    _, ctrl = evaluate(model, params, cfg, src, test_idx, args.num_copies,
                       seeds[:1], misdock_shift=8.0,
                       min_prot_for_control=max(120,
                                                int(args.max_res * 0.56)))
    if ctrl:
        c = np.asarray(ctrl)   # [n, 4]: good_r, bad_r, good_s, bad_s
        res["misdock_control"] = {
            "n": int(c.shape[0]),
            "good_center_rmsd": float(c[:, 0].mean()),
            "shifted_center_rmsd": float(c[:, 1].mean()),
            "rmsd_worse_fraction": float((c[:, 1] > c[:, 0]).mean()),
            "good_score_mean": float(c[:, 2].mean()),
            "shifted_score_mean": float(c[:, 3].mean()),
            "score_detects_misdock_fraction": float(
                (c[:, 2] > c[:, 3]).mean()),
        }
    # the confidence-training epoch tail, for the loss trajectory
    recs = [json.loads(line) for line in
            open(os.path.join(conf, "metrics.jsonl")) if '"epoch"' in line]
    res["confidence_loss_first"] = recs[0]["confidence_loss"]
    res["confidence_loss_last"] = recs[-1]["confidence_loss"]
    res["train_ranking_accuracy_last"] = recs[-1]["ranking_accuracy"]
    res["train_hit_rate_last"] = recs[-1]["hit_rate"]
    print(json.dumps(res, indent=1))
    return res


if __name__ == "__main__":
    main()
