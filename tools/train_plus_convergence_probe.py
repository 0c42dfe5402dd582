"""FABind+ learning-evidence probe (round-3 verdict item 3).

Overfits the SYMMETRIC-ligand plus fixture (each ligand has a genuine
0<->2 automorphism and its init conformer is the swapped pose) with the
released plus loss stack (permutation_invariant=True, radius head) and
reports, as one JSON line:
  - coord/total/radius loss first->last,
  - identity-RMSD rmsd_lt2 (expected 0: the model settles in the SWAPPED
    basin, ~3.2 A from the identity assignment),
  - symmetric-RMSD rmsd_lt2 (expected 1: the automorphism group recovers
    the match) — proving the permutation machinery engages through a
    non-identity permutation, not merely executes.
Mirrors tests/test_real_data.py::test_plus_training_converges_through_
nonidentity_permutation (CI).
Reference dynamics: FABind_plus/fabind/utils/training.py:59-97.

Committed result (CPU, 600 epochs, lr 3e-4, hidden 16, seed 0):
  loss 9.50 -> 5.44, coord loss 0.417 -> 0.122, radius loss
  0.0235 -> 0.0060, rmsd_lt2_identity 0.0 (identity RMSD 2.87 — the
  model settled in the swapped basin), rmsd_lt2_symmetric 1.0
  (symmetric RMSD 0.84). Two fixture properties were required to get a
  clean basin-choice signal (see fixture_pdbbind.synth_complex): the
  pocket must sit in the automorphic pair's bisector plane (the dismap
  losses are NOT permutation-min'ed — reference training.py:64-69 — so
  an asymmetric pocket pulls the pair onto the basin midpoint:
  measured |pred0-pred2| -> 0.002 from 4.97 at init), and rotation
  augmentation must be off (see train_rotation below).
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


SHAPE_SETS = ["--set", "max_ligand=16", "--set", "max_pocket=32",
              "--set", "max_protein=40", "--set", "ctx_k=8",
              "--set", "ctx_k_whole=8", "--set", "hidden_size=16",
              "--set", "pocket_pred_hidden_size=16",
              "--set", "mean_layers=1", "--set", "n_iter=2"]


def main(epochs=600):
    from fixture_pdbbind import make_reference_fixture
    from fabind_tpu.cli import evaluate as eval_cli
    from fabind_tpu.cli import train as train_cli

    tmp = tempfile.mkdtemp(prefix="fabind_plus_conv_")
    root = os.path.join(tmp, "pdbbind_plus")
    make_reference_fixture(root, plus=True, overfit=True, symmetric=True,
                           n_test=4)
    out = os.path.join(tmp, "run")
    train_cli.main(["--preset", "fabind_plus", "--data", root,
                    "--output", out, "--epochs", str(epochs),
                    "--batch-size", "4", "--workers", "0", "--dp", "1",
                    "--seed", "0", "--eval-every", "999",
                    "--save-every-epochs", "100",
                    "--compile-cache", "~/.jax_cache_tests",
                    "--set", "lr=" + os.environ.get("FABIND_PROBE_LR", "3e-4"),
                    "--set", "warmup_epochs=1",
                    # rotation augmentation off: per-step random init
                    # orientation flips which automorphism is closest, and
                    # a probe-sized model then collapses to the basin
                    # MIDPOINT (measured: rmsd_id == rmsd_swap == 3.4)
                    # instead of settling in one — the knob isolates the
                    # permutation machinery, which is what this probes
                    "--set", "train_rotation=false",
                    "--set", "steps_per_epoch=1"] + SHAPE_SETS)
    recs = [json.loads(line) for line in
            open(os.path.join(out, "metrics.jsonl")) if '"train"' in line]
    losses = [r["loss"] for r in recs if "loss" in r]
    rad = [r["pocket_radius_loss"] for r in recs if "pocket_radius_loss" in r]
    coord = [r["com_coord_loss"] for r in recs if "com_coord_loss" in r]

    res = {"loss_first": float(np.mean(losses[:2])),
           "loss_last": float(np.mean(losses[-2:])),
           "radius_loss_first": float(np.mean(rad[:2])),
           "radius_loss_last": float(np.mean(rad[-2:])),
           "coord_loss_first": float(np.mean(coord[:2])),
           "coord_loss_last": float(np.mean(coord[-2:]))}

    for tag, flags in (("identity", []), ("symmetric", ["--symmetric-rmsd"])):
        mp = os.path.join(tmp, f"eval_{tag}.json")
        eval_cli.main(["--preset", "fabind_plus", "--data", root,
                       "--ckpt", os.path.join(out, "ckpt"),
                       "--batch-size", "4", "--split", "test",
                       "--workers", "0", "--prefetch", "0", "--out", mp]
                      + flags + SHAPE_SETS)
        m = json.load(open(mp))
        res[f"rmsd_lt2_{tag}"] = m["rmsd_lt2"]
        res[f"rmsd_mean_{tag}"] = m["rmsd_mean"]
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600)
