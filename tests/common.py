"""Shared tiny fixture configs.

The suite is XLA-compile-dominated on the 1-CPU bench host, so every module
that can use the SAME tiny config must: identical configs produce identical
HLO, and the persistent compilation cache (conftest.py) then serves all but
the first compile of each distinct (preset, shapes) pair — both across
modules within one run and across runs.

TINY    — model-level tests (model/flexible/serve).
TINY_XS — train-step tests and the driver's multichip dryrun
          (__graft_entry__._build(tiny=True) must stay in sync so the
          dryrun reuses the suite's cached sharded-step executable).
"""

TINY = dict(max_ligand=16, max_pocket=24, max_protein=48, ctx_k=8,
            ctx_k_whole=8, hidden_size=32, pocket_pred_hidden_size=16,
            mean_layers=1, n_iter=2)

TINY_XS = dict(max_ligand=8, max_pocket=16, max_protein=32, ctx_k=6,
               ctx_k_whole=6, hidden_size=16, pocket_pred_hidden_size=16,
               mean_layers=1, n_iter=2, steps_per_epoch=2, warmup_epochs=1,
               total_epochs=4)
