"""FABind+ confidence-model training driver.

TPU-native counterpart of FABind_plus/fabind/train_confidence.py:21-287 +
utils/training_confidence.py:13-349: load a regression checkpoint, freeze
everything but the confidence head (ranking_*), run num_copies stochastic
teacher-forced forwards per complex (dropout as the noise source, matching
the reference's deep-copied batches under model.train()), train the pairwise
ranking loss, and report ranking-accuracy / hit-rate per epoch.

Where the reference is locked to batch_size=1 with num_copies host-side
duplicates (train_confidence.py:218, confidence_dataloader.py:27-39), the
copies here live on a device axis inside one jit — any batch size works.
Because the reference's bs=1 makes every ranking pair within-complex, the
default --pair-scope within reproduces its protocol exactly at any batch
size (per-complex pairs, per-complex normalization, mean over complexes —
the mean of reference steps; goldened in tests/test_golden_confidence.py);
--pair-scope global is a documented extension that also ranks
cross-complex pairs.

Usage:
  python -m fabind_tpu.cli.train_confidence --data /path/to/pdbbind \
      --init-ckpt runs/reg/ckpt [--torch-ckpt fabind_plus_best_ckpt.bin] \
      --output runs/conf
"""
from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import numpy as np




def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--output", default="runs/confidence")
    p.add_argument("--init-ckpt", default=None,
                   help="orbax ckpt dir of a fabind_plus regression run")
    p.add_argument("--torch-ckpt", default=None,
                   help="released torch state dict (fabind_plus_best_ckpt.bin)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--num-copies", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--ranking-loss", default=None,
                   choices=[None, "logsigmoid", "dynamic_hinge"])
    p.add_argument("--pair-scope", default=None,
                   choices=[None, "within", "global"],
                   help="ranking-pair scope: 'within' (default) is the "
                        "reference protocol (bs=1 semantics — pairs only "
                        "between copies of the same complex); 'global' is "
                        "the cross-complex extension")
    p.add_argument("--pose-source", default=None,
                   choices=[None, "teacher", "inference"],
                   help="copy generator: 'teacher' (default — the "
                        "reference's mechanics: teacher-forced forwards, "
                        "dropout the only diversity) or 'inference' (full "
                        "stochastic inference passes with randomized "
                        "ligand inits + cluster-sampled centers — the "
                        "deployment pose distribution; the scale-capable "
                        "source for within-protocol learning)")
    p.add_argument("--keep-cls-2A", action="store_true")
    p.add_argument("--stack-mlp", action="store_true")
    p.add_argument("--wandb", action="store_true",
                   help="also log metrics to Weights & Biases (requires the "
                        "optional wandb package); JSONL logging is unaffected")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = p.parse_args(argv)

    from fabind_tpu.config import preset
    from fabind_tpu.data.dataset import Loader, NPZSource
    from fabind_tpu.models.fabind import make_model
    from fabind_tpu.train import checkpoints
    from fabind_tpu.train.confidence import (build_confidence_optimizer,
                                             make_confidence_train_step)
    from fabind_tpu.utils.logging_utils import Logger

    from fabind_tpu.config import parse_overrides
    overrides = {"confidence_training": True, **parse_overrides(args.set)}
    if args.epochs:
        overrides["total_epochs"] = args.epochs
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.num_copies:
        overrides["num_copies"] = args.num_copies
    if args.seed is not None:
        overrides["seed"] = args.seed
    if args.ranking_loss:
        overrides["ranking_loss"] = args.ranking_loss
    if args.pair_scope:
        overrides["ranking_pair_scope"] = args.pair_scope
    if args.keep_cls_2A:
        overrides["keep_cls_2A"] = True
    if args.stack_mlp:
        overrides["stack_mlp"] = True
    cfg = preset("fabind_plus", **overrides)

    if args.wandb:
        import os as _os
        from fabind_tpu.utils.logging_utils import init_wandb
        init_wandb(run_name=_os.path.basename(args.output.rstrip("/")),
                   config=dataclasses.asdict(cfg))
    logger = Logger(args.output, use_wandb=args.wandb)
    logger.log_message(f"devices: {jax.devices()}")

    from fabind_tpu.data.dataset import open_source
    source, _ = open_source(args.data, variant="fabind_plus",
                            use_esm2_feat=cfg.model.use_esm2_feat)
    if isinstance(source, NPZSource):
        train_idx = list(source.names)
    else:
        splits = source.splits("fabind_plus")
        # the reference trains confidence on train+valid groups
        # (train_confidence.py:132-133)
        train_idx = splits["train"] + splits.get("valid", [])
    logger.log_message(f"confidence train set: {len(train_idx)} complexes")

    loader = Loader(source, train_idx, cfg, group="train",
                    seed=cfg.train.seed, workers=8, prefetch_depth=2)
    # synthetic template batch: shapes are all that matter, and pulling the
    # first real batch would spin up (then abandon) the prefetch worker pool
    from fabind_tpu.data.types import dummy_batch
    first = jax.jit(lambda: dummy_batch(
        cfg.shapes, batch_size=cfg.train.batch_size,
        prot_feat_dim=cfg.model.protein_feat_dim))()

    model = make_model(cfg)
    key = jax.random.PRNGKey(cfg.train.seed)
    # batch as jit ARG, not closure capture (see trainer.create_train_state)
    variables = jax.jit(lambda b: model.init(
        {"params": key, "dropout": key, "sample": key}, b,
        train=True))(first)
    params = variables["params"]

    if args.torch_ckpt:
        from fabind_tpu.train.convert import convert_checkpoint
        restored, report = convert_checkpoint(args.torch_ckpt, params)
        # the released regression ckpt has no confidence params: missing
        # entries keep their fresh init (strict=False load)
        logger.log_message(
            f"torch ckpt: {report['n_torch']} keys, "
            f"{len(report['missing'])} fresh (confidence head), "
            f"{len(report['unused'])} unused")
        params = restored
    elif args.init_ckpt:
        # restore a regression TrainState's params (superset-safe): one
        # create_train_state supplies both the restore target and structure
        reg_cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, confidence_training=False))
        from fabind_tpu.train.trainer import create_train_state
        _, reg_state = create_train_state(reg_cfg, key, first)
        restored = checkpoints.restore_state(args.init_ckpt, reg_state)
        if restored is None:
            raise SystemExit(f"no checkpoint found in {args.init_ckpt}")
        # strict=False overlay: entries the regression ckpt lacks (the fresh
        # confidence head) keep their init values
        params = checkpoints.overlay(params, restored.params)
        logger.log_message(
            f"initialized backbone from {args.init_ckpt} "
            f"(step {int(restored.step)})")
    else:
        logger.log_message("WARNING: training confidence from scratch "
                           "(no --init-ckpt/--torch-ckpt)")

    pose_source = args.pose_source or "teacher"
    tx = build_confidence_optimizer(cfg, params)
    opt_state = tx.init(params)
    step_fn = make_confidence_train_step(model, cfg, tx,
                                         pose_source=pose_source)

    n_train = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    logger.log_message(f"params: {n_train/1e6:.2f}M "
                       f"(confidence head trains, backbone frozen)")

    rng = jax.random.PRNGKey(cfg.train.seed + 1)
    host_rng = np.random.RandomState(cfg.train.seed + 2)
    step = 0
    for epoch in range(cfg.train.total_epochs):
        t0 = time.time()
        acc = {}
        n_batches = 0
        dev_metrics = []
        for batch in loader.epoch(epoch):
            rng, k = jax.random.split(rng)
            if pose_source == "inference":
                from fabind_tpu.train.confidence import sample_copy_inputs
                inits, centers = sample_copy_inputs(
                    model, params, batch, cfg, cfg.train.num_copies,
                    host_rng, use_clustering=True)
                params, opt_state, metrics = step_fn(
                    params, opt_state, batch, k, inits, centers)
            else:
                params, opt_state, metrics = step_fn(params, opt_state,
                                                     batch, k)
            step += 1
            n_batches += 1
            # keep metrics ON DEVICE: float(v) per step would block on the
            # async dispatch and serialize device and host (train.py only
            # materializes every 50 steps for the same reason)
            dev_metrics.append(metrics)
            if step % 50 == 0:
                logger.log_metrics(
                    {k: float(v) for k, v in metrics.items()}, step)
        for m in jax.device_get(dev_metrics):
            for name, v in m.items():
                acc[name] = acc.get(name, 0.0) + float(v)
        summary = {k: v / max(n_batches, 1) for k, v in acc.items()}
        logger.log_metrics(summary, step, phase="epoch")
        logger.log_message(
            f"epoch {epoch}: loss={summary.get('confidence_loss', 0):.4f} "
            f"ranking_acc={summary.get('ranking_accuracy', 0):.3f} "
            f"hit_rate={summary.get('hit_rate', 0):.3f} "
            f"({time.time()-t0:.1f}s)")
        checkpoints.save_params(
            f"{args.output}/ckpt/params_epoch{epoch}", jax.device_get(params))


if __name__ == "__main__":
    main()
