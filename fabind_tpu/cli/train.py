"""Training driver.

TPU-native counterpart of `accelerate launch fabind/main_fabind.py`
(FABind/fabind/main_fabind.py:34-599): typed preset config instead of 90
argparse flags, jitted dp-sharded train step instead of DDP, orbax instead of
accelerate save_state.

Usage:
  python -m fabind_tpu.cli.train --preset fabind --data /path/to/pdbbind \
      --output runs/exp1 [--epochs N] [--batch-size B]
"""
from __future__ import annotations

import argparse
import time

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="fabind",
                   choices=["fabind", "fabind_plus"])
    p.add_argument("--data", required=True,
                   help="reference preprocessed PDBbind root (LMDB) or NPZ dir")
    p.add_argument("--output", default="runs/default")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="rematerialize EGNN layers in the backward "
                        "(jax.checkpoint); grad-exact, enables ~4x larger "
                        "train batches on 16G HBM (see DESIGN.md)")
    p.add_argument("--dp", type=int, default=0, help="dp mesh size (0=all)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-every", type=int, default=1)
    p.add_argument("--save-every-steps", type=int, default=0,
                   help="also checkpoint every N steps (async, mid-epoch "
                        "resumable); 0 = per-epoch only")
    p.add_argument("--save-every-epochs", type=int, default=1,
                   help="checkpoint every N epochs (the final epoch always "
                        "saves); raise when epochs are seconds long and "
                        "checkpoint IO would dominate")
    p.add_argument("--keep", type=int, default=3,
                   help="checkpoint retention: newest N step dirs kept")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace (TensorBoard xplane) "
                        "of training steps 10-15 into this directory")
    p.add_argument("--workers", type=int, default=8,
                   help="host featurization threads (reference DataLoader "
                        "num_workers=10, main_fabind.py:220); 0 = inline")
    p.add_argument("--prefetch", type=int, default=2,
                   help="batches buffered ahead of the device (0 = off)")
    p.add_argument("--transfer-dtype", default="fp32",
                   choices=["fp32", "bf16"],
                   help="wire dtype for the batch's wide ESM feature rows "
                        "(prot_feat, [B,Nr,1280] — the dominant host->"
                        "device bytes: ~2.6MB/sample fp32). bf16 halves "
                        "the per-step upload; compute still runs under the "
                        "configured precision policy (bf16 inputs promote "
                        "against fp32 params), so this only rounds the "
                        "frozen ESM inputs to the deployment dtype. "
                        "Default fp32 keeps training bit-identical to the "
                        "goldens; use bf16 when the host link is the "
                        "bottleneck (measured: a tunneled chip is)")
    p.add_argument("--buckets", default="auto",
                   help="shape buckets: 'auto' (default) measures the train "
                        "split's size distribution and infers up to 3 "
                        "buckets ('auto:K' for K), one jitted train step "
                        "per bucket — each complex trains in the smallest "
                        "bucket it fits instead of being padded to "
                        "cfg.shapes; 'none' disables (single max-shape "
                        "bucket); or explicit 'lig:pocket:protein,...'. "
                        "Under multi-host dp every host derives the same "
                        "globally-deterministic bucket schedule (static "
                        "routing + shared shuffle, data/dataset.py:"
                        "_epoch_global_schedule), so the collective step "
                        "can never desync")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="config override, e.g. --set max_ligand=32 "
                        "--set n_iter=4 (any ModelConfig/ShapeConfig/"
                        "TrainConfig field)")
    p.add_argument("--wandb", action="store_true",
                   help="also log metrics to Weights & Biases (project "
                        "fabind_tpu, run named after --output); JSONL/TB "
                        "logging is unaffected. Requires the optional "
                        "wandb package")
    p.add_argument("--compile-cache", default="~/.cache/fabind_xla",
                   help="persistent XLA compilation cache dir ('' disables); "
                        "restarts and preemption-resumes then skip the "
                        "multi-minute train-step recompile")
    args = p.parse_args(argv)

    import os as _os
    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir",
                          _os.path.expanduser(args.compile_cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from fabind_tpu.config import preset
    from fabind_tpu.data.dataset import Loader, NPZSource
    from fabind_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from fabind_tpu.train import checkpoints
    from fabind_tpu.train.trainer import (BucketedTrainStep,
                                          create_train_state,
                                          make_eval_step)
    from fabind_tpu.utils.logging_utils import Logger
    from fabind_tpu.utils.metrics import MetricAccumulator

    from fabind_tpu.config import parse_overrides
    overrides = parse_overrides(args.set)
    if args.epochs:
        overrides["total_epochs"] = args.epochs
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.seed is not None:
        overrides["seed"] = args.seed
    if args.bf16:
        overrides["bf16"] = True
    overrides.setdefault("remat", args.remat)
    cfg = preset(args.preset, **overrides)

    if args.wandb:
        import dataclasses as _dcw
        from fabind_tpu.utils.logging_utils import init_wandb
        init_wandb(run_name=_os.path.basename(args.output.rstrip("/")),
                   config=_dcw.asdict(cfg))
    logger = Logger(args.output, use_wandb=args.wandb)
    logger.log_message(f"devices: {jax.devices()}")

    from fabind_tpu.data.dataset import open_source
    source, _ = open_source(args.data, variant=args.preset,
                            use_esm2_feat=cfg.model.use_esm2_feat)
    if isinstance(source, NPZSource):
        n = len(source.names)
        splits = {"train": source.names[: int(0.9 * n)],
                  "valid": source.names[int(0.9 * n):], "test": []}
    else:
        splits = source.splits(args.preset)
    logger.log_message(
        f"splits: {({k: len(v) for k, v in splits.items()})}")

    # multi-host: each process feeds its own strided slice of the epoch
    # (replaces the reference's DDP DistributedSampler, SURVEY §2.3)
    shard = ((jax.process_index(), jax.process_count())
             if jax.process_count() > 1 else None)
    from fabind_tpu.data.buckets import resolve_buckets
    buckets = resolve_buckets(args.buckets, cfg, source, splits["train"],
                              group="train")
    if buckets is not None:
        logger.log_message(
            ("train buckets%s: " % (
                " (multi-host: globally-deterministic schedule)"
                if shard is not None else ""))
            + str([(s.max_ligand, s.max_pocket,
                    s.max_protein) for s in buckets]))
    train_loader = Loader(source, splits["train"], cfg, group="train",
                          seed=cfg.train.seed, workers=args.workers,
                          prefetch_depth=args.prefetch, host_shard=shard,
                          buckets=buckets)
    valid_loader = Loader(source, splits.get("valid", []), cfg, group="valid",
                          workers=args.workers,
                          prefetch_depth=args.prefetch, buckets=buckets)

    # init on a synthetic TINY template batch: flax param shapes depend only
    # on feature dims, never on the shape bucket, so initializing at full
    # cfg.shapes would pay a pointless multi-minute XLA compile at startup
    import dataclasses as _dc
    from fabind_tpu.data.types import dummy_batch
    tiny_shapes = _dc.replace(
        cfg.shapes, max_ligand=min(8, cfg.shapes.max_ligand),
        max_pocket=min(16, cfg.shapes.max_pocket),
        max_protein=min(32, cfg.shapes.max_protein),
        ctx_k=min(6, cfg.shapes.ctx_k),
        ctx_k_whole=min(6, cfg.shapes.ctx_k_whole))
    first = jax.jit(lambda: dummy_batch(
        tiny_shapes, batch_size=1,
        n_lig_valid=min(6, tiny_shapes.max_ligand),
        n_prot_valid=min(24, tiny_shapes.max_protein),
        prot_feat_dim=cfg.model.protein_feat_dim))()
    # the init model's shapes must match the template batch (the stage-2
    # crop sizes come from cfg.shapes, not the batch); params are identical
    _, state = create_train_state(cfg.replace(shapes=tiny_shapes),
                                  jax.random.PRNGKey(cfg.train.seed), first)
    ckptr = checkpoints.TrainCheckpointer(args.output + "/ckpt",
                                          max_to_keep=args.keep)
    start_epoch, skip_batches = 0, 0
    if args.resume:
        restored = ckptr.restore(state)
        if restored is not None:
            state, meta = restored
            start_epoch = int(meta.get("epoch", 0))
            skip_batches = int(meta.get("batch_in_epoch", 0))
            logger.log_message(
                f"resumed at step {int(state.step)} "
                f"(epoch {start_epoch}, batch {skip_batches})")

    mesh = make_mesh(args.dp or None)
    state = replicate(state, mesh)
    from fabind_tpu.models.fabind import make_model
    train_step = BucketedTrainStep(cfg, mesh)
    # the reference evaluates both the teacher-forced pocket (stage 1) and
    # the predicted-pocket path (stage 2) each epoch (main_fabind.py:554-589);
    # eval steps compile lazily per (stage, shape bucket)
    eval_steps = {}

    def eval_step_for(stage, bucket_cfg):
        key = (stage, bucket_cfg.shapes)
        if key not in eval_steps:
            eval_steps[key] = make_eval_step(make_model(bucket_cfg),
                                             stage=stage)
        return eval_steps[key]

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(state.params))
    logger.log_message(f"model params: {n_params/1e6:.2f}M")

    # preemption safety: on SIGTERM/SIGINT finish the in-flight step, write
    # a mid-epoch checkpoint (with the data-order position) and exit cleanly
    # — the TPU-production counterpart of the reference's crash-resume-only
    # policy (main_fabind.py:298-306)
    import signal
    preempted = {"flag": False}

    def _on_signal(signum, frame):
        preempted["flag"] = True
        logger.log_message(f"signal {signum}: checkpointing then exiting")

    old_handlers = {s: signal.signal(s, _on_signal)
                    for s in (signal.SIGTERM, signal.SIGINT)}

    step = int(state.step)
    # profiler window counts steps taken THIS run (absolute step numbers
    # break under --resume: a run resumed past step 10 would stop_trace
    # without ever starting one)
    run_steps = 0
    tracing = False
    for epoch in range(start_epoch, cfg.train.total_epochs):
        t0 = time.time()
        batch_in_epoch = skip_batches
        for batch, meta in train_loader.epoch(epoch, with_meta=True,
                                              skip_batches=skip_batches):
            if args.transfer_dtype == "bf16":
                import ml_dtypes
                batch = batch.replace(prot_feat=np.asarray(
                    batch.prot_feat).astype(ml_dtypes.bfloat16))
            batch = shard_batch(batch, mesh)
            if args.profile_dir and run_steps == 10:
                jax.profiler.start_trace(args.profile_dir)
                tracing = True
            state, metrics = train_step(state, batch, meta["cfg"])
            step += 1
            batch_in_epoch += 1
            run_steps += 1
            if tracing and run_steps == 15:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), state.params)
                jax.profiler.stop_trace()
                tracing = False
                logger.log_message(f"profiler trace -> {args.profile_dir}")
            if step % 50 == 0:
                logger.log_metrics(metrics, step)
            mid_meta = {"epoch": epoch, "batch_in_epoch": batch_in_epoch}
            if preempted["flag"]:
                ckptr.save(jax.device_get(state), meta=mid_meta, step=step)
                ckptr.close()
                logger.log_message(f"preemption checkpoint at step {step}")
                return
            if args.save_every_steps and step % args.save_every_steps == 0:
                ckptr.save(jax.device_get(state), meta=mid_meta, step=step)
        skip_batches = 0
        # drain the async dispatch queue before stamping the epoch wall
        # time: the loop body is non-blocking (jit dispatch is async), so
        # without a sync the logged per-epoch time would exclude queued
        # device work and overstate throughput (tools/perf_e2e_train.py
        # reads these lines as the sustained-throughput measurement)
        jax.block_until_ready(
            jax.tree_util.tree_leaves(state.params)[:1])
        logger.log_message(
            f"epoch {epoch} done in {time.time()-t0:.1f}s; "
            f"dropped {train_loader.n_dropped} oversize samples")
        if ((epoch + 1) % max(args.save_every_epochs, 1) == 0
                or epoch + 1 == cfg.train.total_epochs):
            ckptr.save(jax.device_get(state),
                       meta={"epoch": epoch + 1, "batch_in_epoch": 0},
                       step=step)

        if (args.eval_every > 0 and (epoch + 1) % args.eval_every == 0
                and len(valid_loader.indices)):
            for stage in (1, 2):
                acc = MetricAccumulator()
                for batch, meta in valid_loader.epoch(0, with_meta=True):
                    out = eval_step_for(stage, meta["cfg"])(state.params,
                                                            batch)
                    acc.update(jax.device_get(out), batch)
                logger.log_metrics(acc.summarize(), step,
                                   phase=f"valid_stage{stage}")

    if tracing:
        jax.profiler.stop_trace()
        logger.log_message(f"profiler trace (short run) -> {args.profile_dir}")
    ckptr.close()
    for s, h in old_handlers.items():
        signal.signal(s, h)


if __name__ == "__main__":
    main()
