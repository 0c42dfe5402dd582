"""Training step, dp-sharded step, losses, converter round-trip."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fabind_tpu.config import preset
from fabind_tpu.data.types import dummy_batch
from fabind_tpu.models.fabind import make_model
from fabind_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from fabind_tpu.train.convert import convert_state_dict, export_torch_state_dict
from fabind_tpu.train.losses import confidence_ranking_loss
from fabind_tpu.train.trainer import (create_train_state, make_sharded_train_step,
                                      make_train_step)

from common import TINY_XS as TINY


@pytest.fixture(scope="module")
def train_setup():
    """One train-state + jitted step shared by the single-host train tests
    (the compile dominates suite time; see conftest compile cache)."""
    cfg = preset("fabind", **TINY)
    batch = dummy_batch(cfg.shapes, batch_size=2, n_lig_valid=6,
                        n_prot_valid=24)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(model, cfg))
    return cfg, batch, model, state, step


def test_train_step_updates_params(train_setup):
    cfg, batch, model, state, step = train_setup
    state2, metrics = step(state, batch)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["skipped_nan"]) == 0.0
    # take a second step so the delta accumulates over two updates
    state3, metrics = step(state2, batch)
    assert float(metrics["skipped_nan"]) == 0.0
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               state.params, state3.params)
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_train_step_skips_nan_batch(train_setup):
    cfg, batch, model, state, step = train_setup
    bad = batch.replace(lig_coords=batch.lig_coords.at[0, 0, 0].set(jnp.nan))
    state2, metrics = step(state, bad)
    assert float(metrics["skipped_nan"]) == 1.0
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               state.params, state2.params)
    assert max(jax.tree_util.tree_leaves(d)) == 0.0
    # a skipped batch leaves the OPTIMIZER untouched too (the reference's
    # host-side `continue`): Adam's count must not advance, moments must not
    # decay toward zero on the zeroed gradient
    d_opt = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                   state.opt_state, state2.opt_state)
    assert max(jax.tree_util.tree_leaves(d_opt)) == 0.0
    # and every reported metric is sanitized (one NaN step must not poison
    # an averaged logging window)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_train_step_bf16_computes_in_bf16():
    """cfg.train.bf16 must actually change the compute dtype: with the batch
    cast included, the bf16 loss differs from the fp32 loss (params-only
    casting was a silent no-op — fp32 inputs re-promote every matmul).

    SUBPROCESS ISOLATION: compiling this test's two steps late in a
    full-suite process crashed jax/XLA natively three times in round 4
    (SIGSEGV/SIGABRT inside the compilation-cache layer — with a poisoned
    cache, a fresh cache, and the cache disabled — deterministically at
    suite position ~216/230 and NEVER standalone or in file-level
    subsets): an accumulated native-state interaction in the long-lived
    test process, not a property of this code. A fresh interpreter runs
    the comparison instead; the assertions are unchanged."""
    import json
    import os
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent("""
        import dataclasses, json
        import jax
        jax.config.update("jax_platforms", "cpu")
        from common import TINY_XS as TINY
        from fabind_tpu.config import preset
        from fabind_tpu.data.types import dummy_batch
        from fabind_tpu.train.trainer import create_train_state, \\
            make_train_step
        cfg = preset("fabind", **TINY)
        batch = dummy_batch(cfg.shapes, batch_size=2, n_lig_valid=6,
                            n_prot_valid=24)
        model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
        cfg16 = cfg.replace(train=dataclasses.replace(cfg.train, bf16=True))
        _, m16 = jax.jit(make_train_step(model, cfg16))(state, batch)
        _, m32 = jax.jit(make_train_step(model, cfg))(state, batch)
        print(json.dumps({"l16": float(m16["loss"]),
                          "l32": float(m32["loss"])}))
    """)
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [tests_dir, os.path.dirname(tests_dir),
         env.get("PYTHONPATH", "")]).rstrip(os.pathsep)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # plain CPU-only child jax
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-4000:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    l16, l32 = res["l16"], res["l32"]
    assert np.isfinite(l16) and np.isfinite(l32)
    assert l16 != l32, "bf16 step bitwise-equal to fp32: the cast is a no-op"
    assert abs(l16 - l32) / max(abs(l32), 1e-6) < 0.1, \
        "bf16 loss diverges >10% from fp32 at tiny scale"


def test_sharded_train_step_8dev():
    """Data-parallel step over the 8-device CPU mesh (SURVEY.md §2.3 TPU
    equivalent of DDP)."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    cfg = preset("fabind", **TINY)
    batch = dummy_batch(cfg.shapes, batch_size=8, n_lig_valid=6,
                        n_prot_valid=24)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    mesh = make_mesh(8)
    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)
    step = make_sharded_train_step(model, cfg, mesh)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_convert_round_trip():
    cfg = preset("fabind", **TINY)
    batch = dummy_batch(cfg.shapes, batch_size=1, n_lig_valid=6,
                        n_prot_valid=24)
    model = make_model(cfg)
    k = jax.random.PRNGKey(0)
    variables = jax.jit(lambda: model.init(
        {"params": k, "dropout": k, "sample": k}, batch, train=False))()
    params = variables["params"]
    sd = export_torch_state_dict(params)
    assert any("linear_kv.weight" in k for k in sd)
    # the exporter itself must emit the torch Sequential naming (.0/.2)
    # used by the real released base checkpoints (egnn.py:40-60)
    assert any(k.endswith("edge_mlp.0.weight") for k in sd)
    assert not any(".linear1." in k and any(
        t in k for t in ("edge_mlp", "node_mlp", "coord_mlp", "distmap_mlp"))
        for k in sd)
    back, missing, unused = convert_state_dict(sd, params)
    assert not missing, missing
    assert not unused, unused
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_schedule_shapes():
    from fabind_tpu.train.schedule import build_schedule
    cfg = preset("fabind", **TINY).train
    s = build_schedule(cfg)
    # reference warmup is LinearLR(start_factor=0.5): 0.5*lr, NOT zero
    # (main_fabind.py:265-271)
    assert abs(float(s(0)) - 0.5 * cfg.lr) < 1e-9
    w = cfg.warmup_epochs * cfg.steps_per_epoch
    assert abs(float(s(w)) - cfg.lr) < 1e-8

    import dataclasses
    # exp_decay: ExponentialLR(gamma=0.995) per step (main_fabind.py:278)
    se = build_schedule(dataclasses.replace(cfg, lr_scheduler="exp_decay"))
    assert abs(float(se(w + 100)) - cfg.lr * 0.995 ** 100) < 1e-9
    # cosine_decay floors at eta_min=1e-5 (main_fabind.py:280)
    m = (cfg.total_epochs - cfg.warmup_epochs) * cfg.steps_per_epoch
    sc = build_schedule(dataclasses.replace(cfg,
                                            lr_scheduler="cosine_decay"))
    assert abs(float(sc(w + m)) - 1e-5) < 1e-9
    # cosine_decay_restart: 10-step period, eta_min=1e-4
    sr = build_schedule(dataclasses.replace(
        cfg, lr_scheduler="cosine_decay_restart"))
    assert abs(float(sr(w)) - cfg.lr) < 1e-9
    assert abs(float(sr(w + 10)) - float(sr(w))) < 1e-9


def test_confidence_ranking_loss():
    scores = jnp.asarray([3.0, 1.0, 2.0])
    rmsds = jnp.asarray([0.5, 2.5, 1.0])   # best, worst, mid
    good = confidence_ranking_loss(scores, rmsds)
    bad = confidence_ranking_loss(-scores, rmsds)
    assert float(good) < float(bad)

    # perfectly ordered scores drive the logsigmoid loss below ln(2); the
    # anti-ordered set sits above it
    assert float(good) < float(jnp.log(2.0)) < float(bad)

    # valid mask removes an entry's pairs entirely: masking out the worst
    # pose leaves only the (best, mid) pair
    masked = confidence_ranking_loss(
        scores, rmsds, valid=jnp.asarray([True, False, True]))
    expect = -jax.nn.log_sigmoid(scores[0] - scores[2])
    np.testing.assert_allclose(float(masked), float(expect), rtol=1e-6)

    # dynamic_hinge: a score gap larger than the rmsd gap on every pair
    # zeroes the loss (training_confidence.py:58-60)
    wide = jnp.asarray([10.0, 0.0, 5.0])
    assert float(confidence_ranking_loss(
        wide, rmsds, loss_type="dynamic_hinge")) == 0.0
    assert float(confidence_ranking_loss(
        -wide, rmsds, loss_type="dynamic_hinge")) > 0.0

    # keep_cls_2a adds the BCE(score, rmsd<2A) term (training_confidence
    # .py:68-71): a loss with it is strictly larger for imperfect logits
    with_ce = confidence_ranking_loss(scores, rmsds, keep_cls_2a=True)
    assert float(with_ce) > float(good)


def test_confidence_step_freezes_backbone():
    """The confidence train step must update ONLY ranking_* params
    (train_confidence.py:163-166) and report the reference's ranking
    metrics (training_confidence.py:49-79)."""
    from fabind_tpu.train.confidence import (build_confidence_optimizer,
                                             make_confidence_train_step)
    cfg = preset("fabind_plus", confidence_training=True, num_copies=3,
                 **TINY)
    batch = dummy_batch(cfg.shapes, batch_size=2, n_lig_valid=6,
                        n_prot_valid=24)
    model = make_model(cfg)
    k = jax.random.PRNGKey(0)
    params = jax.jit(lambda: model.init(
        {"params": k, "dropout": k, "sample": k}, batch,
        train=True))()["params"]
    tx = build_confidence_optimizer(cfg, params)
    opt_state = tx.init(params)
    step = make_confidence_train_step(model, cfg, tx)
    params2, _, metrics = step(params, opt_state, batch, jax.random.PRNGKey(1))

    flat1 = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat2 = dict(jax.tree_util.tree_flatten_with_path(params2)[0])
    changed_backbone, changed_head = [], []
    for path, a in flat1.items():
        b = flat2[path]
        top = path[0].key
        if not np.allclose(np.asarray(a), np.asarray(b)):
            (changed_head if top.startswith("ranking")
             else changed_backbone).append(path)
    assert not changed_backbone, changed_backbone[:3]
    assert changed_head, "confidence head did not train"
    assert 0.0 <= float(metrics["ranking_accuracy"]) <= 1.0
    assert 0.0 <= float(metrics["hit_rate"]) <= 1.0


def test_train_checkpointer_async_retention_meta(train_setup, tmp_path):
    """TrainCheckpointer: async save + keep-N retention + data-order meta
    for mid-epoch resume (production counterpart of accelerate save_state,
    main_fabind.py:594-596)."""
    import os
    from fabind_tpu.train.checkpoints import TrainCheckpointer

    cfg, batch, model, state, step_fn = train_setup
    host_state = jax.device_get(state)
    ck = TrainCheckpointer(str(tmp_path / "ck"), max_to_keep=2)
    for s in (1, 2, 3):
        ck.save(host_state, meta={"epoch": 0, "batch_in_epoch": s}, step=s)
    ck.wait()
    kept = sorted(int(d) for d in os.listdir(tmp_path / "ck")
                  if d.isdigit())
    assert kept == [2, 3], kept
    restored, meta = ck.restore(host_state)
    assert meta == {"epoch": 0, "batch_in_epoch": 3}
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               host_state.params, restored.params)
    assert max(jax.tree_util.tree_leaves(d)) == 0.0
    ck.close()


def test_graft_dryrun_config_matches_tiny_xs():
    """__graft_entry__._build(tiny=True) must equal preset(fabind, **TINY_XS):
    the driver's multichip dryrun then reuses the suite's cached sharded-step
    executable instead of recompiling ~5 min on the 1-CPU bench host."""
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                    "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cfg_graft, _, _ = mod._build(tiny=True)
    assert cfg_graft == preset("fabind", **TINY)


def test_remat_train_step_grad_exact(train_setup):
    """cfg.remat (jax.checkpoint on each EGNN layer) must leave loss and
    grads bit-comparable — it only changes what is stored vs recomputed."""
    cfg, batch, model, state, step = train_setup
    cfg_r = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, remat=True))
    model_r, sr = create_train_state(cfg_r, jax.random.PRNGKey(0), batch)
    step_r = jax.jit(make_train_step(model_r, cfg_r))
    _, m0 = step(state, batch)
    _, m1 = step_r(sr, batch)
    assert abs(float(m0["loss"]) - float(m1["loss"])) < 1e-4
    gn0, gn1 = float(m0["grad_norm"]), float(m1["grad_norm"])
    assert abs(gn0 - gn1) / max(gn0, 1e-9) < 1e-4


def test_train_cli_preemption_and_resume(tmp_path):
    """End-to-end preemption safety: SIGTERM mid-run -> clean exit with a
    checkpoint; --resume restores and finishes the remaining epochs."""
    import os
    import signal
    import subprocess
    import sys
    import time

    from test_data import make_raw

    data = tmp_path / "npz"
    data.mkdir()
    for i in range(8):
        np.savez(data / f"c{i}.npz", **make_raw(seed=i))
    out = tmp_path / "run"

    env = dict(os.environ)
    # the axon plugin force-registers the TPU backend when this is set,
    # overriding JAX_PLATFORMS (see __graft_entry__.dryrun_multichip)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    args = [sys.executable, "-m", "fabind_tpu.cli.train",
            "--compile-cache", "~/.jax_cache_tests",
            "--data", str(data), "--output", str(out),
            "--epochs", "40", "--batch-size", "2", "--workers", "0",
            "--save-every-steps", "2", "--eval-every", "99",
            "--set", "max_ligand=16", "--set", "max_pocket=32",
            "--set", "max_protein=40", "--set", "ctx_k=8",
            "--set", "ctx_k_whole=8", "--set", "hidden_size=16",
            "--set", "pocket_pred_hidden_size=16",
            "--set", "mean_layers=1", "--set", "n_iter=2"]
    proc = subprocess.Popen(args, env=env, cwd=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    ckpt_dir = out / "ckpt"
    deadline = time.time() + 600
    while time.time() < deadline:
        if ckpt_dir.is_dir() and any(d.isdigit() for d in os.listdir(ckpt_dir)):
            break
        if proc.poll() is not None:
            raise AssertionError(f"train exited early rc={proc.returncode}")
        time.sleep(2)
    else:
        proc.kill()
        raise AssertionError("no checkpoint appeared within 600s")
    proc.send_signal(signal.SIGTERM)
    rc = proc.wait(timeout=300)
    assert rc == 0, f"SIGTERM exit rc={rc}"
    steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    assert steps, "no checkpoint after SIGTERM"

    # resume for a couple more epochs and finish cleanly
    args[args.index("40")] = "2"  # --epochs 2 (already past epoch 0 saves)
    rc2 = subprocess.run(args + ["--resume"], env=env, timeout=600,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__)))).returncode
    assert rc2 == 0
    log = (out / "log.txt").read_text()
    assert "resumed at step" in log


def test_restore_reads_both_checkpoint_layouts(train_setup, tmp_path):
    """restore_state/restore_params must read both the legacy step_N layout
    and TrainCheckpointer's CheckpointManager layout (a regression: the
    confidence CLI could not load cli/train.py checkpoints)."""
    from fabind_tpu.train import checkpoints

    cfg, batch, model, state, step_fn = train_setup
    host_state = jax.device_get(state)

    mgr_dir = tmp_path / "mgr"
    ck = checkpoints.TrainCheckpointer(str(mgr_dir), max_to_keep=2)
    ck.save(host_state, meta={"epoch": 1, "batch_in_epoch": 2}, step=7)
    ck.close()
    restored = checkpoints.restore_state(str(mgr_dir), host_state)
    assert restored is not None and checkpoints.latest_step(str(mgr_dir)) == 7
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               host_state.params, restored.params)
    assert max(jax.tree_util.tree_leaves(d)) == 0.0
    params = checkpoints.restore_params(str(mgr_dir), host_state.params)
    leaves_a = jax.tree_util.tree_leaves(params)
    leaves_b = jax.tree_util.tree_leaves(host_state.params)
    assert len(leaves_a) == len(leaves_b)
    assert all(float(jnp.abs(a - b).max()) == 0.0
               for a, b in zip(leaves_a, leaves_b))

    legacy_dir = tmp_path / "legacy"
    checkpoints.save_state(str(legacy_dir), host_state, step=3)
    restored2 = checkpoints.restore_state(str(legacy_dir), host_state)
    assert restored2 is not None and int(restored2.step) == int(host_state.step)


def test_bucketed_train_step_dispatch(train_setup):
    """BucketedTrainStep compiles one jitted step per shape bucket and
    threads ONE TrainState through all of them (params/optimizer state are
    shape-independent) — the cli.train dispatch behind --buckets."""
    from fabind_tpu.train.trainer import BucketedTrainStep

    cfg, batch, model, state, _ = train_setup
    big = dataclasses.replace(cfg, shapes=dataclasses.replace(
        cfg.shapes, max_ligand=12, max_pocket=24))
    batch_big = dummy_batch(big.shapes, batch_size=2, n_lig_valid=10,
                            n_prot_valid=24)
    # fresh copies: BucketedTrainStep donates its state argument (so hold a
    # host snapshot of the starting params for the final comparison)
    params0 = jax.device_get(state.params)
    step0 = int(state.step)
    state = jax.tree_util.tree_map(jnp.array, state)
    bstep = BucketedTrainStep(cfg)
    s1, m1 = bstep(state, batch, cfg)
    s2, m2 = bstep(s1, batch_big, big)
    s3, m3 = bstep(s2, batch, cfg)
    assert int(s3.step) == step0 + 3
    assert len(bstep._steps) == 2, "one compiled step per distinct bucket"
    for m in (m1, m2, m3):
        assert np.isfinite(float(m["loss"]))
        assert float(m["skipped_nan"]) == 0.0
    # params advanced across the mixed-bucket sequence
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               params0, jax.device_get(s3.params))
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_bucketed_epoch_resume_exact():
    """The bucketed train epoch is resume-exact: epoch(skip_batches=k)
    yields exactly the uninterrupted epoch's batches [k:], same buckets,
    same content (the cli.train --resume contract under --buckets)."""
    from fabind_tpu.config import preset
    from fabind_tpu.data.dataset import Loader
    from test_data import make_raw

    cfg = preset("fabind", max_ligand=24, max_pocket=32, max_protein=64,
                 ctx_k=8, ctx_k_whole=8, batch_size=2)
    small = dataclasses.replace(cfg.shapes, max_ligand=12, max_pocket=24,
                                max_protein=40)

    class Src:
        samples = ([make_raw(n=6, nr=30, seed=i) for i in range(6)]
                   + [make_raw(n=18, nr=55, seed=10 + i) for i in range(4)])

        def get(self, idx):
            return self.samples[idx]

    def run(skip):
        loader = Loader(Src(), range(10), cfg, group="train", seed=3,
                        buckets=[small, cfg.shapes])
        out = []
        for batch, meta in loader.epoch(epoch=1, with_meta=True,
                                        skip_batches=skip):
            out.append((meta["cfg"].shapes.max_ligand, tuple(meta["pdb"]),
                        float(np.asarray(batch.lig_coords).sum()),
                        float(np.asarray(batch.pocket_idx).sum())))
        return out

    full = run(0)
    assert len(full) >= 4
    resumed = run(2)
    assert resumed == full[2:]
