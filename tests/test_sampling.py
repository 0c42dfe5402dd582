"""FABind+ sampling + confidence-training machinery (tiny shapes)."""
import jax
import jax.numpy as jnp
import numpy as np

from fabind_tpu.config import preset
from fabind_tpu.data.types import dummy_batch
from fabind_tpu.models.fabind import make_model

from common import TINY_XS as TINY


def _setup(confidence=True):
    cfg = preset("fabind_plus_sampling" if confidence else "fabind_plus",
                 **TINY)
    batch = dummy_batch(cfg.shapes, batch_size=2, n_lig_valid=6,
                        n_prot_valid=24)
    model = make_model(cfg)
    k = jax.random.PRNGKey(0)
    variables = jax.jit(lambda: model.init(
        {"params": k, "dropout": k, "sample": k}, batch, train=True))()
    return cfg, batch, model, variables


def test_sampling_produces_diverse_scored_poses():
    from fabind_tpu.cli.sample import sample_poses
    cfg, batch, model, variables = _setup()
    coords, scores = sample_poses(model, variables["params"], batch, cfg,
                                  sample_size=3, seed=0,
                                  use_clustering=False)
    assert coords.shape == (3, 2, cfg.shapes.max_ligand, 3)
    assert scores.shape == (3, 2)
    # dropout-on inference must differ between samples
    assert not np.allclose(coords[0], coords[1])
    assert np.isfinite(coords).all() and np.isfinite(scores).all()


def test_dbscan_cluster_centers():
    from fabind_tpu.cli.sample import dbscan_cluster_centers
    rng = np.random.RandomState(0)
    B, Nr = 2, 60
    coords = rng.randn(B, Nr, 3) * 2
    coords[:, 30:] += 30.0          # second far-away cluster
    probs = np.full((B, Nr), 0.9)
    mask = np.ones((B, Nr), bool)
    default = np.zeros((B, 3))
    centers = dbscan_cluster_centers(probs, coords, mask, eps=9.0,
                                     min_samples=2, choose_prob=1.0,
                                     default_centers=default,
                                     rng=np.random.RandomState(1))
    # each center must coincide with one of the two cluster means
    for b in range(B):
        m1 = coords[b, :30].mean(0)
        m2 = coords[b, 30:].mean(0)
        d = min(np.linalg.norm(centers[b] - m1),
                np.linalg.norm(centers[b] - m2))
        assert d < 1.0


def test_hoisted_clustering_matches_per_pass_composition():
    """The fixed protocol clusters ONCE per batch and draws the pick per
    pass; with a pass-invariant DBSCAN input that must be byte-identical to
    the old cluster-every-pass loop (same rng consumption order)."""
    from fabind_tpu.cli.sample import (dbscan_cluster_centers,
                                       dbscan_clusters, pick_cluster_centers)
    rng = np.random.RandomState(0)
    B, Nr = 3, 60
    coords = rng.randn(B, Nr, 3) * 2
    coords[:, 30:] += 30.0
    probs = np.full((B, Nr), 0.9)
    probs[2] = 0.0                   # row with top-50 fallback path
    mask = np.ones((B, Nr), bool)
    mask[1, 50:] = False
    default = rng.randn(B, 3)

    per_pass_rng = np.random.RandomState(7)
    hoisted_rng = np.random.RandomState(7)
    clusters = dbscan_clusters(probs, coords, mask, eps=9.0, min_samples=2)
    for _ in range(6):
        want = dbscan_cluster_centers(probs, coords, mask, 9.0, 2, 0.5,
                                      default, per_pass_rng)
        got = pick_cluster_centers(clusters, 0.5, default, hoisted_rng)
        np.testing.assert_array_equal(want, got)


def test_stochastic_pocket_mode_varies_clusters_per_pass():
    """The reference protocol re-derives pocket logits (and hence DBSCAN
    input) per pass with dropout on (inference_sampling_fabind.py:148-167);
    both protocols must produce finite diverse poses, and the two
    protocols' pose sets must differ (different center streams)."""
    from fabind_tpu.cli.sample import sample_poses
    cfg, batch, model, variables = _setup()
    fixed_c, fixed_s = sample_poses(model, variables["params"], batch, cfg,
                                    sample_size=3, seed=0,
                                    pocket_mode="fixed")
    stoch_c, stoch_s = sample_poses(model, variables["params"], batch, cfg,
                                    sample_size=3, seed=0,
                                    pocket_mode="stochastic")
    for c, s in ((fixed_c, fixed_s), (stoch_c, stoch_s)):
        assert c.shape == (3, 2, cfg.shapes.max_ligand, 3)
        assert np.isfinite(c).all() and np.isfinite(s).all()
        assert not np.allclose(c[0], c[1])
    assert not np.allclose(fixed_c, stoch_c)


def test_confidence_training_updates_only_head():
    from fabind_tpu.train.confidence import (build_confidence_optimizer,
                                             make_confidence_train_step)
    cfg, batch, model, variables = _setup()
    params = variables["params"]
    assert "ranking_score_mlp" in params
    tx = build_confidence_optimizer(cfg, params)
    step = make_confidence_train_step(model, cfg, tx)
    opt_state = tx.init(params)
    p2, opt_state, metrics = step(params, opt_state, batch,
                                  jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["confidence_loss"]))
    # head moved, backbone frozen
    d_head = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        params["ranking_score_mlp"], p2["ranking_score_mlp"])
    assert max(jax.tree_util.tree_leaves(d_head)) > 0
    d_bb = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        params["complex_model"], p2["complex_model"])
    assert max(jax.tree_util.tree_leaves(d_bb)) == 0.0


def test_pick_best_by_confidence():
    from fabind_tpu.train.confidence import pick_best_by_confidence
    coords = jnp.arange(3 * 2 * 4 * 3, dtype=jnp.float32).reshape(3, 2, 4, 3)
    scores = jnp.asarray([[0.1, 5.0], [2.0, 1.0], [1.5, 3.0]])
    best, s = pick_best_by_confidence(coords, scores)
    np.testing.assert_array_equal(np.asarray(best[0]), np.asarray(coords[1, 0]))
    np.testing.assert_array_equal(np.asarray(best[1]), np.asarray(coords[0, 1]))


def test_topn_confidence_aggregation():
    """Top-N-by-confidence pose aggregation (test_sampling_fabind.py:165-178):
    per complex, take the N most confident poses and keep the best RMSD."""
    import numpy as np
    from fabind_tpu.cli.sample import aggregate_topn

    rmsds = np.array([[5.0, 1.0], [1.0, 4.0], [3.0, 2.0]])   # [S=3, n=2]
    cents = rmsds / 2
    confs = np.array([[0.9, 0.1], [0.2, 0.8], [0.5, 0.3]])
    # N=1: complex0 -> epoch0 (conf .9) rmsd 5; complex1 -> epoch1 rmsd 4
    r1, c1 = aggregate_topn(rmsds, cents, confs, topn=1)
    np.testing.assert_allclose(r1, [5.0, 4.0])
    np.testing.assert_allclose(c1, [2.5, 2.0])
    # N=2: complex0 -> epochs {0,2} min rmsd 3; complex1 -> {1,2} min 2
    r2, _ = aggregate_topn(rmsds, cents, confs, topn=2)
    np.testing.assert_allclose(r2, [3.0, 2.0])
