"""Host featurization (pure parts) + collator tests."""
import numpy as np
import pytest

from fabind_tpu.config import preset
from fabind_tpu.data import featurize as F
from fabind_tpu.data.batching import SampleTooLarge, build_sample, collate


def test_feature_dim_is_56():
    f = F.atom_property_prediction_feature("C", 2, 1, 4, 0, True)
    assert f.shape == (56,)
    assert f.sum() == 6.0  # 5 one-hots + aromatic flag


def test_unknown_values_hit_unknown_slot():
    f = F.atom_property_prediction_feature("Xx", 99, 99, 99, 99, False)
    assert f.shape == (56,)
    # each onehot lands on its trailing unknown slot
    assert f[len(F.ATOM_VOCAB)] == 1.0
    assert f.sum() == 5.0


def test_las_mask_bonds_2hop_rings():
    # chain 0-1-2-3 plus ring (0,1,2)
    n = 4
    adj = np.zeros((n, n), np.int64)
    for i, j in [(0, 1), (1, 2), (2, 3)]:
        adj[i, j] = adj[j, i] = 1
    las = F.las_mask_from_adj_rings(adj, [[0, 1, 2]])
    # bonds
    assert las[0, 1] and las[1, 2] and las[2, 3]
    # 2-hop
    assert las[0, 2] and las[1, 3]
    # no 3-hop
    assert not las[0, 3]
    # no self loops
    assert not las.diagonal().any()
    # symmetric
    np.testing.assert_array_equal(las, las.T)


def make_raw(n=9, nr=30, seed=0):
    rng = np.random.RandomState(seed)
    prot = rng.randn(nr, 3).astype(np.float32) * 8
    lig = prot[:3].mean(0) + rng.randn(n, 3).astype(np.float32)
    bond = []
    for i in range(n - 1):
        bond += [(i, i + 1), (i + 1, i)]
    las = np.zeros((n, n), bool)
    for i, j in bond:
        las[i, j] = True
    return dict(protein_xyz=prot, esm_feat=rng.randn(nr, 1280).astype(np.float32),
                lig_coords=lig, lig_feats=rng.randn(n, 56).astype(np.float32),
                bond_edges=np.asarray(bond), las_mask=las,
                rdkit_coords=lig + 0.1 * rng.randn(n, 3).astype(np.float32))


def test_build_sample_and_collate():
    cfg = preset("fabind", max_ligand=16, max_pocket=32, max_protein=40,
                 bond_k=4)
    rng = np.random.RandomState(0)
    samples = [build_sample(make_raw(seed=i), cfg, group="test", rng=rng)
               for i in range(3)]
    batch = collate(samples, cfg)
    assert batch.lig_feat.shape == (3, 16, 56)
    assert batch.prot_xyz.shape == (3, 40, 3)
    # protein-mean frame
    for b in range(3):
        m = np.asarray(batch.prot_mask[b])
        np.testing.assert_allclose(
            np.asarray(batch.prot_xyz[b])[m].mean(0), 0.0, atol=1e-4)
    # pocket indices point at residues within 20A of ligand com
    for b in range(3):
        pm = np.asarray(batch.pocket_mask[b])
        idx = np.asarray(batch.pocket_idx[b])[pm]
        d = np.linalg.norm(np.asarray(batch.prot_xyz[b])[idx]
                           - np.asarray(batch.coords_center[b]), axis=1)
        assert (d < cfg.model.pocket_radius).all()
    # ligand init centered at pocket center
    b = 0
    lm = np.asarray(batch.lig_mask[b])
    pc = np.asarray(batch.prot_xyz[b])[np.asarray(batch.pocket_idx[b])[
        np.asarray(batch.pocket_mask[b])]].mean(0)
    np.testing.assert_allclose(
        np.asarray(batch.lig_coords_init[b])[lm].mean(0), pc, atol=1e-4)


def test_collate_rejects_oversize():
    cfg = preset("fabind", max_ligand=4, max_pocket=32, max_protein=40,
                 bond_k=4)
    s = build_sample(make_raw(n=9), cfg, group="test",
                     rng=np.random.RandomState(0))
    with pytest.raises(SampleTooLarge):
        collate([s], cfg)


def test_train_rotation_randomizes_init():
    cfg = preset("fabind", max_ligand=16, max_pocket=32, max_protein=40,
                 bond_k=4)
    raw = make_raw()
    a = build_sample(raw, cfg, group="train", rng=np.random.RandomState(1))
    b = build_sample(raw, cfg, group="train", rng=np.random.RandomState(2))
    assert not np.allclose(a["lig_coords_init"], b["lig_coords_init"])
    # rotation preserves internal distances
    da = np.linalg.norm(a["lig_rdkit_coords"][0] - a["lig_rdkit_coords"][1])
    db = np.linalg.norm(b["lig_rdkit_coords"][0] - b["lig_rdkit_coords"][1])
    np.testing.assert_allclose(da, db, rtol=1e-4)


def test_post_optimize_recovers_conformer_geometry():
    """Optimizing from a perturbed pose should drive the LAS pair distances
    back to the reference conformer's."""
    import jax
    import jax.numpy as jnp
    from fabind_tpu.postopt import post_optimize_batch_jit, _pair_dist

    rng = np.random.RandomState(0)
    B, n, Nc = 2, 7, 10
    ref = np.zeros((B, Nc, 3), np.float32)
    ref[:, :n] = rng.randn(B, n, 3) * 2
    pred = ref + 0.8 * rng.randn(B, Nc, 3).astype(np.float32)
    mask = np.zeros((B, Nc), bool)
    mask[:, :n] = True
    las = np.zeros((B, Nc, Nc), bool)
    for i in range(n - 1):
        las[:, i, i + 1] = las[:, i + 1, i] = True
    x, loss = post_optimize_batch_jit(jnp.asarray(pred), jnp.asarray(ref),
                                      jnp.asarray(las), jnp.asarray(mask),
                                      steps=300)
    d_ref = np.asarray(_pair_dist(jnp.asarray(ref)))
    d_opt = np.asarray(_pair_dist(x))
    err0 = np.abs(np.asarray(_pair_dist(jnp.asarray(pred))) - d_ref)[las].mean()
    err1 = np.abs(d_opt - d_ref)[las].mean()
    assert err1 < 0.2 * err0, (err0, err1)
