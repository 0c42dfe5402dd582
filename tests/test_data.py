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


def test_trailing_batch_duplicates_masked():
    """The loader marks trailing-batch padding rows invalid and the metric
    accumulator must skip them (reference evaluates exact counts)."""
    import numpy as np
    from fabind_tpu.config import preset
    from fabind_tpu.data.batching import build_sample, collate
    from fabind_tpu.utils.metrics import MetricAccumulator

    cfg = preset("fabind", max_ligand=8, max_pocket=16, max_protein=32)
    rng = np.random.RandomState(0)
    raw = {
        "protein_xyz": rng.randn(20, 3).astype(np.float32) * 5,
        "esm_feat": rng.randn(20, 1280).astype(np.float32),
        "lig_coords": rng.randn(5, 3).astype(np.float32),
        "lig_feats": rng.randn(5, 56).astype(np.float32),
        "bond_edges": np.array([[0, 1], [1, 0], [1, 2], [2, 1]]),
        "las_mask": np.eye(5, k=1, dtype=bool) | np.eye(5, k=-1, dtype=bool),
        "rdkit_coords": rng.randn(5, 3).astype(np.float32),
    }
    s = build_sample(raw, cfg, group="test")
    batch = collate([s, s, s, s], cfg, n_valid=3)
    assert batch.sample_valid.tolist() == [True, True, True, False]

    class Out:
        coords = np.asarray(batch.lig_coords)
        lig_mask = np.asarray(batch.lig_mask)
        pred_pocket_center = np.zeros((4, 3))
        pocket_cls_logits = np.zeros((4, 32))
        pocket_cls_label = np.asarray(batch.pocket_label)
        prot_mask = np.asarray(batch.prot_mask)

    acc = MetricAccumulator()
    acc.update(Out(), batch, pdbs=["a", "b", "c"])
    m = acc.summarize()
    assert m["n"] == 3
    assert len(acc.per_pdb) == 3


def test_randomize_torsions_preserves_bonds_and_rings():
    """Torsion noise must preserve all bond lengths and ring geometry while
    changing dihedrals of rotatable (non-ring, non-terminal) bonds."""
    import numpy as np
    from fabind_tpu.data.torsion import randomize_torsions, rotatable_bonds

    # butane-like chain 0-1-2-3-4 plus a 3-ring {5,6,7} hanging off atom 4
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 5)]
    edges = np.asarray(edges + [(j, i) for i, j in edges])
    rng = np.random.RandomState(3)
    coords = rng.randn(8, 3).astype(np.float32) * 2

    rb = rotatable_bonds(8, edges)
    assert (1, 2) in rb and (2, 3) in rb and (3, 4) in rb
    assert (0, 1) not in rb          # terminal atom 0
    assert (5, 6) not in rb and (6, 7) not in rb and (5, 7) not in rb  # ring

    out = randomize_torsions(coords, edges, np.random.RandomState(7))
    # bond lengths preserved
    for i, j in edges:
        d0 = np.linalg.norm(coords[i] - coords[j])
        d1 = np.linalg.norm(out[i] - out[j])
        np.testing.assert_allclose(d0, d1, rtol=1e-4)
    # centered
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-4)
    # something actually rotated
    rel0 = coords - coords.mean(0)
    assert not np.allclose(rel0, out, atol=1e-3)


def test_redocking_init_mode():
    import numpy as np
    from fabind_tpu.config import preset
    from fabind_tpu.data.batching import build_sample

    cfg = preset("fabind", max_ligand=8, max_pocket=16, max_protein=32,
                 compound_coords_init_mode="redocking_no_rotate")
    rng = np.random.RandomState(0)
    raw = {
        "protein_xyz": rng.randn(20, 3).astype(np.float32) * 5,
        "esm_feat": rng.randn(20, 1280).astype(np.float32),
        "lig_coords": rng.randn(5, 3).astype(np.float32),
        "lig_feats": rng.randn(5, 56).astype(np.float32),
        "bond_edges": np.array([[0, 1], [1, 0], [1, 2], [2, 1]]),
        "las_mask": np.eye(5, k=1, dtype=bool) | np.eye(5, k=-1, dtype=bool),
        "rdkit_coords": rng.randn(5, 3).astype(np.float32),
    }
    s = build_sample(raw, cfg, group="test")
    # redocking: LAS reference = GT coords, full constraint adjacency
    np.testing.assert_allclose(s["lig_rdkit_coords"], s["lig_coords"])
    assert s["las_adj"].sum() == 5 * 4
    # init = GT centered at pocket mean
    np.testing.assert_allclose(
        s["lig_coords_init"].mean(0),
        s["prot_xyz"][s["pocket_idx"]].mean(0), atol=1e-5)


def test_preprocess_esm_mode_and_iso(tmp_path, monkeypatch):
    """preprocess CLI: FASTA parsing + ESM dump path (embedding stubbed) and
    the isomorphism-injection helper."""
    import numpy as np
    from fabind_tpu.cli import preprocess as pp

    fasta = tmp_path / "seqs.fasta"
    fasta.write_text(">p1\nACDE\nFGH\n>p2\nKLM\n")
    calls = []

    def fake_esm(seq, device="cpu", **kw):
        calls.append(seq)
        return np.zeros((len(seq), 8), np.float32)

    import fabind_tpu.data.featurize as fz
    monkeypatch.setattr(fz, "extract_esm_feature", fake_esm)
    out = tmp_path / "esm"
    pp.main(["esm", "--seqs", str(fasta), "--out", str(out)])
    assert calls == ["ACDEFGH", "KLM"]
    assert np.load(out / "p1.npy").shape == (7, 8)
    assert np.load(out / "p2.npy").shape == (3, 8)

    # isomorphism helper: a symmetric path a-b-a has 2 automorphisms
    rec = {"feats": np.eye(3, 56, dtype=np.float32)[[0, 1, 0]],
           "bond_edges": np.array([[0, 1], [1, 0], [1, 2], [2, 1]])}
    class A: max_iso = 4
    isos = pp._maybe_isomorphisms(rec, 4)
    assert len(isos) == 2


def test_bucketed_loader_routes_by_size():
    """Samples land in the smallest bucket they fit; batch shapes follow the
    bucket; counts are preserved and trailing flushes are marked."""
    import dataclasses
    import numpy as np
    from fabind_tpu.config import preset
    from fabind_tpu.data.dataset import Loader

    cfg = preset("fabind", max_ligand=24, max_pocket=32, max_protein=64,
                 ctx_k=8, ctx_k_whole=8)
    small = dataclasses.replace(cfg.shapes, max_ligand=8, max_pocket=16,
                                max_protein=32)
    rng = np.random.RandomState(0)

    def raw(n_lig, n_prot, name):
        edges = [[i, i + 1] for i in range(n_lig - 1)]
        edges = np.asarray(edges + [[j, i] for i, j in edges])
        # 10 residues near the ligand, the rest far away -> pocket size 10
        prot = rng.randn(n_prot, 3).astype(np.float32) * 2
        prot[10:] += 1000.0
        return {
            "protein_xyz": prot,
            "esm_feat": rng.randn(n_prot, 1280).astype(np.float32),
            "lig_coords": rng.randn(n_lig, 3).astype(np.float32),
            "lig_feats": rng.randn(n_lig, 56).astype(np.float32),
            "bond_edges": edges,
            "las_mask": np.eye(n_lig, k=1, dtype=bool) | np.eye(n_lig, k=-1,
                                                                dtype=bool),
            "rdkit_coords": rng.randn(n_lig, 3).astype(np.float32),
            "pdb": name,
        }

    class Src:
        samples = ([raw(5, 20, f"s{i}") for i in range(5)]
                   + [raw(20, 60, f"L{i}") for i in range(3)])
        def get(self, idx):
            return self.samples[idx]

    loader = Loader(Src(), range(8), cfg, group="test", batch_size=2,
                    buckets=[small, cfg.shapes])
    seen = {}
    for batch, meta in loader.epoch(0, with_meta=True):
        Nc = batch.lig_feat.shape[1]
        for pdb in meta["pdb"]:
            seen[pdb] = Nc
        assert meta["cfg"].shapes.max_ligand == Nc
    assert len(seen) == 8
    assert all(v == 8 for k, v in seen.items() if k.startswith("s"))
    assert all(v == 24 for k, v in seen.items() if k.startswith("L"))
    assert loader.n_dropped == 0


def test_protein_gvp_features():
    """15-d geometric residue features (the non-ESM protein path)."""
    rng = np.random.RandomState(0)
    nr = 12
    # plausible backbone: residues along a curve, atoms jittered around CA
    ca = np.cumsum(rng.randn(nr, 3).astype(np.float32) + [3.8, 0, 0], axis=0)
    coords = np.stack([ca + rng.randn(nr, 3) * 0.5 for _ in range(4)], axis=1)
    coords[:, 1] = ca
    f = F.protein_gvp_features(coords)
    assert f.shape == (nr, 15)
    assert np.isfinite(f).all()
    # dihedral block is sin/cos -> bounded
    assert (np.abs(f[:, :6]) <= 1 + 1e-6).all()
    # orientation + sidechain vectors are unit (or zero at chain ends)
    v = f[:, 6:].reshape(nr, 3, 3)
    n = np.linalg.norm(v, axis=-1)
    assert np.allclose(n[1:-1], 1.0, atol=1e-5)
    assert n[-1, 0] == 0.0 and n[0, 1] == 0.0   # fwd/bwd padding at ends
    # sensitivity to geometry
    coords2 = coords.copy()
    coords2[5, 0] += 2.0
    assert not np.allclose(F.protein_gvp_features(coords2), f)


def test_build_sample_gvp_fallback():
    """use_esm2_feat=False consumes protein_full_coords -> 15-d features."""
    cfg = preset("fabind", max_ligand=16, max_pocket=32, max_protein=40,
                 bond_k=4, use_esm2_feat=False)
    raw = make_raw()
    del raw["esm_feat"]
    rng = np.random.RandomState(0)
    ca = raw["protein_xyz"]
    raw["protein_full_coords"] = np.stack(
        [ca + 0.5, ca, ca - 0.5, ca + 0.2], axis=1)
    s = build_sample(raw, cfg, group="test", rng=rng)
    assert s["prot_feat"].shape == (ca.shape[0], 15)
    with pytest.raises(KeyError):
        build_sample({k: v for k, v in raw.items()
                      if k != "protein_full_coords"}, cfg, group="test",
                     rng=rng)

    # esm2_concat_raw: [ESM 1280 ‖ geometric 15] (parsing.py --esm2-concat-raw;
    # model dim model.py:57)
    cfg2 = preset("fabind", max_ligand=16, max_pocket=32, max_protein=40,
                  bond_k=4, esm2_concat_raw=True)
    raw2 = dict(raw, esm_feat=np.random.RandomState(1).randn(
        ca.shape[0], 1280).astype(np.float32))
    s2 = build_sample(raw2, cfg2, group="test", rng=rng)
    assert s2["prot_feat"].shape == (ca.shape[0], 1295)
    np.testing.assert_array_equal(s2["prot_feat"][:, 1280:], s["prot_feat"])


def test_loader_workers_and_prefetch():
    """Threaded featurization + background prefetch must reproduce the
    synchronous loader bit-for-bit on eval groups (no rng use), preserve
    batch/sample counts on train, and propagate producer exceptions."""
    import numpy as np
    import pytest
    from fabind_tpu.config import preset
    from fabind_tpu.data.dataset import Loader, prefetch

    cfg = preset("fabind", max_ligand=16, max_pocket=32, max_protein=40,
                 ctx_k=8, ctx_k_whole=8, batch_size=2)

    class Src:
        samples = [make_raw(seed=i) for i in range(7)]
        def get(self, idx):
            return self.samples[idx]

    def batches(**kw):
        return list(Loader(Src(), range(7), cfg, group="test", **kw).epoch(0))

    ref = batches()
    par = batches(workers=3, prefetch_depth=2)
    assert len(ref) == len(par)
    for a, b in zip(ref, par):
        for f in ("lig_coords_init", "prot_xyz", "pocket_idx", "sample_valid"):
            np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                          np.asarray(getattr(b, f)))

    # train group: noise comes from per-sample streams -> same counts, and
    # the same worker count reproduces itself exactly
    tr1 = list(Loader(Src(), range(7), cfg, group="train", seed=5,
                      workers=2, prefetch_depth=1).epoch(3))
    tr2 = list(Loader(Src(), range(7), cfg, group="train", seed=5,
                      workers=4).epoch(3))
    assert len(tr1) == len(tr2) == len(ref)
    for a, b in zip(tr1, tr2):
        np.testing.assert_array_equal(np.asarray(a.lig_coords_init),
                                      np.asarray(b.lig_coords_init))

    def boom():
        yield 1
        raise RuntimeError("producer died")
    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer died"):
        next(it)


def test_suggest_buckets():
    """Auto-bucket inference: small/large populations get separate buckets,
    dims are 8-padded, clamped, and the drop boundary stays cfg.shapes."""
    import numpy as np
    from fabind_tpu.config import preset
    from fabind_tpu.data.buckets import measure_sizes, suggest_buckets

    cfg = preset("fabind", max_ligand=64, max_pocket=96, max_protein=256,
                 ctx_k=8, ctx_k_whole=8)

    rng = np.random.RandomState(0)
    small = np.stack([rng.randint(5, 12, 40), rng.randint(8, 20, 40),
                      rng.randint(20, 40, 40)], 1)
    large = np.stack([rng.randint(40, 60, 10), rng.randint(60, 90, 10),
                      rng.randint(150, 250, 10)], 1)
    sizes = np.concatenate([small, large])
    shapes = suggest_buckets(sizes, cfg, k=3)
    assert shapes[-1] == cfg.shapes              # drop boundary preserved
    assert all(s.max_ligand % 8 == 0 or s.max_ligand == 64 for s in shapes)
    # the small population fits a much smaller bucket than the max; the
    # pocket dim carries the predicted-crop headroom (default 8)
    assert shapes[0].max_ligand <= 16 and shapes[0].max_pocket <= 32
    tight = suggest_buckets(sizes, cfg, k=3, pocket_headroom=0)
    assert tight[0].max_pocket <= 24
    assert tight[0].max_pocket <= shapes[0].max_pocket
    # every sample fits some bucket
    for n_lig, n_pkt, n_prot in sizes:
        assert any(n_lig <= s.max_ligand and n_prot <= s.max_protein
                   for s in shapes)
    # oversize samples are excluded from sizing, boundary still cfg.shapes
    sizes2 = np.concatenate([sizes, [[200, 10, 20]]])
    shapes2 = suggest_buckets(sizes2, cfg, k=2)
    assert shapes2[-1] == cfg.shapes

    # measure_sizes end-to-end over a tiny source
    class Src:
        samples = [make_raw(n=6, nr=25, seed=i) for i in range(4)]
        def get(self, idx):
            return self.samples[idx]
    got = measure_sizes(Src(), range(4), cfg, limit=3)
    assert got.shape == (3, 3)
    assert (got[:, 0] == 6).all() and (got[:, 2] == 25).all()


def test_loader_host_shard_partitions_epoch():
    """host_shard slices the (shared, deterministic) epoch permutation.
    Every index is served, and — because the dp train step is a collective
    program — every host emits the SAME number of batches even when the
    index count doesn't divide evenly or a host-local sample is oversize
    (wrap-padding + substitution, not drops)."""
    import numpy as np
    from fabind_tpu.config import preset
    from fabind_tpu.data.dataset import Loader

    cfg = preset("fabind", max_ligand=16, max_pocket=32, max_protein=40,
                 ctx_k=8, ctx_k_whole=8, batch_size=1)

    served = {}

    class Src:
        samples = [make_raw(seed=i) for i in range(7)]
        def get(self, idx):
            served.setdefault(idx, 0)
            served[idx] += 1
            return dict(self.samples[idx], pdb=f"x{idx}")

    seen, counts = [], []
    for pi in range(2):
        ld = Loader(Src(), range(7), cfg, group="train", seed=9,
                    host_shard=(pi, 2))
        batches = list(ld.epoch(4, with_meta=True))
        counts.append(len(batches))
        for _, meta in batches:
            seen += meta["pdb"]
    # equal per-host batch counts (7 -> ceil(7/2)=4 samples per host)
    assert counts == [4, 4]
    # every index served at least once; only wrap-padding duplicates
    assert set(seen) == {f"x{i}" for i in range(7)}
    assert len(seen) == 8

    # a host-local oversize sample is substituted, not dropped: batch
    # counts still match across hosts
    class SrcBig(Src):
        def get(self, idx):
            r = super().get(idx)
            if idx == 3:   # one oversize ligand
                r = dict(r, lig_feats=np.zeros((64, 56), np.float32),
                         lig_coords=np.zeros((64, 3), np.float32),
                         rdkit_coords=np.zeros((64, 3), np.float32),
                         las_mask=np.zeros((64, 64), bool),
                         bond_edges=np.zeros((0, 2), np.int64))
            return r

    counts2 = []
    for pi in range(2):
        ld = Loader(SrcBig(), range(7), cfg, group="train", seed=9,
                    host_shard=(pi, 2))
        counts2.append(len(list(ld.epoch(4))))
    assert counts2 == [4, 4]
    # single-host behavior unchanged: oversize samples are dropped
    ld = Loader(SrcBig(), range(7), cfg, group="train", seed=9)
    assert len(list(ld.epoch(4))) == 6


def test_loader_skip_batches_resumes_exact_sequence():
    """epoch(skip_batches=k) must yield exactly the uninterrupted epoch's
    batches [k:] (mid-epoch preemption resume)."""
    import numpy as np
    from fabind_tpu.config import preset
    from fabind_tpu.data.dataset import Loader

    cfg = preset("fabind", max_ligand=16, max_pocket=32, max_protein=40,
                 ctx_k=8, ctx_k_whole=8, batch_size=2)

    class Src:
        samples = [make_raw(seed=i) for i in range(7)]
        def get(self, idx):
            return self.samples[idx]

    for group in ("test", "train"):
        full = list(Loader(Src(), range(7), cfg, group=group,
                           seed=3).epoch(1))
        tail = list(Loader(Src(), range(7), cfg, group=group,
                           seed=3).epoch(1, skip_batches=2))
        assert len(tail) == len(full) - 2
        for a, b in zip(full[2:], tail):
            for f in ("lig_coords_init", "prot_xyz", "pocket_idx",
                      "sample_valid"):
                np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                              np.asarray(getattr(b, f)))


def test_parse_pdb_atoms_pure_python(tmp_path):
    """Pure-Python PDB parser: ATOM-only, standard-20, N/CA/C/O required,
    highest-occupancy altloc wins (reference cleaning semantics,
    inference_pdb_utils.py:15-60) — runs without BioPython."""
    from fabind_tpu.data.featurize import parse_pdb_atoms

    pdb = tmp_path / "t.pdb"
    def atom(serial, name, alt, res, chain, seq, x, occ=1.0, rec="ATOM  "):
        return (f"{rec}{serial:>5} {name:<4}{alt}{res} {chain}{seq:>4} "
                f"   {x:8.3f}{0.0:8.3f}{0.0:8.3f}{occ:6.2f}{20.0:6.2f}"
                f"           C\n")
    lines = []
    # residue 1: complete ALA with an altloc CA (B has higher occupancy)
    lines += [atom(1, "N", " ", "ALA", "A", 1, 1.0),
              atom(2, "CA", "A", "ALA", "A", 1, 2.0, occ=0.4),
              atom(3, "CA", "B", "ALA", "A", 1, 9.0, occ=0.6),
              atom(4, "C", " ", "ALA", "A", 1, 3.0),
              atom(5, "O", " ", "ALA", "A", 1, 4.0)]
    # residue 2: GLY missing O -> dropped
    lines += [atom(6, "N", " ", "GLY", "A", 2, 5.0),
              atom(7, "CA", " ", "GLY", "A", 2, 6.0),
              atom(8, "C", " ", "GLY", "A", 2, 7.0)]
    # nonstandard residue -> dropped; HETATM water -> dropped
    lines += [atom(9, "CA", " ", "MSE", "A", 3, 8.0),
              atom(10, "O", " ", "HOH", "A", 4, 9.0, rec="HETATM")]
    # residue 5: complete VAL on another chain
    lines += [atom(11, "N", " ", "VAL", "B", 1, 10.0),
              atom(12, "CA", " ", "VAL", "B", 1, 11.0),
              atom(13, "C", " ", "VAL", "B", 1, 12.0),
              atom(14, "O", " ", "VAL", "B", 1, 13.0)]
    pdb.write_text("".join(lines))
    s = parse_pdb_atoms(str(pdb))
    assert s["seq"] == "AV"
    assert s["coords"].shape == (2, 4, 3)
    # altloc B CA (x=9.0) must have been selected
    assert s["coords"][0, 1, 0] == 9.0

    # real fixture from the reference's 4-complex smoke set
    import os
    ref = "/root/reference/FABind/inference_examples/pdb_files/6efk.pdb"
    if os.path.exists(ref):
        r = parse_pdb_atoms(ref)
        assert len(r["seq"]) == 132 and r["coords"].shape == (132, 4, 3)


def test_sdf_coords_and_chain_selection(tmp_path):
    """Pure-Python SDF coord reader on the reference's real ligand fixture +
    chain-within-cutoff PDB filtering (feature_utils.py:379-412)."""
    import os
    from fabind_tpu.data.featurize import sdf_coords, select_chain_within_cutoff

    ref_sdf = ("/root/reference/FABind/inference_examples/gt_mol_files/"
               "6g3c/6g3c_ligand.sdf")
    if os.path.exists(ref_sdf):
        c = sdf_coords(ref_sdf)
        assert c.ndim == 2 and c.shape[1] == 3 and len(c) > 5
        assert np.isfinite(c).all()

    # synthetic 2-chain PDB: ligand sits near chain A only
    def atom(serial, name, res, chain, seq, x):
        return (f"ATOM  {serial:>5} {name:<4} {res} {chain}{seq:>4} "
                f"   {x:8.3f}{0.0:8.3f}{0.0:8.3f}{1.0:6.2f}{20.0:6.2f}"
                f"           C\n")
    lines = []
    for i, (chain, x0) in enumerate([("A", 0.0), ("B", 500.0)]):
        base = i * 10
        lines += [atom(base + 1, "N", "ALA", chain, 1, x0),
                  atom(base + 2, "CA", "ALA", chain, 1, x0 + 1),
                  atom(base + 3, "C", "ALA", chain, 1, x0 + 2),
                  atom(base + 4, "O", "ALA", chain, 1, x0 + 3)]
    pdb = tmp_path / "two_chain.pdb"
    pdb.write_text("".join(lines))
    out = tmp_path / "sel.pdb"
    kept = select_chain_within_cutoff(
        str(pdb), np.array([[2.0, 0.0, 0.0]], np.float32), 10.0, str(out))
    assert kept == ["A"]
    sel = out.read_text()
    assert " A   1" in sel and " B   1" not in sel
