"""Graph construction: top-K ctx neighbor tables and compaction vs brute force."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fabind_tpu.ops import graph as G


def make_inputs(seed=0, B=2, Nc=6, Np=10, Kb=3):
    rng = np.random.RandomState(seed)
    layout = G.ComplexLayout(Nc, Np)
    N = layout.n_nodes
    x = rng.randn(B, N, 3).astype(np.float32) * 1.2
    lig_mask = np.zeros((B, Nc), bool)
    pkt_mask = np.zeros((B, Np), bool)
    lig_mask[0, :4] = True
    lig_mask[1, :6] = True
    pkt_mask[0, :7] = True
    pkt_mask[1, :10] = True
    bond_idx = rng.randint(0, 4, (B, Nc, Kb))
    bond_mask = rng.rand(B, Nc, Kb) < 0.6
    bond_mask &= lig_mask[:, :, None]
    # bond targets must be valid atoms; no self bonds; no duplicate slots
    # (real bond lists satisfy all three — the collator guarantees it)
    for b in range(B):
        for i in range(Nc):
            seen = set()
            for k in range(Kb):
                j = bond_idx[b, i, k]
                if bond_mask[b, i, k] and (
                        not lig_mask[b, j] or j == i or j in seen):
                    bond_mask[b, i, k] = False
                if bond_mask[b, i, k]:
                    seen.add(j)
    return layout, x, lig_mask, pkt_mask, bond_idx, bond_mask


def brute_force_edges(layout, x, lig_mask, pkt_mask, bond_idx, bond_mask,
                      cutoff):
    """Reference edge semantics (att_model.py:69-96 + bond prepend)."""
    B = x.shape[0]
    Nc, Np = layout.n_lig, layout.n_pkt
    edges = [set() for _ in range(B)]
    for b in range(B):
        # pocket-pocket radius edges (directed both ways by enumeration)
        for i in range(Np):
            if not pkt_mask[b, i]:
                continue
            for j in range(Np):
                if i == j or not pkt_mask[b, j]:
                    continue
                d = np.linalg.norm(x[b, Nc + 2 + i] - x[b, Nc + 2 + j])
                if d <= cutoff:
                    edges[b].add((Nc + 2 + i, Nc + 2 + j))
        # ligand bonds
        for i in range(Nc):
            for k in range(bond_idx.shape[-1]):
                if bond_mask[b, i, k]:
                    edges[b].add((1 + i, 1 + bond_idx[b, i, k]))
        # global star
        for i in range(Nc):
            if lig_mask[b, i]:
                edges[b].add((0, 1 + i))
                edges[b].add((1 + i, 0))
        for i in range(Np):
            if pkt_mask[b, i]:
                edges[b].add((Nc + 1, Nc + 2 + i))
                edges[b].add((Nc + 2 + i, Nc + 1))
        edges[b].add((0, Nc + 1))
        edges[b].add((Nc + 1, 0))
    return edges


def ctx_graph_edges(ctx, layout, B):
    """Edge set implied by a CtxGraph."""
    edges = [set() for _ in range(B)]
    nbr_idx = np.asarray(ctx.nbr_idx)
    nbr_mask = np.asarray(ctx.nbr_mask)
    for b in range(B):
        for i in range(nbr_idx.shape[1]):
            for k in range(nbr_idx.shape[2]):
                if nbr_mask[b, i, k]:
                    edges[b].add((i, int(nbr_idx[b, i, k])))
        for d, (src, m) in ((layout.glb_c, (ctx.glbc_src, ctx.glbc_src_mask)),
                            (layout.glb_p, (ctx.glbp_src, ctx.glbp_src_mask))):
            src = np.asarray(src)
            m = np.asarray(m)
            for k in range(src.shape[0]):
                if m[b, k]:
                    edges[b].add((d, int(src[k])))
    return edges


def test_ctx_graph_matches_brute_force():
    layout, x, lig_mask, pkt_mask, bond_idx, bond_mask = make_inputs()
    cutoff = 1.5
    ctx = G.build_ctx_graph(jnp.asarray(x), layout, jnp.asarray(lig_mask),
                            jnp.asarray(pkt_mask), jnp.asarray(bond_idx),
                            jnp.asarray(bond_mask), cutoff, k_radius=12)
    got = ctx_graph_edges(ctx, layout, x.shape[0])
    want = brute_force_edges(layout, x, lig_mask, pkt_mask, bond_idx,
                             bond_mask, cutoff)
    for b in range(x.shape[0]):
        assert got[b] == want[b], (
            f"batch {b}: missing {want[b]-got[b]}, extra {got[b]-want[b]}")


def test_ctx_graph_topk_truncates_to_nearest():
    layout, x, lig_mask, pkt_mask, bond_idx, bond_mask = make_inputs()
    # tiny K: must keep the K nearest within cutoff
    k = 2
    cutoff = 100.0
    ctx = G.build_ctx_graph(jnp.asarray(x), layout, jnp.asarray(lig_mask),
                            jnp.asarray(pkt_mask), jnp.asarray(bond_idx),
                            jnp.asarray(bond_mask), cutoff, k_radius=k)
    nbr_idx = np.asarray(ctx.nbr_idx)
    nbr_mask = np.asarray(ctx.nbr_mask)
    Nc, Np = layout.n_lig, layout.n_pkt
    for b in range(x.shape[0]):
        for i in range(Np):
            if not pkt_mask[b, i]:
                continue
            d = np.array([
                np.linalg.norm(x[b, Nc + 2 + i] - x[b, Nc + 2 + j])
                if (pkt_mask[b, j] and j != i) else np.inf
                for j in range(Np)])
            want = set(Nc + 2 + np.argsort(d)[:k])
            row = nbr_idx[b, Nc + 2 + i][nbr_mask[b, Nc + 2 + i]]
            got = set(int(v) for v in row if v != Nc + 1)  # drop glb_p slot
            assert got == want


def test_inter_graph():
    layout, x, lig_mask, pkt_mask, *_ = make_inputs()
    cutoff = 1.3
    adj = G.build_inter_graph(jnp.asarray(x), layout, jnp.asarray(lig_mask),
                              jnp.asarray(pkt_mask), cutoff).adj
    adj = np.asarray(adj)
    Nc = layout.n_lig
    for b in range(x.shape[0]):
        for i in range(layout.n_lig):
            for j in range(layout.n_pkt):
                d = np.linalg.norm(x[b, 1 + i] - x[b, Nc + 2 + j])
                want = bool(lig_mask[b, i] and pkt_mask[b, j] and d <= cutoff)
                assert bool(adj[b, i, j]) == want


def test_compact_keep_mask():
    rng = np.random.RandomState(1)
    keep = rng.rand(3, 20) < 0.4
    keep[2] = False  # empty sample
    idx, mask, overflow = G.compact_keep_mask(jnp.asarray(keep), 6)
    idx, mask, overflow = map(np.asarray, (idx, mask, overflow))
    for b in range(3):
        want = np.nonzero(keep[b])[0][:6]
        got = idx[b][mask[b]]
        np.testing.assert_array_equal(got, want)
        assert overflow[b] == max(0, keep[b].sum() - 6)
    assert not mask[2].any()


def test_movable_and_masks():
    layout = G.ComplexLayout(3, 4)
    seg = np.asarray(layout.segment_id())
    np.testing.assert_array_equal(seg, [0, 0, 0, 0, 1, 1, 1, 1, 1])
    glb = np.asarray(layout.is_global())
    assert glb[0] and glb[4] and glb.sum() == 2
    mov = np.asarray(layout.movable())
    np.testing.assert_array_equal(mov, [1, 1, 1, 1, 1, 0, 0, 0, 0])


def test_gather_neighbors_dispatch_parity():
    """gather_neighbors must produce identical results in both regimes:
    one-hot matmul (small N, MXU path) and plain gather (large N, where the
    [B,I*K,N] one-hot operand would be ~N^2*K elements — 1.4GB fp32 at the
    DEFAULT whole-protein shapes)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fabind_tpu.ops import graph as G

    rng = np.random.default_rng(0)
    for N in (32, G._GATHER_MM_MAX_N + 7):   # one per regime
        v = jnp.asarray(rng.normal(size=(2, N, 5)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, N, size=(2, 6, 3)), jnp.int32)
        got = jax.jit(G.gather_neighbors)(v, idx)
        ref = jax.jit(G.gather_nodes_mm)(v, idx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)
        plain = jax.jit(G.gather_nodes)(v, idx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(plain),
                                   atol=1e-6)
