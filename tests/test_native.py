"""Native C++ collator vs pure-python reference collator."""
import numpy as np
import pytest

from fabind_tpu.config import preset
from fabind_tpu.data.batching import build_sample, collate

from tests.test_data import make_raw


def test_native_collate_matches_python():
    try:
        from fabind_tpu.data.native import collate_native, get_lib
        get_lib()
    except Exception as e:  # no compiler in env
        pytest.skip(f"native lib unavailable: {e}")

    cfg = preset("fabind", max_ligand=16, max_pocket=32, max_protein=40,
                 bond_k=4)
    rng = np.random.RandomState(0)
    samples = []
    for i in range(3):
        s = build_sample(make_raw(seed=i), cfg, group="test", rng=rng)
        # native path consumes the raw edge list
        s["bond_edges"] = make_raw(seed=i)["bond_edges"]
        samples.append(s)

    a = collate(samples, cfg)
    b = collate_native(samples, cfg)
    import jax
    for name in a.__dataclass_fields__:
        va, vb = getattr(a, name), getattr(b, name)
        if va is None:
            assert vb is None
            continue
        va, vb = np.asarray(va), np.asarray(vb)
        if name == "bond_idx":
            # slot order may differ; compare as per-row sets with mask
            ma = np.asarray(a.bond_mask)
            mb = np.asarray(b.bond_mask)
            for bi in range(va.shape[0]):
                for i in range(va.shape[1]):
                    sa = set(va[bi, i][ma[bi, i]])
                    sb = set(vb[bi, i][mb[bi, i]])
                    assert sa == sb, (bi, i, sa, sb)
        elif name == "bond_mask":
            np.testing.assert_array_equal(va.sum(-1), vb.sum(-1))
        else:
            np.testing.assert_array_equal(va, vb, err_msg=name)


def test_native_pack_bonds_overflow_is_loud():
    """Degree above the bond_k bucket must raise SampleTooLarge, never ship
    a truncated neighbor table (the dedupe scan is bounded by K — an atom
    with more than K unique neighbors previously read out of bounds)."""
    import numpy as np
    import pytest
    from fabind_tpu.data.batching import SampleTooLarge
    from fabind_tpu.data import native

    try:
        native.get_lib()
    except Exception:
        pytest.skip("native collator unavailable")
    # star graph: atom 0 bonded to 1..6 (degree 6), duplicates included
    edges = []
    for j in range(1, 7):
        edges += [(0, j), (j, 0), (0, j)]
    edges = np.asarray(edges, np.int64)
    n = 7
    for Kb in (2, 4):   # well below degree 6
        bond_idx = np.zeros((1, n, Kb), np.int32)
        bond_mask = np.zeros((1, n, Kb), np.uint8)
        lib = native.get_lib()
        deg = lib.pack_bonds(native._i64(edges), edges.shape[0],
                             native._i32(bond_idx), native._u8(bond_mask),
                             0, n, Kb)
        assert deg > Kb, f"overflow must be reported (deg={deg}, Kb={Kb})"
    # degree within K still exact
    Kb = 8
    bond_idx = np.zeros((1, n, Kb), np.int32)
    bond_mask = np.zeros((1, n, Kb), np.uint8)
    deg = native.get_lib().pack_bonds(
        native._i64(edges), edges.shape[0], native._i32(bond_idx),
        native._u8(bond_mask), 0, n, Kb)
    assert deg == 6
    assert sorted(bond_idx[0, 0, :6].tolist()) == [1, 2, 3, 4, 5, 6]
    assert bond_mask[0, 0, :6].all() and not bond_mask[0, 0, 6:].any()
