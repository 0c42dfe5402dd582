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
