"""Parity tests for the Pallas interfacial-attention coord-gate kernel.

The kernel (ops/pallas/edge_gate.py) computes the rank-1-decomposed
coord_mlp gate of MC_Att_L (reference FABind/fabind/models/egnn.py:227-252)
without materializing the [B, D, N, H] pre-activation. On CPU we run it in
interpret mode and check it against the pure-jnp reference formulation that
the golden-parity suite already ties to the torch modules.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fabind_tpu.ops.pallas.edge_gate import (
    phi_rank1_pallas,
    phi_rank1_reference,
    phi_rank1_tpu,
)


def _inputs(key, B=2, D=13, N=21, H=48, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    l1_v = jax.random.normal(k1, (B, N, H), dtype)
    r = jax.random.normal(k2, (B, D, N), dtype)
    u = jax.random.normal(k3, (H,), dtype)
    w2 = jax.random.normal(k4, (H,), dtype)
    return l1_v, r, u, w2


@pytest.mark.parametrize("act", ["silu", "relu"])
@pytest.mark.parametrize("block_d", [4, 16])
def test_interpret_parity(act, block_d):
    args = _inputs(jax.random.PRNGKey(0))
    ref = phi_rank1_reference(*args, act=act)
    got = phi_rank1_pallas(*args, act=act, block_d=block_d, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_interpret_parity_ragged_grid():
    # D not a multiple of block_d exercises the padded trailing tile
    args = _inputs(jax.random.PRNGKey(1), D=7, N=11, H=32)
    ref = phi_rank1_reference(*args)
    got = phi_rank1_pallas(*args, block_d=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_reference_grad(monkeypatch):
    """phi_rank1_tpu's backward must equal the reference VJP (training on
    TPU differentiates through the kernel)."""
    import fabind_tpu.ops.pallas.edge_gate as eg
    # route the custom_vjp's forward through the interpreter so this runs
    # on CPU
    orig = eg.phi_rank1_pallas
    monkeypatch.setattr(
        eg, "phi_rank1_pallas",
        lambda *a, **k: orig(*a, interpret=True, **k))
    args = _inputs(jax.random.PRNGKey(2), B=1, D=5, N=9, H=16)

    def loss_tpu(*a):
        return jnp.sum(eg.phi_rank1_tpu(*a, "silu") ** 2)

    def loss_ref(*a):
        return jnp.sum(eg.phi_rank1_reference(*a, act="silu") ** 2)

    g_tpu = jax.grad(loss_tpu, argnums=(0, 1, 2, 3))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_tpu, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_mlpblock_rank1_path_matches_dense():
    """MLPBlock.finish_scalar_rank1 (the model's entry point) must equal
    materializing the pre-activation and calling finish_scalar."""
    from fabind_tpu.models.layers import MLPBlock

    H = 24
    mlp = MLPBlock(hidden_dim=H, out_dim=1, act="silu", bias_out=False)
    l1_v, r, u, _ = _inputs(jax.random.PRNGKey(3), B=2, D=6, N=10, H=H)
    variables = mlp.init(jax.random.PRNGKey(4), jnp.zeros((1, 1, H)))

    def rank1(vs):
        return mlp.apply(vs, l1_v, r, u, method="finish_scalar_rank1")

    def dense(vs):
        pre = l1_v[:, None, :, :] + r[..., None] * u
        return mlp.apply(vs, pre, method="finish_scalar")

    np.testing.assert_allclose(np.asarray(rank1(variables)),
                               np.asarray(dense(variables)),
                               rtol=1e-5, atol=1e-5)
