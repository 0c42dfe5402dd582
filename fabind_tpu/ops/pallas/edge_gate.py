"""Pallas TPU kernel for the interfacial-attention coordinate gate.

The reference MC_Att_L coordinate path (FABind/fabind/models/egnn.py:227-252)
applies `coord_mlp` to every edge value `v_edge = v_node[src] + radial * v_r`
and keeps only the scalar output. In the dense decomposed formulation
(models/egnn.py InterAttention.direction) this is

    phi[b, d, n] = sum_h w2[h] * act(l1_v[b, n, h] + r[b, d, n] * u[h])

where l1_v = coord_mlp.linear1(v_node) is a per-node matmul and (u, w2) are
rank-1 corrections. XLA lowers the trailing H->1 contraction onto the MXU as
a [*, H] @ [H, 1] dot — 1 useful column out of 128 (~1/128 MXU efficiency,
profiled at ~0.30 ms per call on shapes [8, 97, 161, 512]) — and schedules a
[B, D, N, H] intermediate through VMEM. This kernel instead evaluates the
broadcast + activation + reduction on the VPU over VMEM-resident tiles:
l1_v[b] stays in VMEM for all D-tiles of a batch row, nothing of size
[D, N, H] ever exists outside registers/VMEM scratch.

Used only on TPU for the non-LayerNorm (decomposable) configs; everywhere
else the pure-jnp reference below is the implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

_ACTS = {"silu": jax.nn.silu, "relu": jax.nn.relu}


def phi_rank1_reference(l1_v: Array, r: Array, u: Array, w2: Array,
                        act: str = "silu") -> Array:
    """Pure-jnp reference: [B,N,H], [B,D,N], [H], [H] -> [B,D,N]."""
    pre = l1_v[:, None, :, :] + r[..., None] * u
    return jnp.einsum("bdnh,h->bdn", _ACTS[act](pre), w2)


def _kernel(l1_v_ref, r_ref, u_ref, w2_ref, out_ref, *, act: str):
    # l1_v_ref: [1, N, H]; r_ref/out_ref: [1, TD, N]; u/w2: [1, H]
    v = l1_v_ref[0].astype(jnp.float32)                   # [N, H]
    r = r_ref[0].astype(jnp.float32)                      # [TD, N]
    u = u_ref[0].astype(jnp.float32)                      # [H]
    w2 = w2_ref[0].astype(jnp.float32)
    pre = v[None, :, :] + r[:, :, None] * u[None, None, :]
    gated = _ACTS[act](pre) * w2[None, None, :]
    out_ref[0] = jnp.sum(gated, axis=-1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "block_d", "interpret"))
def phi_rank1_pallas(l1_v: Array, r: Array, u: Array, w2: Array,
                     act: str = "silu", block_d: int = 16,
                     interpret: bool = False) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, H = l1_v.shape
    D = r.shape[1]
    block_d = min(block_d, D)
    grid = (B, pl.cdiv(D, block_d))
    return pl.pallas_call(
        functools.partial(_kernel, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, H), lambda b, d: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_d, N), lambda b, d: (b, d, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda b, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda b, d: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_d, N), lambda b, d: (b, d, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, N), r.dtype),
        interpret=interpret,
    )(l1_v, r, u.reshape(1, H), w2.reshape(1, H))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def phi_rank1_tpu(l1_v: Array, r: Array, u: Array, w2: Array,
                  act: str = "silu") -> Array:
    """Pallas forward with the jnp reference's VJP as the backward rule.

    pallas_call has no autodiff rule; the backward of this op is cheap
    (one fused elementwise pass XLA handles well), so the custom_vjp
    recomputes the pre-activation from the saved inputs and differentiates
    the reference formulation. Forward stays HBM-free on TPU; training
    through it is exact up to reduction order.
    """
    return phi_rank1_pallas(l1_v, r, u, w2, act=act)


def _phi_fwd(l1_v, r, u, w2, act):
    return phi_rank1_pallas(l1_v, r, u, w2, act=act), (l1_v, r, u, w2)


def _phi_bwd(act, res, g):
    _, vjp = jax.vjp(
        lambda *a: phi_rank1_reference(*a, act=act), *res)
    return vjp(g)


phi_rank1_tpu.defvjp(_phi_fwd, _phi_bwd)


# NOTE: the production dispatch lives in MLPBlock.finish_scalar_rank1
# (models/layers.py) — it carries extra guards (active dropout,
# is_initializing, act whitelist) a bare dispatcher here could not, so no
# second dispatch function is exported from this module.
