"""Pallas TPU kernels for the Broyden hot loop.

The per-iteration low-rank stage (rank-1 secant update + next direction,
reference einsum chain ``broyden.py:174-181``) is HBM-bound: the U and V
panels (B, D, K) dominate traffic. The XLA path streams them twice each; this
kernel loads each panel into VMEM once per example and performs every
contraction, the column write, and the new direction in one pass.

Per-example VMEM footprint is 2*D*K*4 bytes (+ small vectors); the caller
falls back to the XLA path when that exceeds the budget or when not running
on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def fused_update_supported(bsz: int, dim: int, k: int) -> bool:
    return 2 * dim * k * 4 <= _VMEM_BUDGET_BYTES


def _kernel(col_ref, us_ref, vts_ref, dx_ref, dgx_ref, gx_ref, act_ref,
            us_out_ref, vts_out_ref, upd_ref):
    us = us_ref[0]             # (D, K)
    vts = vts_ref[0]           # (K, D)
    dx = dx_ref[0, 0][:, None]    # (D, 1)
    dgx = dgx_ref[0, 0][:, None]  # (D, 1)
    gx = gx_ref[0, 0][:, None]    # (D, 1)
    active = act_ref[0, 0, 0]
    col = col_ref[0]

    f32 = jnp.float32
    # VT @ [dgx, gx] and U @ (.) — single pass over each panel.
    rhs = jnp.concatenate([dgx, gx], axis=1)                      # (D, 2)
    vtx = jax.lax.dot_general(vts, rhs, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)          # (K, 2)
    uvx = jax.lax.dot_general(us, vtx, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)          # (D, 2)
    matvec_dgx = -dgx[:, 0] + uvx[:, 0]
    matvec_gx = -gx[:, 0] + uvx[:, 1]

    xtu = jax.lax.dot_general(dx, us, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)          # (1, K)
    vT = -dx[:, 0] + jax.lax.dot_general(
        xtu, vts, (((1,), (0,)), ((), ())),
        preferred_element_type=f32)[0]                             # (D,)

    denom = jnp.sum(vT * dgx[:, 0])
    u = (dx[:, 0] - matvec_dgx) / denom
    vT = jnp.where(jnp.isfinite(vT), vT, 0.0) * active
    u = jnp.where(jnp.isfinite(u), u, 0.0) * active

    # Mosaic cannot store at a dynamic lane index; the target column/row is
    # zero by construction (each K-slot written exactly once), so a masked
    # outer-product add is an exact equivalent of the dynamic set.
    K = us.shape[1]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) == col).astype(us.dtype)
    us_out_ref[0] = us + u[:, None] * onehot              # (D, K)
    vts_out_ref[0] = vts + onehot.reshape(K, 1) * vT[None, :]  # (K, D)
    upd_ref[0, 0] = -matvec_gx - u * jnp.sum(vT * gx[:, 0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_broyden_update(Us, VTs, delta_x, delta_gx, gx, active, col,
                         interpret=False):
    """Returns (Us', VTs', update) — the fused equivalent of the XLA path in
    ``ops.broyden`` (same math bit-for-bit up to reassociation)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D, K = Us.shape
    # Mosaic block rule: the last two block dims must be divisible by (8,
    # 128) or equal the array dims — so vectors carry a singleton sublane
    # axis (B, 1, D) and use full-row blocks.
    vec = lambda a: a.reshape(B, 1, D)
    act_f = active.astype(jnp.float32).reshape(B, 1, 1)
    col_arr = jnp.asarray([col], jnp.int32).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, D, K), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, K, D), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i, c: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, D, K), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, K, D), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda i, c: (i, 0, 0)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct(Us.shape, Us.dtype),
        jax.ShapeDtypeStruct(VTs.shape, VTs.dtype),
        jax.ShapeDtypeStruct((B, 1, D), gx.dtype),
    ]
    us2, vts2, upd = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(col_arr, Us, VTs, vec(delta_x), vec(delta_gx), vec(gx), act_f)
    return us2, vts2, upd.reshape(B, D)
