"""Fused Broyden update kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from implicit_normalizing_flows_tpu.ops.broyden import _matvec, _rmatvec
from implicit_normalizing_flows_tpu.ops.pallas_kernels import fused_broyden_update


def _xla_reference(Us, VTs, delta_x, delta_gx, gx, active, col):
    act = active[:, None]
    vT = _rmatvec(Us, VTs, delta_x)
    denom = jnp.einsum("bd,bd->b", vT, delta_gx)[:, None]
    u = (delta_x - _matvec(Us, VTs, delta_gx)) / denom
    vT = jnp.where(jnp.isfinite(vT), vT, 0.0)
    u = jnp.where(jnp.isfinite(u), u, 0.0)
    u = jnp.where(act, u, 0.0)
    vT = jnp.where(act, vT, 0.0)
    Us2 = Us.at[:, :, col].set(u)
    VTs2 = VTs.at[:, col, :].set(vT)
    update = -_matvec(Us2, VTs2, gx)
    return Us2, VTs2, update


def test_fused_update_matches_xla():
    key = jax.random.PRNGKey(0)
    B, D, K = 3, 64, 8
    ks = jax.random.split(key, 6)
    Us = jax.random.normal(ks[0], (B, D, K)) * 0.1
    VTs = jax.random.normal(ks[1], (B, K, D)) * 0.1
    # zero out "unused" columns beyond col like the real solver state
    col = 5
    Us = Us.at[:, :, col:].set(0.0)
    VTs = VTs.at[:, col:, :].set(0.0)
    delta_x = jax.random.normal(ks[2], (B, D))
    delta_gx = jax.random.normal(ks[3], (B, D))
    gx = jax.random.normal(ks[4], (B, D))
    active = jnp.array([True, True, False])

    ref = _xla_reference(Us, VTs, delta_x, delta_gx, gx, active, col)
    out = fused_broyden_update(Us, VTs, delta_x, delta_gx, gx, active, col,
                               interpret=True)
    for r, o, name in zip(ref, out, ("Us", "VTs", "update")):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-4,
                                   err_msg=name)
