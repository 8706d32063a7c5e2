"""Lane-packing ("reps") parity: each fused Pallas kernel must produce the
same result whether examples run one per program (reps=1) or lane-packed
(reps>1). Packing only changes the tiling — the per-example border masks and
segment reductions must make the math identical up to reduction order.

Runs the kernels in interpreter mode on CPU (same harness as the other
fused-kernel tests).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_normalizing_flows_tpu.ops.fused_chain import (

    choose_reps,
    pack_reps,
    unpack_reps,
)


def test_pack_unpack_roundtrip():
    a = jax.random.normal(jax.random.PRNGKey(0), (8, 5, 16))
    for reps in (1, 2, 4, 8):
        b = unpack_reps(pack_reps(a, reps), reps)
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_pack_layout_concatenates_consecutive_examples():
    a = jnp.arange(2 * 1 * 3).reshape(2, 1, 3).astype(jnp.float32)
    p = pack_reps(a, 2)
    assert p.shape == (1, 1, 6)
    np.testing.assert_array_equal(np.asarray(p[0, 0]),
                                  np.asarray(a.reshape(-1)))


def test_choose_reps_divisibility(monkeypatch):
    # default target 256: pack only the 8x8 scale (4 examples)
    assert choose_reps(64, 8, 8) == 4
    assert choose_reps(64, 16, 16) == 1
    assert choose_reps(64, 32, 32) == 1
    assert choose_reps(2, 8, 8) == 2
    assert choose_reps(1, 8, 8) == 1
    monkeypatch.setenv("IMNF_FUSED_PACK_LANES", "1024")
    assert choose_reps(64, 8, 8) == 16
    assert choose_reps(64, 16, 16) == 4
    assert choose_reps(6, 8, 8) == 6   # 16 -> largest divisor of 6


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _chain_inputs(key, B, c, mid, H, W):
    ks = jax.random.split(key, 8)
    w1 = jax.random.normal(ks[0], (mid, c, 3, 3)) * 0.2
    w2 = jax.random.normal(ks[1], (mid, mid, 1, 1)) * 0.1
    w3 = jax.random.normal(ks[2], (c, mid, 3, 3)) * 0.2
    eps = jax.random.normal(ks[3], (B, c, H, W))
    s0 = jax.nn.sigmoid(jax.random.normal(ks[4], (B, c, H, W)))
    s1 = jax.nn.sigmoid(jax.random.normal(ks[5], (B, mid, H, W)))
    s2 = jax.nn.sigmoid(jax.random.normal(ks[6], (B, mid, H, W)))
    return (s0, s1, s2, w1, w2, w3), eps


@pytest.mark.parametrize("reps", [2, 4])
def test_chain_accs_reps_parity(reps):
    from implicit_normalizing_flows_tpu.ops.logdet import neumann_pair_accs

    B, c, mid, H, W = 4, 3, 8, 4, 4
    cx, ex = _chain_inputs(jax.random.PRNGKey(0), B, c, mid, H, W)
    cz, ez = _chain_inputs(jax.random.PRNGKey(1), B, c, mid, H, W)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, c, H, W))
    z = jax.random.normal(jax.random.PRNGKey(3), (B, c, H, W))
    coeffs = jnp.array([1.0, 1.0, 0.7, 0.4, 0.0, 0.0])
    n_power = jnp.asarray(4, jnp.int32)

    a1 = neumann_pair_accs(x, ex, z, ez, cx, cz, coeffs, n_power,
                           interpret=True, reps=1)
    a2 = neumann_pair_accs(x, ex, z, ez, cx, cz, coeffs, n_power,
                           interpret=True, reps=reps)
    for u, v in zip(a1, a2):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=2e-5, atol=2e-5)


def _solve_data(key, c, mid, preact):
    ks = jax.random.split(key, 7)
    return {
        "w1": jax.random.normal(ks[0], (mid, c, 3, 3)) * 0.1,
        "w2": jax.random.normal(ks[1], (mid, mid, 1, 1)) * 0.05,
        "w3": jax.random.normal(ks[2], (c, mid, 3, 3)) * 0.1,
        "b1": jax.random.normal(ks[3], (mid,)) * 0.1,
        "b2": jax.random.normal(ks[4], (mid,)) * 0.1,
        "b3": jax.random.normal(ks[5], (c,)) * 0.1,
        "betas": jnp.ones((3,)),
        "preact": preact,
    }


@pytest.mark.parametrize("reps", [2, 4])
def test_fused_broyden_solve_reps_parity(reps):
    from implicit_normalizing_flows_tpu.ops.fused_solve import (
        fused_broyden_solve,
    )

    B, c, mid, H, W = 4, 3, 8, 4, 4
    data_x = _solve_data(jax.random.PRNGKey(0), c, mid, True)
    data_z = _solve_data(jax.random.PRNGKey(1), c, mid, True)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, c, H, W)) * 0.5

    kw = dict(threshold=12, eps=1e-6, stall_patience=5, stall_rtol=0.05,
              warm_start=True, mode="f32", interpret=True)
    r1 = fused_broyden_solve(x, data_x, data_z, reps=1, **kw)
    r2 = fused_broyden_solve(x, data_x, data_z, reps=reps, **kw)

    # same root within the solve tolerance (trajectories may differ in the
    # last ulps because the packed reductions re-associate floats)
    np.testing.assert_allclose(np.asarray(r2.result), np.asarray(r1.result),
                               rtol=1e-4, atol=1e-5)
    assert bool(jnp.all(r1.converged)) and bool(jnp.all(r2.converged))
    np.testing.assert_allclose(np.asarray(r2.nstep), np.asarray(r1.nstep),
                               atol=2)
    assert not bool(jnp.any(r2.prot_break))


@pytest.mark.parametrize("reps", [2, 4])
def test_fused_backward_solve_reps_parity(reps):
    from implicit_normalizing_flows_tpu.ops.fused_solve import (
        fused_backward_solve,
    )

    B, c, mid, H, W = 4, 3, 8, 4, 4
    (s0, s1, s2, w1, w2, w3), _ = _chain_inputs(
        jax.random.PRNGKey(0), B, c, mid, H, W)
    # contractive scaling so (I + J) is well conditioned
    chain = (0.5 * s0, 0.5 * s1, 0.5 * s2, w1, w2, w3)
    grad = jax.random.normal(jax.random.PRNGKey(1), (B, c, H, W))

    kw = dict(threshold=10, eps=1e-8, stall_patience=5, stall_rtol=0.05,
              mode="f32", interpret=True)
    u1 = fused_backward_solve(grad, chain, reps=1, **kw)
    u2 = fused_backward_solve(grad, chain, reps=reps, **kw)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reps", [2, 4])
def test_fused_reattach_vjp_reps_parity(reps):
    from implicit_normalizing_flows_tpu.ops.fused_solve import (
        fused_reattach_vjp,
    )

    B, c, mid, H, W = 4, 3, 8, 4, 4
    data_x = _solve_data(jax.random.PRNGKey(0), c, mid, True)
    data_z = _solve_data(jax.random.PRNGKey(1), c, mid, False)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, c, H, W))
    zh = jax.random.normal(jax.random.PRNGKey(3), (B, c, H, W))
    u = jax.random.normal(jax.random.PRNGKey(4), (B, c, H, W))

    o1 = fused_reattach_vjp(x, zh, u, data_x, data_z, mode="f32",
                            interpret=True, reps=1)
    o2 = fused_reattach_vjp(x, zh, u, data_x, data_z, mode="f32",
                            interpret=True, reps=reps)
    for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("reps", [2, 4])
def test_fused_final_pair_reps_parity(reps):
    from implicit_normalizing_flows_tpu.ops.fused_solve import (
        fused_final_pair,
    )

    B, c, mid, H, W = 4, 3, 8, 4, 4
    data_x = _solve_data(jax.random.PRNGKey(0), c, mid, True)
    data_z = _solve_data(jax.random.PRNGKey(1), c, mid, True)
    keys = jax.random.split(jax.random.PRNGKey(2), 6)
    x, z, ex, ez, ax, az = [
        jax.random.normal(k, (B, c, H, W)) for k in keys]

    strip = lambda d: {k: v for k, v in d.items() if k != "preact"}

    def run(reps):
        def f(dx, dz, xx, zz):
            dx = dict(dx, preact=True)
            dz = dict(dz, preact=True)
            tx, tz = fused_final_pair(dx, dz, xx, zz, ex, ez, ax, az,
                                      mode="f32", interpret=True, reps=reps)
            return jnp.sum(tx * jnp.arange(1.0, B + 1)
                           + tz * jnp.arange(2.0, B + 2)), (tx, tz)
        (val, (tx, tz)), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2, 3), has_aux=True)(
            strip(data_x), strip(data_z), x, z)
        return (val, tx, tz), grads

    (v1, tx1, tz1), g1 = run(1)
    (v2, tx2, tz2), g2 = run(reps)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tx2), np.asarray(tx1), rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(tz2), np.asarray(tz1), rtol=2e-5,
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-5)

# CPU Pallas interpreter: minutes per file; excluded from the fast CI subset
pytestmark = [pytest.mark.slow, pytest.mark.kernels]
