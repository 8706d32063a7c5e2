"""Implicit block oracles: inverse-of-forward round trips, exact logdet vs
slogdet on 2-D, and the custom-VJP implicit gradient vs finite differences
(SURVEY.md §4)."""
import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_normalizing_flows_tpu.layers import (
    ImplicitBlock,
    InducedNormDense,
    LipschitzNet,
    Sin,
)


def _toy_net(key, dim=2, hidden=32, coeff=0.9):
    layers = [
        InducedNormDense(dim, hidden, coeff=coeff, domain=2, codomain=2, n_iterations=50),
        Sin(),
        InducedNormDense(hidden, dim, coeff=coeff, domain=2, codomain=2, n_iterations=50),
    ]
    return LipschitzNet(layers)


def _make_block(key, dim=2, brute_force=True, **kw):
    k1, k2 = jax.random.split(key)
    net_x = _toy_net(k1, dim)
    net_z = _toy_net(k2, dim)
    block = ImplicitBlock(net_x, net_z, brute_force=brute_force,
                          neumann_grad=False, grad_in_forward=False, **kw)
    return block


def test_forward_solves_fixed_point():
    key = jax.random.PRNGKey(0)
    block = _make_block(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    v = block.init(jax.random.PRNGKey(2), x)
    z, _, _ = block.forward(v, x, None)
    # z + g_z(z) == x + g_x(x)
    vx = {"params": v["params"]["nnet_x"], "state": v["state"]["nnet_x"]}
    vz = {"params": v["params"]["nnet_z"], "state": v["state"]["nnet_z"]}
    lhs = z + block.nnet_z.apply(vz, z)
    rhs = x + block.nnet_x.apply(vx, x)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=5e-4)


def test_roundtrip_inverse_forward():
    key = jax.random.PRNGKey(3)
    block = _make_block(key)
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 2))
    v = block.init(jax.random.PRNGKey(5), x)
    z, _, _ = block.forward(v, x, None)
    x_rec, _ = block.inverse(v, z)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)


def test_brute_force_logdet_consistency():
    """Change of variables must integrate: compare block logdet to numerical
    jacobian of the full map x -> z."""
    key = jax.random.PRNGKey(6)
    block = _make_block(key)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 2))
    v = block.init(jax.random.PRNGKey(8), x)
    z, neg_logdet, _ = block.forward(v, x, jnp.zeros(x.shape[0]), train=True)
    logdet = -np.asarray(neg_logdet)  # threading: logpx - logdet

    fwd = lambda xx: block.forward(v, xx[None], None)[0][0]
    for i in range(x.shape[0]):
        J = jax.jacrev(fwd)(x[i])
        _, expect = jnp.linalg.slogdet(J)
        np.testing.assert_allclose(logdet[i], float(expect), atol=2e-3)


def test_implicit_gradient_matches_finite_differences():
    key = jax.random.PRNGKey(9)
    block = _make_block(key)
    x = jax.random.normal(jax.random.PRNGKey(10), (4, 2))
    v = block.init(jax.random.PRNGKey(11), x)

    def loss(params):
        vv = {"params": params, "state": v["state"]}
        z, _, _ = block.forward(vv, x, None)
        return jnp.sum(z ** 2)

    g = jax.grad(loss)(v["params"])

    # Finite-difference check on a few random coordinates of each net.
    flat, unravel = jax.flatten_util.ravel_pytree(v["params"])
    gflat, _ = jax.flatten_util.ravel_pytree(g)
    rng = np.random.RandomState(0)
    idxs = rng.choice(flat.shape[0], size=12, replace=False)
    # f32 central differences: step large enough that the loss delta clears
    # float32 rounding noise, small enough for curvature error ~ eps^2.
    eps = 3e-3
    for i in idxs:
        fp = loss(unravel(flat.at[i].add(eps)))
        fm = loss(unravel(flat.at[i].add(-eps)))
        fd = (fp - fm) / (2 * eps)
        np.testing.assert_allclose(float(gflat[i]), float(fd), rtol=3e-2, atol=3e-3)


def test_gradient_of_full_logprob_matches_fd():
    """End-to-end: grad of -(logpz - delta_logp) w.r.t. params vs finite
    differences, with the exact (brute force) logdet so the loss is
    deterministic."""
    key = jax.random.PRNGKey(12)
    block = _make_block(key)
    x = jax.random.normal(jax.random.PRNGKey(13), (4, 2))
    v = block.init(jax.random.PRNGKey(14), x)

    def loss(params):
        vv = {"params": params, "state": v["state"]}
        z, delta, _ = block.forward(vv, x, jnp.zeros(x.shape[0]), train=True)
        logpz = jnp.sum(-0.5 * np.log(2 * np.pi) - z ** 2 / 2, axis=1)
        return -jnp.mean(logpz - delta)

    g = jax.grad(loss)(v["params"])
    flat, unravel = jax.flatten_util.ravel_pytree(v["params"])
    gflat, _ = jax.flatten_util.ravel_pytree(g)
    rng = np.random.RandomState(1)
    idxs = rng.choice(flat.shape[0], size=8, replace=False)
    eps = 3e-3
    for i in idxs:
        fp = loss(unravel(flat.at[i].add(eps)))
        fm = loss(unravel(flat.at[i].add(-eps)))
        fd = (fp - fm) / (2 * eps)
        np.testing.assert_allclose(float(gflat[i]), float(fd), rtol=3e-2, atol=3e-3)


def test_warm_start_same_root():
    """warm_start changes iteration count only, not the solution."""
    key = jax.random.PRNGKey(30)
    k1, k2 = jax.random.split(key)
    cold = ImplicitBlock(_toy_net(k1), _toy_net(k2), brute_force=True,
                         neumann_grad=False, grad_in_forward=False)
    warm = ImplicitBlock(cold.nnet_x, cold.nnet_z, brute_force=True,
                         neumann_grad=False, grad_in_forward=False,
                         warm_start=True)
    x = jax.random.normal(jax.random.PRNGKey(31), (8, 2))
    v = cold.init(jax.random.PRNGKey(32), x)
    z_cold, _, _ = cold.forward(v, x, None)
    z_warm, _, _ = warm.forward(v, x, None)
    np.testing.assert_allclose(np.asarray(z_cold), np.asarray(z_warm), atol=1e-4)
