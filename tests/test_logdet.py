"""Estimator oracles (SURVEY.md §4: Hutchinson/Neumann vs slogdet on <=10-D)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_normalizing_flows_tpu.ops import (
    LogdetConfig,
    basic_logdet_estimator,
    brute_force_logdet,
    exact_trace_logdet,
    neumann_logdet_estimator,
    sample_n_dist,
    sample_rademacher,
)
from implicit_normalizing_flows_tpu.ops.logdet import geometric_1mcdf


def _mlp_apply(params, x):
    h = jnp.tanh(x @ params["w1"])
    return h @ params["w2"]


def _small_net(key, d=6, h=16, scale=0.4):
    k1, k2 = jax.random.split(key)
    # Contractive residual (Lipschitz < 1) so the power series converges.
    w1 = jax.random.normal(k1, (d, h)) / np.sqrt(d)
    w2 = jax.random.normal(k2, (h, d)) / np.sqrt(h)
    # normalize spectral norm of the product crude bound
    w1 = w1 * np.sqrt(scale)
    w2 = w2 * np.sqrt(scale)
    return {"w1": w1, "w2": w2}


def test_brute_force_matches_slogdet():
    key = jax.random.PRNGKey(0)
    params = _small_net(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 6))
    ld = brute_force_logdet(_mlp_apply, params, x)

    # independent oracle: explicit jacobian
    def F(xx):
        return xx + _mlp_apply(params, xx[None])[0]

    for i in range(5):
        J = jax.jacfwd(F)(x[i])
        _, expect = jnp.linalg.slogdet(J)
        np.testing.assert_allclose(float(ld[i]), float(expect), rtol=1e-4, atol=1e-5)


def test_exact_trace_series_converges_to_brute_force():
    key = jax.random.PRNGKey(2)
    params = _small_net(key, scale=0.2)
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 6))
    cap = 40
    coeffs = jnp.ones((cap,))  # plain truncated series, no roulette
    ld_series = exact_trace_logdet(_mlp_apply, params, x, coeffs)
    ld_exact = brute_force_logdet(_mlp_apply, params, x)
    np.testing.assert_allclose(np.asarray(ld_series), np.asarray(ld_exact), atol=1e-4)


def test_basic_estimator_unbiased():
    # Average the roulette Hutchinson estimator over many keys; must approach
    # the exact logdet (unbiasedness of the Russian-roulette series).
    cfg = LogdetConfig(n_exact_terms=2, series_cap=24, n_samples=1)
    params = _small_net(jax.random.PRNGKey(4), scale=0.25)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 6))
    exact = brute_force_logdet(_mlp_apply, params, x)

    @jax.jit
    def one(key):
        k1, k2 = jax.random.split(key)
        coeffs, n_power, _ = sample_n_dist(k1, cfg, 0.5, 2.0, train=True)
        eps = sample_rademacher(k2, x.shape)
        return basic_logdet_estimator(_mlp_apply, params, x, eps, coeffs)

    keys = jax.random.split(jax.random.PRNGKey(6), 600)
    ests = jax.vmap(one)(keys)
    mean = jnp.mean(ests, axis=0)
    stderr = jnp.std(ests, axis=0) / np.sqrt(len(keys))
    atol = max(4.0 * float(jnp.max(stderr)), 2e-2)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(exact), atol=atol)


def test_neumann_gradient_matches_basic_gradient():
    # The Neumann estimator's VALUE differs from logdet, but its parameter
    # gradient must equal the basic estimator's gradient in expectation
    # (reference README.md:33 caveat + implicit_block.py:429-438).
    cfg = LogdetConfig(n_exact_terms=2, series_cap=16)
    params = _small_net(jax.random.PRNGKey(7), scale=0.2)
    x = jax.random.normal(jax.random.PRNGKey(8), (4, 6))

    def grads(estimator, key):
        k1, k2 = jax.random.split(key)
        coeffs, n_power, _ = sample_n_dist(k1, cfg, 0.5, 2.0, train=True)
        eps = sample_rademacher(k2, x.shape)

        def loss(p):
            if estimator == "neumann":
                ld = neumann_logdet_estimator(_mlp_apply, p, x, eps, coeffs, n_power)
            else:
                ld = basic_logdet_estimator(_mlp_apply, p, x, eps, coeffs)
            return jnp.sum(ld)

        return jax.grad(loss)(params)

    keys = jax.random.split(jax.random.PRNGKey(9), 400)
    gn = jax.vmap(lambda k: grads("neumann", k))(keys)
    gb = jax.vmap(lambda k: grads("basic", k))(keys)
    for name in ("w1", "w2"):
        mn, mb = jnp.mean(gn[name], 0), jnp.mean(gb[name], 0)
        sd = jnp.std(gb[name], 0) / np.sqrt(len(keys))
        atol = max(5.0 * float(jnp.max(sd)), 5e-3)
        np.testing.assert_allclose(np.asarray(mn), np.asarray(mb), atol=atol)


def test_geometric_coeffs_exact_terms_are_one():
    cfg = LogdetConfig(n_exact_terms=4, series_cap=8)
    coeffs, n_power, n_samples = sample_n_dist(
        jax.random.PRNGKey(0), cfg, 0.5, 2.0, train=True
    )
    # First n_exact_terms coefficients are exactly 1 (always-evaluated terms).
    np.testing.assert_allclose(np.asarray(coeffs[:4]), 1.0)
    assert int(n_power) == int(jnp.max(n_samples)) + 4


def test_geometric_1mcdf_values():
    # P(n >= k) for geometric(p=0.5) on {1,2,...}: 1, 1/2, 1/4 ...
    ks = jnp.arange(1, 5)
    vals = geometric_1mcdf(0.5, ks, 0)
    np.testing.assert_allclose(np.asarray(vals), [1.0, 0.5, 0.25, 0.125])


def test_poisson_coeffs_match_reference_formula():
    """P(n >= k) for Poisson must match the reference's scalar recursion
    (implicit_block.py:474-483)."""
    import math

    from implicit_normalizing_flows_tpu.ops.logdet import poisson_1mcdf

    lamb, offset, cap = 2.0, 3, 12

    def ref_1mcdf(k):
        if k <= offset:
            return 1.0
        kk = k - offset
        s = 1.0
        for i in range(1, kk):
            s += lamb ** i / math.factorial(i)
        return 1.0 - np.exp(-lamb) * s

    ks = jnp.arange(1, cap + 1)
    ours = poisson_1mcdf(lamb, ks, offset, cap)
    expect = np.array([ref_1mcdf(int(k)) for k in ks])
    np.testing.assert_allclose(np.asarray(ours), expect, rtol=1e-5, atol=1e-6)


def test_sample_n_dist_poisson_runs():
    cfg = LogdetConfig(n_dist="poisson", n_exact_terms=2, series_cap=16)
    coeffs, n_power, n_samples = sample_n_dist(
        jax.random.PRNGKey(3), cfg, 0.5, 2.0, train=True
    )
    assert np.isfinite(np.asarray(coeffs)).all()
    np.testing.assert_allclose(np.asarray(coeffs[:2]), 1.0)


def test_final_form_jvp_matches_vjp(monkeypatch):
    """<J^T acc, eps> (vjp form) == <acc, J eps> (jvp form): value AND
    gradients, through the whole neumann estimator."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from implicit_normalizing_flows_tpu.ops import logdet as ld

    def apply_fn(params, x):
        h = jnp.tanh(x @ params["w1"]) * 0.5
        return h @ params["w2"]

    key = jax.random.PRNGKey(0)
    k1, k2, kx, ke = jax.random.split(key, 4)
    params = {"w1": jax.random.normal(k1, (6, 6)) * 0.3,
              "w2": jax.random.normal(k2, (6, 6)) * 0.3}
    x = jax.random.normal(kx, (3, 6))
    eps = jax.random.normal(ke, (3, 6))
    coeffs = jnp.ones((8,))

    def run():
        def loss(p, xx):
            est = ld.neumann_logdet_estimator(
                apply_fn, p, xx, eps, coeffs, jnp.asarray(5))
            return jnp.sum(est)
        return jax.value_and_grad(loss, argnums=(0, 1))(params, x)

    monkeypatch.setenv("IMNF_FINAL_FORM", "vjp")
    v1, g1 = run()
    monkeypatch.setenv("IMNF_FINAL_FORM", "jvp")
    v2, g2 = run()
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
