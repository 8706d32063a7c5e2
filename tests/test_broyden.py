"""Solver oracles (SURVEY.md §4: Broyden vs analytic roots)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_normalizing_flows_tpu.ops import broyden, fixed_point_iteration, root_solve


def test_linear_root():
    # g(x) = A x - b with A = I + small contraction => unique root per example.
    key = jax.random.PRNGKey(0)
    B, D = 4, 16
    k1, k2 = jax.random.split(key)
    M = jax.random.normal(k1, (D, D)) * (0.5 / np.sqrt(D))
    A = jnp.eye(D) + M
    b = jax.random.normal(k2, (B, D))
    x_star = jnp.linalg.solve(A, b.T).T

    g = lambda x: x @ A.T - b
    res = broyden(g, jnp.zeros((B, D)), threshold=60, eps=1e-7)
    np.testing.assert_allclose(np.asarray(res.result), np.asarray(x_star), atol=1e-3)
    assert bool(jnp.all(res.converged))
    assert not bool(jnp.any(res.prot_break))


def test_elementwise_nonlinear_root():
    # x + 0.5*tanh(x) = c  (monotone, contraction residual)
    B, D = 3, 8
    c = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    g = lambda x: x + 0.5 * jnp.tanh(x) - c
    res = broyden(g, jnp.zeros((B, D)), threshold=40, eps=1e-8)
    gx = g(res.result)
    assert float(jnp.max(jnp.abs(gx))) < 1e-5


def test_per_example_masking_freezes_converged_rows():
    # Row 0 starts at the root (converged immediately); row 1 needs iterations.
    D = 4
    c = jnp.stack([jnp.zeros(D), jnp.ones(D)])
    g = lambda x: x - c
    x0 = jnp.stack([jnp.zeros(D), jnp.zeros(D)])  # row 0 already solves g=0
    res = broyden(g, x0, threshold=20, eps=1e-6)
    np.testing.assert_allclose(np.asarray(res.result[0]), np.zeros(D), atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.result[1]), np.ones(D), atol=1e-5)
    assert int(res.best_step[0]) == 0  # never moved


def test_jit_and_no_host_sync():
    g = lambda x: x + 0.3 * jnp.sin(x) - 1.0
    f = jax.jit(lambda x0: broyden(g, x0, threshold=30, eps=1e-7).result)
    out = f(jnp.zeros((2, 5)))
    assert float(jnp.max(jnp.abs(out + 0.3 * jnp.sin(out) - 1.0))) < 1e-5


def test_fixed_point_iteration():
    # x = cos(x) has fixed point ~0.739085
    g = lambda x: jnp.cos(x)
    y = jnp.full((2, 3), 0.5)
    x = fixed_point_iteration(g, y, threshold=500, eps=1e-7)
    np.testing.assert_allclose(np.asarray(x), 0.7390851, atol=1e-3)


def test_root_solve_banach_fallback():
    # A residual whose Broyden iterates explode: g(x) = exp(5(x - c)) - 1 from
    # far away diverges under full Newton-ish steps but the contraction map
    # x <- c + 0.5*sin(x - c) converges; prot_break rows take the fallback.
    c = jnp.ones((2, 3)) * 0.2
    g = lambda x: 2.0 * (x - c)  # benign; root x = c
    banach_g = lambda x: c + 0.0 * x
    z, res = root_solve(g, banach_g, jnp.zeros_like(c), threshold=25, eps=1e-7, banach_x0=jnp.zeros_like(c))
    np.testing.assert_allclose(np.asarray(z), np.asarray(c), atol=1e-5)


def test_stall_guard_blocks_far_from_root_stalls():
    # A slow-linear-convergence residual: per-iteration improvement under
    # pure Picard would be ~5%; without a guard the monotone-window stall
    # (patience 5, rtol 0.3 here to force it) freezes rows far from the
    # root, with guard=3 the stall may only fire within 3x tolerance
    # (reference broyden.py:165-168 semantics).
    B, D = 2, 6
    c = jnp.ones((B, D))
    # residual with Jacobian -(I + 0.9) .. slow crawl for Broyden's first steps
    g = lambda x: 0.02 * (c - x)  # tiny gradient => tiny steps initially
    unguarded = broyden(g, jnp.zeros((B, D)), threshold=60, eps=1e-9,
                        stall_patience=5, stall_rtol=0.9)
    guarded = broyden(g, jnp.zeros((B, D)), threshold=60, eps=1e-9,
                      stall_patience=5, stall_rtol=0.9, stall_guard=3.0)
    # with rtol 0.9 ("must improve 10x per 5-iter window") the unguarded
    # solve freezes early and far from the root; the guarded one cannot
    # freeze until within 3x eps, so it converges.
    assert bool(jnp.all(guarded.converged))
    assert float(jnp.max(guarded.diff)) <= float(jnp.max(unguarded.diff))


def test_newton_init_same_root_fewer_or_equal_steps():
    # Residual with Jacobian ~ -(I + J), |J|<1 (the implicit-block form):
    # g(z) = b - 0.5*tanh(z) - z. newton_init takes +g first instead of -g;
    # both must reach the same root (criterion-pinned).
    B, D = 4, 12
    b = jax.random.normal(jax.random.PRNGKey(3), (B, D))
    g = lambda z: b - 0.5 * jnp.tanh(z) - z
    ref = broyden(g, jnp.zeros((B, D)), threshold=40, eps=1e-6,
                  keep_trace=True)
    newt = broyden(g, jnp.zeros((B, D)), threshold=40, eps=1e-6,
                   newton_init=True, keep_trace=True)
    assert bool(jnp.all(ref.converged)) and bool(jnp.all(newt.converged))
    np.testing.assert_allclose(np.asarray(ref.result), np.asarray(newt.result),
                               atol=1e-5)
    # the -g first step moves away from the root (objective grows); +g shrinks
    assert float(jnp.max(newt.trace[1])) < float(jnp.min(ref.trace[1]))


def test_armijo_line_search_same_root_and_tames_overshoot():
    # Steep residual where full Broyden steps overshoot badly: Armijo rows
    # must still reach the same root, and never blow past the protective
    # break on the way (reference ls option, broyden.py:24-99).
    B, D = 3, 6
    c = jax.random.normal(jax.random.PRNGKey(5), (B, D))
    g = lambda x: 5.0 * jnp.tanh(x - c)  # Jacobian up to 5I: s=1 overshoots
    plain = broyden(g, jnp.zeros((B, D)), threshold=60, eps=1e-6,
                    keep_trace=True)
    ls = broyden(g, jnp.zeros((B, D)), threshold=60, eps=1e-6,
                 line_search=True, keep_trace=True)
    # on this residual the plain solver converges NO rows (full steps keep
    # overshooting, best objective ~7); Armijo rows converge to the root
    n_plain = int(jnp.sum(plain.converged))
    n_ls = int(jnp.sum(ls.converged))
    assert n_ls > n_plain
    conv = np.asarray(ls.converged)
    np.testing.assert_allclose(np.asarray(ls.result)[conv],
                               np.asarray(c)[conv], atol=1e-4)
    assert float(jnp.max(ls.diff)) < float(jnp.min(plain.diff))
    # the line search keeps the worst transient objective no bigger than the
    # plain solver's
    assert float(jnp.max(ls.trace)) <= float(jnp.max(plain.trace)) + 1e-6


def test_line_search_noop_on_easy_problem():
    # contraction-dominated residual: s=1 always passes Armijo, so the LS
    # solver must match the plain iterate path exactly (the extra-eval branch
    # never executes)
    B, D = 2, 8
    b = jax.random.normal(jax.random.PRNGKey(6), (B, D))
    g = lambda z: b - 0.3 * jnp.tanh(z) - z
    plain = broyden(g, jnp.zeros((B, D)), threshold=30, eps=1e-7)
    ls = broyden(g, jnp.zeros((B, D)), threshold=30, eps=1e-7,
                 line_search=True)
    np.testing.assert_allclose(np.asarray(plain.result), np.asarray(ls.result),
                               atol=1e-6)
    assert int(plain.nstep) == int(ls.nstep)


def test_analyze_broyden_and_triage():
    from implicit_normalizing_flows_tpu.ops.broyden import (analyze_broyden,
                                                            triage_metrics)

    # healthy solve
    g = lambda x: x + 0.3 * jnp.sin(x) - 1.0
    ok = broyden(g, jnp.zeros((2, 5)), threshold=30, eps=1e-7)
    assert analyze_broyden(ok) is False
    code, _ = analyze_broyden(ok, judge=False)
    assert code == -1

    # classifier codes on synthetic outcomes (the reference's analyze_broyden
    # classes: 1=nan result, 2=bad solve, 3=protective break)
    prot = ok._replace(prot_break=jnp.ones((2,), bool))
    assert analyze_broyden(prot) is True
    code, msg = analyze_broyden(prot, judge=False)
    assert code == 3 and "Protective Break" in msg
    nan = ok._replace(result=ok.result.at[0, 0].set(jnp.nan))
    code, msg = analyze_broyden(nan, judge=False)
    assert code == 1 and "nan" in msg

    # driver-side triage from aggregated step metrics
    assert triage_metrics({"broyden_prot_break": 0.0}) is None
    warn = triage_metrics({"broyden_prot_break": 1.0, "broyden_nstep": 12.0,
                           "broyden_converged": 0.9})
    assert warn and "Protective Break" in warn


def test_sharded_batch_runs():
    # The solve must compile and run with the batch sharded over 8 CPU devices.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices())
    assert devs.size == 8, "conftest should force 8 host devices"
    mesh = Mesh(devs, ("data",))
    g = lambda x: x + 0.5 * jnp.tanh(x) - 1.0
    x0 = jnp.zeros((16, 8))
    sharding = NamedSharding(mesh, P("data", None))
    x0 = jax.device_put(x0, sharding)
    f = jax.jit(lambda x: broyden(g, x, threshold=30, eps=1e-7).result)
    out = f(x0)
    assert float(jnp.max(jnp.abs(g(out)))) < 1e-5
