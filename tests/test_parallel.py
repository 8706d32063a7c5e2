"""Mesh/sharding unit tests beyond the end-to-end N-chip parity check in
test_toy_train.py: the Hutchinson probe axis must land on the mesh 'trace'
axis when a mesh is active (SURVEY.md §2.5; the reference has no analogue —
its only parallelism is DataParallel scatter/gather, train_img.py:203-204)
and must be numerically inert (same probes, same math, different layout)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P, set_mesh

from implicit_normalizing_flows_tpu.layers import ImplicitBlock
from implicit_normalizing_flows_tpu.models.builders import build_lipschitz_mlp
from implicit_normalizing_flows_tpu.parallel import make_mesh
from implicit_normalizing_flows_tpu.parallel.mesh import constrain_probe_axis


def _probe_block(n_probes):
    mk = lambda: build_lipschitz_mlp([4, 16, 4], "swish", 0.9, [2, 2], [2, 2],
                                     n_iterations=5)
    return ImplicitBlock(
        mk(), mk(), n_probes=n_probes, n_exact_terms=2, n_power_series=None,
        neumann_grad=True, grad_in_forward=False, threshold=20,
    )


def test_constrain_probe_axis_noop_without_mesh():
    x = jnp.ones((4, 8, 3))
    y = jax.jit(constrain_probe_axis)(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_constrain_probe_axis_applies_trace_spec():
    mesh = make_mesh(n_data=2, n_trace=4)

    @jax.jit
    def f(x):
        return constrain_probe_axis(x)

    with set_mesh(mesh):
        y = f(jnp.ones((4, 8, 3)))
    assert tuple(y.sharding.spec)[:2] == ("trace", "data")

    # Indivisible probe axis -> constraint skipped, not an error.
    with set_mesh(mesh):
        y2 = f(jnp.ones((3, 8, 3)))
    np.testing.assert_array_equal(np.asarray(y2), 1.0)


def test_probe_axis_sharding_is_numerically_inert(monkeypatch):
    """loss and grads identical with/without the trace mesh (same RNG).
    f32 estimator: under bf16 (the TPU default) resharding legitimately
    reassociates the reductions, so exact parity is an f32 property."""
    monkeypatch.setenv("IMNF_BF16_EST", "0")
    block = _probe_block(n_probes=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    variables = block.init(rng, x)
    params, state = variables["params"], variables["state"]

    @jax.jit
    def loss_fn(params, state, x, key):
        y, logdet, new_state = block.forward(
            {"params": params, "state": state}, x, jnp.zeros(x.shape[0]),
            rng=key, train=True)
        return (y ** 2).mean() - logdet.mean()

    key = jax.random.PRNGKey(2)
    l1, g1 = jax.value_and_grad(loss_fn)(params, state, x, key)

    mesh = make_mesh(n_data=2, n_trace=4)
    with set_mesh(mesh):
        lN, gN = jax.value_and_grad(loss_fn)(params, state, x, key)

    np.testing.assert_allclose(float(l1), float(lN), rtol=2e-5)
    f1 = jax.flatten_util.ravel_pytree(jax.tree.map(np.asarray, g1))[0]
    fN = jax.flatten_util.ravel_pytree(jax.tree.map(np.asarray, gN))[0]
    np.testing.assert_allclose(np.asarray(f1), np.asarray(fN), atol=2e-5)
