"""End-to-end toy density training: the minimum slice of SURVEY.md §7
(checkerboard, FC implicit blocks, brute-force exact logdet, Adam) must
train — loss decreases — and round-trip through the chain inverse."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_normalizing_flows_tpu.data import inf_train_gen
from implicit_normalizing_flows_tpu.models import build_toy_model
from implicit_normalizing_flows_tpu.training import (
    adam,
    ema_init,
    linear_warmup,
    make_density_eval_step,
    make_density_train_step,
)


@pytest.fixture(scope="module")
def toy_setup():
    model = build_toy_model(
        arch="implicit", dims="32-32", nblocks=2, act="sin", coeff=0.9,
        vnorms="2222", n_lipschitz_iters=10, brute_force=True,
    )
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(inf_train_gen("checkerboard", 256, rng))
    variables = model.init(jax.random.PRNGKey(0), x0)
    return model, variables, rng


def test_toy_training_reduces_loss(toy_setup):
    model, variables, rng = toy_setup
    params, state = variables["params"], variables["state"]
    optimizer = adam(linear_warmup(1e-2, 10), grad_clip=1.0)
    opt_state = optimizer.init(params)
    shadow = ema_init(params)
    step = make_density_train_step(model, optimizer, n_lipschitz_iters=10)

    losses = []
    key = jax.random.PRNGKey(1)
    for it in range(40):
        x = jnp.asarray(inf_train_gen("checkerboard", 256, rng))
        key, sub = jax.random.split(key)
        params, state, opt_state, shadow, metrics = step(
            params, state, opt_state, shadow, x, sub, jnp.ones(())
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.05, losses


def test_chain_roundtrip(toy_setup):
    model, variables, rng = toy_setup
    x = jnp.asarray(inf_train_gen("checkerboard", 64, rng))
    z, _, _ = model.forward(variables, x, None)
    x_rec, _ = model.inverse(variables, z)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=5e-3)


def test_eval_step_finite(toy_setup):
    model, variables, rng = toy_setup
    eval_step = make_density_eval_step(model)
    x = jnp.asarray(inf_train_gen("checkerboard", 128, rng))
    loss, logpz, delta = eval_step(
        variables["params"], variables["state"], x, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss))


def test_multichip_data_parallel_matches_single(toy_setup):
    """N-chip vs 1-chip gradient-step parity on a fixed batch (SURVEY.md §4)."""
    from implicit_normalizing_flows_tpu.parallel import make_mesh, place_batch, place_replicated

    model, variables, rng = toy_setup
    params, state = variables["params"], variables["state"]
    optimizer = adam(linear_warmup(1e-2, 10), grad_clip=1.0)
    opt_state = optimizer.init(params)
    shadow = ema_init(params)
    x = jnp.asarray(inf_train_gen("checkerboard", 256, rng))
    key = jax.random.PRNGKey(3)

    step1 = make_density_train_step(model, optimizer, n_lipschitz_iters=10)
    p1, *_ , m1 = step1(params, state, opt_state, shadow, x, key, jnp.ones(()))

    mesh = make_mesh()
    stepN = make_density_train_step(model, optimizer, n_lipschitz_iters=10, mesh=mesh)
    pN, *_, mN = stepN(
        place_replicated(mesh, params), place_replicated(mesh, state),
        place_replicated(mesh, opt_state), place_replicated(mesh, shadow),
        place_batch(mesh, x), jax.device_put(key, None), jnp.ones(()),
    )
    np.testing.assert_allclose(float(m1["loss"]), float(mN["loss"]), rtol=1e-5)
    l1 = jax.flatten_util.ravel_pytree(p1)[0]
    lN = jax.flatten_util.ravel_pytree(jax.tree.map(np.asarray, pN))[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(lN), atol=1e-5)
