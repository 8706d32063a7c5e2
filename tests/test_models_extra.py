"""Model-family coverage: legacy ResidualFlow, RealNVP coupling stacks,
ImplicitResNet classifier, toy iresnet/realnvp archs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_normalizing_flows_tpu.layers import LogitTransform
from implicit_normalizing_flows_tpu.layers.protocol import make_vars
from implicit_normalizing_flows_tpu.models import build_residual_flow, build_toy_model


def test_residual_flow_roundtrip():
    B, C, H, W = 4, 3, 8, 8
    model = build_residual_flow(
        (B, C, H, W), block_type="resblock", n_blocks=[1, 1],
        intermediate_dim=16, factor_out=True, init_layer=LogitTransform(0.05),
        actnorm=True, coeff=0.9, vnorms="2222", n_lipschitz_iters=5,
        activation_fn="swish", fc_end=False, n_exact_terms=2,
        neumann_grad=True, first_resblock=True, preact=True,
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, C, H, W), minval=0.05, maxval=0.95)
    v = model.init(jax.random.PRNGKey(1), x)
    v = model.init_with_batch(v, x, rng=jax.random.PRNGKey(2))
    z, delta, _ = model.forward(v, x, jnp.zeros((B,)), rng=jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(delta)).all()
    x_rec, _ = model.inverse(v, z, None, rng=jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=5e-3)


def test_coupling_stack_roundtrip():
    B, C, H, W = 4, 4, 8, 8
    model = build_residual_flow(
        (B, C, H, W), block_type="coupling", n_blocks=[2, 2],
        intermediate_dim=16, factor_out=True, init_layer=None,
        actnorm=True, activation_fn="relu", fc_end=False, first_resblock=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (B, C, H, W))
    v = model.init(jax.random.PRNGKey(6), x)
    v = model.init_with_batch(v, x, rng=jax.random.PRNGKey(7))
    z, delta, _ = model.forward(v, x, jnp.zeros((B,)), rng=jax.random.PRNGKey(8))
    x_rec, _ = model.inverse(v, z, None, rng=jax.random.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)


@pytest.mark.slow  # >90s on CPU; excluded from the fast CI subset
def test_implicit_resnet_classifier():
    from implicit_normalizing_flows_tpu.models.classification import ImplicitResNet

    model = ImplicitResNet((1, 1, 1, 1), num_classes=7, imagesize=16,
                           coeff=0.9, n_lipschitz_iters=3)
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 3, 16, 16)) * 0.1
    v = model.init(jax.random.PRNGKey(11), x)
    logits = model.apply(v, x, rng=jax.random.PRNGKey(12), train=True)
    assert logits.shape == (2, 7)
    assert np.isfinite(np.asarray(logits)).all()
    v2 = model.update_lipschitz(v, 2)
    sigmas = model.lipschitz_sigmas(v2)
    assert len(sigmas) == 16  # 4 blocks x 2 nets x 2 conv layers
    # gradient flows through the implicit blocks
    g = jax.grad(lambda p: jnp.sum(
        model.apply({"params": p, "state": v["state"]}, x) ** 2))(v["params"])
    gn = float(jnp.sqrt(sum(jnp.sum(a ** 2) for a in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0


@pytest.mark.parametrize("arch", ["iresnet", "realnvp"])
def test_toy_archs_roundtrip(arch):
    model = build_toy_model(arch=arch, dims="16-16", nblocks=2, act="relu",
                            coeff=0.9, vnorms="2222", n_lipschitz_iters=5,
                            brute_force=True)
    x = jax.random.normal(jax.random.PRNGKey(13), (8, 2))
    v = model.init(jax.random.PRNGKey(14), x)
    z, delta, _ = model.forward(v, x, jnp.zeros((8,)), rng=jax.random.PRNGKey(15))
    assert np.isfinite(np.asarray(delta)).all()
    x_rec, _ = model.inverse(v, z, None, rng=jax.random.PRNGKey(16))
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=2e-3)


def test_tabular_model_roundtrip_and_nll():
    from implicit_normalizing_flows_tpu.models import build_tabular_model
    from implicit_normalizing_flows_tpu.training import standard_normal_logprob

    model = build_tabular_model(6, dims="32-32", nblocks=2, act="sin",
                                coeff=0.9, vnorms="2222", n_lipschitz_iters=5)
    x = jax.random.normal(jax.random.PRNGKey(20), (16, 6))
    v = model.init(jax.random.PRNGKey(21), x)
    z, delta, _ = model.forward(v, x, jnp.zeros((16,)), rng=jax.random.PRNGKey(22), train=True)
    nll = -jnp.mean(standard_normal_logprob(z) - delta)
    assert np.isfinite(float(nll))
    x_rec, _ = model.inverse(v, z, None, rng=jax.random.PRNGKey(23))
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=2e-3)
