"""ScanRepeat: the same-scale block stack as a single lax.scan.

The reference unrolls all ``n_blocks`` imBlocks per scale through autograd
(implicit_flow.py:64-97); ScanRepeat stacks their variables and scans, which
must be *exactly* the loop it replaces: same math, same per-slice RNG folds.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from implicit_normalizing_flows_tpu.layers import (
    ActNorm2d,
    ImplicitBlock,
    LogitTransform,
    ScanRepeat,
    SequentialFlow,
)
from implicit_normalizing_flows_tpu.layers.protocol import fold_rng
from implicit_normalizing_flows_tpu.models import ImplicitFlow
from implicit_normalizing_flows_tpu.models.implicit_flow import build_conv_net


def _unit(size=(2, 4, 4), idim=6):
    mk = lambda: build_conv_net(size, idim, "3-1", 0.9, [2, 2], [2, 2],
                                2, "swish", True, 0, None, None, False,
                                first_resblock=False)
    return SequentialFlow([
        ImplicitBlock(mk(), mk(), n_exact_terms=2, threshold=15,
                      neumann_grad=True, grad_in_forward=False),
        ActNorm2d(size[0]),
    ])


def test_scanrepeat_matches_manual_loop():
    n = 3
    unit = _unit()
    scan = ScanRepeat(unit, n)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 4, 4)) * 0.1
    variables = scan.init(jax.random.PRNGKey(1), x0)
    variables = scan.init_with_batch(variables, x0, rng=jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(3)

    y_s, lp_s, _ = scan.forward(variables, x0, jnp.zeros(4), rng=key, train=True)

    # the loop ScanRepeat replaces: slice i, fold_rng(key, i)
    y_m, lp_m = x0, jnp.zeros(4)
    for i in range(n):
        v = jax.tree.map(lambda a: a[i], variables)
        y_m, lp_m, _ = unit.forward(v, y_m, lp_m, rng=fold_rng(key, i),
                                    train=True)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_m),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp_s), np.asarray(lp_m),
                               rtol=1e-4, atol=1e-4)


def test_scanrepeat_roundtrip():
    n = 3
    scan = ScanRepeat(_unit(), n)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 4, 4)) * 0.1
    variables = scan.init(jax.random.PRNGKey(1), x0)
    variables = scan.init_with_batch(variables, x0, rng=jax.random.PRNGKey(2))
    y, _, _ = scan.forward(variables, x0, None)
    x_rec, _ = scan.inverse(variables, y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x0), atol=5e-3)


@pytest.mark.slow  # >90s on CPU; excluded from the fast CI subset
def test_scanrepeat_gradients_match_loop(monkeypatch):
    # f32 estimator: bf16 (the TPU default) reassociates differently under
    # scan vs unrolled, so exact agreement is an f32 property.
    monkeypatch.setenv("IMNF_BF16_EST", "0")
    n = 2
    unit = _unit()
    scan = ScanRepeat(unit, n)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 4, 4)) * 0.1
    variables = scan.init(jax.random.PRNGKey(1), x0)
    key = jax.random.PRNGKey(3)

    def loss_scan(params):
        y, lp, _ = scan.forward({"params": params, "state": variables["state"]},
                                x0, jnp.zeros(4), rng=key, train=True)
        return (y ** 2).mean() - lp.mean()

    def loss_loop(params):
        y, lp = x0, jnp.zeros(4)
        for i in range(n):
            v = {"params": jax.tree.map(lambda a: a[i], params),
                 "state": jax.tree.map(lambda a: a[i], variables["state"])}
            y, lp, _ = unit.forward(v, y, lp, rng=fold_rng(key, i), train=True)
        return (y ** 2).mean() - lp.mean()

    l1, g1 = jax.value_and_grad(loss_scan)(variables["params"])
    l2, g2 = jax.value_and_grad(loss_loop)(variables["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    f1 = jax.flatten_util.ravel_pytree(jax.tree.map(np.asarray, g1))[0]
    f2 = jax.flatten_util.ravel_pytree(jax.tree.map(np.asarray, g2))[0]
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # >90s on CPU; excluded from the fast CI subset
def test_flagship_scan_blocks_trains():
    """ImplicitFlow(scan_blocks=True) runs a full train step and stays
    finite; update_lipschitz keeps the stacked structure."""
    from implicit_normalizing_flows_tpu.training import (
        adam, ema_init, linear_warmup)
    from implicit_normalizing_flows_tpu.training.loops import make_image_step

    batch, size = 4, 8
    model = ImplicitFlow(
        input_size=(batch, 3, size, size), n_blocks=[3, 3],
        intermediate_dim=8, factor_out=False, init_layer=LogitTransform(0.05),
        actnorm=True, coeff=0.9, vnorms="2222", n_lipschitz_iters=2,
        n_power_series=None, n_dist="poisson", kernels="3-1-3",
        activation_fn="swish", fc_end=False, n_exact_terms=2, preact=True,
        neumann_grad=True, grad_in_forward=False, first_resblock=True,
        scan_blocks=True,
    )
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (batch, 3, size, size),
                            minval=0.05, maxval=0.95)
    variables = model.init(jax.random.PRNGKey(1), x0)
    variables = model.init_with_batch(variables, x0, rng=jax.random.PRNGKey(2))
    params, state = variables["params"], variables["state"]

    optimizer = adam(linear_warmup(1e-3, 10), betas=(0.9, 0.99), grad_clip=1.0)
    step = make_image_step(model, optimizer, im_dim=3, imagesize=size,
                           task="density", n_lipschitz_iters=2)
    x_u8 = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, size=(batch, 3, size, size), dtype=np.uint8))
    y = jnp.zeros((batch,), jnp.int32)
    out = step(params, state, optimizer.init(params), ema_init(params),
               x_u8, y, jax.random.PRNGKey(3), jnp.ones(()))
    metrics = out[4]
    assert np.isfinite(float(metrics["bpd"])), metrics
    # stacked structure/shapes preserved through the whole step
    assert jax.tree.structure(out[0]) == jax.tree.structure(params)
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree.leaves(out[0]), jax.tree.leaves(params)))


def _model_logdet_oracle(model, variables, x, rng):
    """Absolute oracle: the model's delta_logp must equal -log|det dJ| of the
    whole map x -> y computed by autodiff, independent of how the chain is
    laid out (eager vs scanned)."""
    B = x.shape[0]
    y, dlp, _ = model.forward(variables, x, jnp.zeros(B), rng=rng, train=False)

    def fwd_single(xi):
        yi, _, _ = model.forward(variables, xi[None], None, rng=rng, train=False)
        return yi[0]

    # jacrev, not jacfwd: the implicit block's solve is a custom_vjp
    J = jax.vmap(jax.jacrev(fwd_single))(x)
    _, logdet = jnp.linalg.slogdet(J)
    # flow convention: logpx = logpz - delta_logp with delta_logp = -logdet
    np.testing.assert_allclose(np.asarray(dlp), np.asarray(-logdet),
                               rtol=1e-4, atol=1e-4)
    return y


def test_tabular_builder_scan_blocks_oracle():
    """build_tabular_model(scan_blocks=True): 3 scanned [block, actnorm]
    units must produce the exact full-map log-determinant and invert."""
    from implicit_normalizing_flows_tpu.models import build_tabular_model

    model = build_tabular_model(
        3, dims="16-16", nblocks=3, act="sin", coeff=0.9, vnorms="2222",
        n_lipschitz_iters=20, brute_force=True, actnorm=True,
        scan_blocks=True,
    )
    # one ActNorm + one ScanRepeat
    assert len(model.chain) == 2
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    variables = model.init_with_batch(variables, x, rng=jax.random.PRNGKey(2))
    y = _model_logdet_oracle(model, variables, x, jax.random.PRNGKey(3))
    x_rec, _ = model.inverse(variables, y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)


def test_toy_builder_scan_blocks_param_leaves_constant_in_depth():
    from implicit_normalizing_flows_tpu.models import build_toy_model

    def leaves(nblocks):
        model = build_toy_model(
            arch="implicit", dims="8-8", nblocks=nblocks, act="sin",
            coeff=0.9, vnorms="2222", n_lipschitz_iters=5,
            brute_force=True, scan_blocks=True,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 2))
        v = model.init(jax.random.PRNGKey(1), x)
        return len(jax.tree.leaves(v["params"])), model, v, x

    n2, *_ = leaves(2)
    n5, model, variables, x = leaves(5)
    assert n2 == n5  # stacked, not unrolled
    y = _model_logdet_oracle(model, variables, x, jax.random.PRNGKey(3))
    x_rec, _ = model.inverse(variables, y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)
