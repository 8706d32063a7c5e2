"""Layer-level oracles: power iteration vs SVD, invertibility of every flow
layer, actnorm init semantics, optimizer parity vs torch (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_normalizing_flows_tpu.layers import (
    ActNorm1d,
    ActNorm2d,
    ChannelCouplingBlock,
    CouplingBlock,
    InducedNormConv,
    InducedNormDense,
    InvertibleConv2d,
    InvertibleLinear,
    LipschitzNet,
    LogitTransform,
    MaskedCouplingBlock,
    MovingBatchNorm2d,
    SqueezeLayer,
    squeeze,
    unsqueeze,
)
from implicit_normalizing_flows_tpu.models import PlainConv2d
from implicit_normalizing_flows_tpu.models.builders import build_coupling_mlp
from implicit_normalizing_flows_tpu.ops import power_iter as pi


def test_dense_power_iteration_matches_svd():
    key = jax.random.PRNGKey(0)
    W = jax.random.normal(key, (24, 16))
    u = pi.normalize_u(jax.random.normal(jax.random.PRNGKey(1), (24,)), 2)
    v = pi.normalize_v(jax.random.normal(jax.random.PRNGKey(2), (16,)), 2)
    u, v, _ = pi.induced_norm_dense(W, u, v, 2, 2, n_iterations=200)
    sigma = pi.dense_sigma(W, u, v)
    svd_sigma = jnp.linalg.svd(W, compute_uv=False)[0]
    np.testing.assert_allclose(float(sigma), float(svd_sigma), rtol=1e-4)


def test_conv_power_iteration_matches_dense_operator():
    """sigma of a 3x3 conv == top singular value of its explicit matrix."""
    key = jax.random.PRNGKey(3)
    C, H, W_ = 2, 6, 6
    O = 3
    w = jax.random.normal(key, (O, C, 3, 3)) * 0.3
    x_shape = (1, C, H, W_)
    out_shape = (1, O, H, W_)
    u = pi.normalize_u(jax.random.normal(jax.random.PRNGKey(4), (O * H * W_,)), 2)
    v = pi.normalize_v(jax.random.normal(jax.random.PRNGKey(5), (C * H * W_,)), 2)
    u, v, _ = pi.induced_norm_conv(w, u, v, x_shape, out_shape, 2, 2,
                                   stride=(1, 1), padding=(1, 1), n_iterations=300)
    sigma = pi.conv_sigma(w, u, v, x_shape, (1, 1), (1, 1))

    # explicit matrix via jacobian of the conv map
    f = lambda xx: pi.conv_apply(w, xx.reshape(x_shape), (1, 1), (1, 1)).reshape(-1)
    M = jax.jacfwd(f)(jnp.zeros((C * H * W_,)))
    svd_sigma = jnp.linalg.svd(M, compute_uv=False)[0]
    np.testing.assert_allclose(float(sigma), float(svd_sigma), rtol=1e-3)


def test_lipschitz_constraint_enforced():
    """After normalization the layer's true operator norm <= coeff (+tol)."""
    layer = InducedNormDense(12, 12, coeff=0.7, domain=2, codomain=2, n_iterations=100)
    v = layer.init(jax.random.PRNGKey(6))
    v = layer.update_lipschitz(v, n_iterations=200)
    w, _ = layer._normalized_weight(v)
    svd_sigma = float(jnp.linalg.svd(w, compute_uv=False)[0])
    assert svd_sigma <= 0.7 * 1.02, svd_sigma


def _roundtrip(layer, v, x, atol=1e-5, rng=None):
    zero = jnp.zeros((x.shape[0],))
    y, logpy, _ = layer.forward(v, x, zero, rng=rng)
    x2, logpx = layer.inverse(v, y, logpy, rng=rng)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=atol)
    np.testing.assert_allclose(np.asarray(logpx), 0.0, atol=atol * 10)
    return y, logpy


def test_actnorm_init_and_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(7), (64, 5)) * 3 + 1
    layer = ActNorm1d(5)
    v = layer.init(jax.random.PRNGKey(8))
    v = layer.init_with_batch(v, x)
    y, _, _ = layer.forward(v, x, None)
    # normalized to ~zero mean unit var (act_norm.py:25-37)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, 0)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.std(y, 0)), 1.0, atol=0.1)
    _roundtrip(layer, v, x)


def test_actnorm2d_var_clamp():
    # tiny variance clamps to 0.2 (act_norm.py:33)
    x = jnp.ones((16, 3, 4, 4)) + 1e-4 * jax.random.normal(jax.random.PRNGKey(9), (16, 3, 4, 4))
    layer = ActNorm2d(3)
    v = layer.init_with_batch(layer.init(jax.random.PRNGKey(10)), x)
    expected_w = -0.5 * np.log(0.2)
    np.testing.assert_allclose(np.asarray(v["params"]["weight"]), expected_w, atol=1e-3)


def test_logit_transform_roundtrip():
    x = jax.random.uniform(jax.random.PRNGKey(11), (8, 3, 4, 4), minval=0.01, maxval=0.99)
    layer = LogitTransform(0.05)
    v = layer.init(jax.random.PRNGKey(12), x)
    _roundtrip(layer, v, x, atol=1e-4)


def test_squeeze_roundtrip_and_layout():
    x = jax.random.normal(jax.random.PRNGKey(13), (2, 3, 8, 8))
    s = squeeze(x, 2)
    assert s.shape == (2, 12, 4, 4)
    np.testing.assert_allclose(np.asarray(unsqueeze(s, 2)), np.asarray(x), atol=0)
    layer = SqueezeLayer(2)
    _roundtrip(layer, layer.init(jax.random.PRNGKey(14), x), x)


def test_invertible_linear_and_conv():
    x = jax.random.normal(jax.random.PRNGKey(15), (6, 8))
    lin = InvertibleLinear(8)
    v = lin.init(jax.random.PRNGKey(16))
    _roundtrip(lin, v, x, atol=1e-4)
    xc = jax.random.normal(jax.random.PRNGKey(17), (4, 6, 5, 5))
    conv = InvertibleConv2d(6)
    vc = conv.init(jax.random.PRNGKey(18))
    _roundtrip(conv, vc, xc, atol=1e-4)


def test_coupling_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(19), (10, 8))
    net = build_coupling_mlp(4, [16], 8)
    blk = CouplingBlock(8, net, swap=True)
    v = blk.init(jax.random.PRNGKey(20), x)
    _roundtrip(blk, v, x, atol=1e-5)


def test_masked_coupling_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(21), (4, 2, 6, 6))
    items = [PlainConv2d(2, 8, 3, 1, 1), PlainConv2d(8, 4, 3, 1, 1)]
    net = LipschitzNet(items)
    blk = MaskedCouplingBlock(2, net, mask_type="checkerboard0")
    v = blk.init(jax.random.PRNGKey(22), x)
    _roundtrip(blk, v, x, atol=1e-4)


def test_moving_batchnorm_updates_running_mean():
    x = jax.random.normal(jax.random.PRNGKey(23), (32, 4, 3, 3)) + 5.0
    layer = MovingBatchNorm2d(4)
    v = layer.init(jax.random.PRNGKey(24))
    _, _, s1 = layer.forward(v, x, None, train=True)
    assert float(jnp.max(jnp.abs(s1["running_mean"]))) > 0.1
    assert int(s1["step"][0]) == 1
    # volume preserving: logp unchanged
    _, logp, _ = layer.forward(v, x, jnp.zeros((32,)), train=False)
    np.testing.assert_allclose(np.asarray(logp), 0.0)


def test_adam_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    w0 = rng.randn(5, 3).astype(np.float32)
    grads = [rng.randn(5, 3).astype(np.float32) for _ in range(5)]

    tp = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.Adam([tp], lr=1e-2, betas=(0.9, 0.99))
    for g in grads:
        tp.grad = torch.tensor(g)
        topt.step()

    from implicit_normalizing_flows_tpu.training import adam
    import optax

    opt = adam(lambda s: 1e-2, betas=(0.9, 0.99))
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_adamax_matches_torch():
    import torch

    rng = np.random.RandomState(1)
    w0 = rng.randn(4, 4).astype(np.float32)
    grads = [rng.randn(4, 4).astype(np.float32) for _ in range(4)]
    tp = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.Adamax([tp], lr=2e-3, betas=(0.9, 0.99))
    for g in grads:
        tp.grad = torch.tensor(g)
        topt.step()

    from implicit_normalizing_flows_tpu.training import adamax
    import optax

    opt = adamax(lambda s: 2e-3, betas=(0.9, 0.99))
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               rtol=1e-4, atol=1e-6)


def test_ema_semantics():
    from implicit_normalizing_flows_tpu.training import ema_apply, ema_init

    p0 = {"w": jnp.ones((3,))}
    shadow = ema_init(p0)
    p1 = {"w": jnp.full((3,), 2.0)}
    shadow = ema_apply(shadow, p1, decay=0.9)
    np.testing.assert_allclose(np.asarray(shadow["w"]), 1.1, rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from implicit_normalizing_flows_tpu.training import load_checkpoint, save_checkpoint

    state = {"params": {"w": jnp.arange(4.0)}, "epoch": 3}
    last = []
    for e in range(7):
        save_checkpoint(state | {"epoch": e}, str(tmp_path), e, last, 5)
    import os

    files = sorted(os.listdir(tmp_path))
    assert len(files) == 5, files  # rotating keep-5 (utils.py:90-100)
    ck = load_checkpoint(str(tmp_path / files[-1]))
    np.testing.assert_allclose(ck["params"]["w"], np.arange(4.0))
