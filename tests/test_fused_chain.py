"""Fused Neumann-chain kernel vs the jax.vjp while_loop it replaces.

Runs the Pallas kernel in interpreter mode on the CPU mesh and compares the
full signed-coefficient accumulation against the straightforward autodiff
chain on a random swish conv stack, for every flagship scale shape and both
preact variants.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_normalizing_flows_tpu.ops.fused_chain import (

    conv1x1_transpose_mat,
    conv3_transpose_mats,
    conv3_transpose_mats_cout,
    fused_neumann_chain,
)


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _swish(x):
    return x * jax.nn.sigmoid(x) / 1.1


def _make_net(key, c, mid, preact):
    k1, k2, k3, kb1, kb2, kb3 = jax.random.split(key, 6)
    w1 = jax.random.normal(k1, (mid, c, 3, 3)) * 0.2
    w2 = jax.random.normal(k2, (mid, mid, 1, 1)) * 0.1
    w3 = jax.random.normal(k3, (c, mid, 3, 3)) * 0.2
    b1 = jax.random.normal(kb1, (mid,)) * 0.1
    b2 = jax.random.normal(kb2, (mid,)) * 0.1
    b3 = jax.random.normal(kb3, (c,)) * 0.1

    def net(x):
        h = _swish(x) if preact else x
        h = _conv(h, w1) + b1[None, :, None, None]
        h = _swish(h)
        h = _conv(h, w2) + b2[None, :, None, None]
        h = _swish(h)
        return _conv(h, w3) + b3[None, :, None, None]

    return net, (w1, w2, w3, b1, b2, b3)


def _dswish(h):
    s = jax.nn.sigmoid(h)
    return (s + h * s * (1 - s)) / 1.1


def _linearization(x, w1, w2, w3, b1, b2, preact):
    """s0/s1/s2 at the linearization point, matching the net in _make_net."""
    s0 = _dswish(x) if preact else jnp.ones_like(x)
    a0 = _swish(x) if preact else x
    h1 = _conv(a0, w1) + b1[None, :, None, None]
    s1 = _dswish(h1)
    h2 = _conv(_swish(h1), w2) + b2[None, :, None, None]
    s2 = _dswish(h2)
    return s0, s1, s2


@pytest.mark.parametrize("c,H,W", [(3, 32, 32), (12, 16, 16), (48, 8, 8)])
@pytest.mark.parametrize("preact", [False, True])
def test_fused_chain_matches_vjp_loop(c, H, W, preact):
    mid = 32
    B = 2
    key = jax.random.PRNGKey(hash((c, H, W, preact)) % (2 ** 31))
    net, (w1, w2, w3, b1, b2, b3) = _make_net(key, c, mid, preact)
    kx, ke = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (B, c, H, W))
    eps = jax.random.normal(ke, (B, c, H, W))

    cap = 8
    n_power = 5
    coeffs = jnp.linspace(1.0, 0.2, cap)
    ks = jnp.arange(1, cap + 1)
    signed = jnp.where(ks % 2 == 0, 1.0, -1.0) * coeffs

    # Reference: the while_loop semantics of neumann_logdet_estimator.
    _, vjp = jax.vjp(net, x)
    u, acc = eps, eps
    for k in range(1, n_power + 1):
        u = vjp(u)[0]
        acc = acc + signed[k - 1] * u

    # Kernel inputs.
    c8 = max(8, -(-c // 8) * 8)
    s0, s1, s2 = _linearization(x, w1, w2, w3, b1, b2, preact)
    pad = lambda a: jnp.pad(a, ((0, 0), (0, c8 - c), (0, 0), (0, 0)))
    flat = lambda a: a.reshape(a.shape[0], a.shape[1], H * W)
    got = fused_neumann_chain(
        flat(pad(eps)), flat(pad(s0)), flat(s1), flat(s2),
        conv3_transpose_mats(w3, c8), conv1x1_transpose_mat(w2),
        conv3_transpose_mats_cout(w1, c8),
        signed, jnp.asarray(n_power), H=H, W=W, interpret=True)

    want = flat(pad(acc))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_path_matches_xla_in_implicit_block(monkeypatch):
    """End-to-end: ImplicitBlock._logdetgrad via the fused kernel (interpret
    mode) must reproduce the XLA while_loop estimator — value AND parameter
    gradients — given the same rng (same probes and roulette draw)."""
    from implicit_normalizing_flows_tpu.layers.implicit_block import ImplicitBlock
    from implicit_normalizing_flows_tpu.models.implicit_flow import build_conv_net

    def make_net():
        return build_conv_net(
            (3, 8, 8), 16, "3-1-3", 0.9, [2.0] * 3, [2.0] * 3, 3, "swish",
            preact=True, dropout=0.0, sn_atol=None, sn_rtol=None,
            learn_p=False, first_resblock=False)

    block = ImplicitBlock(make_net(), make_net(), n_dist="poisson",
                          n_exact_terms=2, neumann_grad=True,
                          grad_in_forward=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8))
    variables = block.init(jax.random.PRNGKey(1), x)
    rng = jax.random.PRNGKey(2)
    zeros = jnp.zeros((2,))

    def run():
        def loss(params):
            v = {"params": params, "state": variables["state"]}
            _, dlogp, _ = block.forward(v, x, zeros, rng=rng, train=True)
            return jnp.sum(dlogp)
        val, grads = jax.value_and_grad(loss)(variables["params"])
        return val, grads

    monkeypatch.setenv("IMNF_BF16_EST", "0")
    monkeypatch.setenv("IMNF_FUSED_CHAIN", "0")
    val_xla, g_xla = run()
    monkeypatch.setenv("IMNF_FUSED_CHAIN", "interpret")
    val_fused, g_fused = run()

    np.testing.assert_allclose(float(val_fused), float(val_xla), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_fused_chain2_matches_two_singles():
    from implicit_normalizing_flows_tpu.ops.fused_chain import fused_neumann_chain2

    c, H, W, mid, B = 3, 8, 8, 16, 2
    c8 = 8
    cap, n_power = 6, 4
    coeffs = jnp.linspace(1.0, 0.3, cap)
    ks = jnp.arange(1, cap + 1)
    signed = jnp.where(ks % 2 == 0, 1.0, -1.0) * coeffs

    def make_chain(seed):
        key = jax.random.PRNGKey(seed)
        k1, k2, k3, ke, kx, ks0, ks1, ks2 = jax.random.split(key, 8)
        w1 = jax.random.normal(k1, (mid, c, 3, 3)) * 0.2
        w2 = jax.random.normal(k2, (mid, mid, 1, 1)) * 0.1
        w3 = jax.random.normal(k3, (c, mid, 3, 3)) * 0.2
        eps = jax.random.normal(ke, (B, c8, H * W))
        s0 = jax.nn.sigmoid(jax.random.normal(ks0, (B, c8, H * W)))
        s1 = jax.nn.sigmoid(jax.random.normal(ks1, (B, mid, H * W)))
        s2 = jax.nn.sigmoid(jax.random.normal(ks2, (B, mid, H * W)))
        return (eps, s0, s1, s2, conv3_transpose_mats(w3, c8),
                conv1x1_transpose_mat(w2), conv3_transpose_mats_cout(w1, c8))

    cx, cz = make_chain(1), make_chain(2)
    ax, az = fused_neumann_chain2(cx, cz, signed, jnp.asarray(n_power),
                                  H=H, W=W, interpret=True)
    sx = fused_neumann_chain(*cx, signed, jnp.asarray(n_power),
                             H=H, W=W, interpret=True)
    sz = fused_neumann_chain(*cz, signed, jnp.asarray(n_power),
                             H=H, W=W, interpret=True)
    np.testing.assert_allclose(np.asarray(ax), np.asarray(sx), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(az), np.asarray(sz), rtol=1e-5)

# CPU Pallas interpreter: minutes per file; excluded from the fast CI subset
pytestmark = [pytest.mark.slow, pytest.mark.kernels]
