"""Model builders mirroring the reference drivers' inline construction:

* toy 2-D flows (``train_toy.py:200-250``; archs implicit / iresnet / realnvp)
* tabular FC flows (``train_tabular.py:292-336``)
"""
from __future__ import annotations

from ..layers import (
    ACT_FNS,
    ActNorm1d,
    CouplingBlock,
    ImplicitBlock,
    IResBlock,
    LipschitzNet,
    MovingBatchNorm1d,
    ScanRepeat,
    SequentialFlow,
    get_dense,
)
from ..models.modules import PlainDense
from .implicit_flow import parse_vnorms


def build_lipschitz_mlp(dims, activation_fn, coeff, domains, codomains,
                        n_iterations=None, atol=None, rtol=None,
                        learn_p=False, zero_init_last=True):
    """[d0]+hidden+[dL] MLP of induced-norm denses with activations between
    (``build_nnet``, train_toy.py:145-164). ``zero_init`` is applied when the
    layer projects back to the data dim (train_toy.py:160: out_dim == 2;
    train_tabular.py:308)."""
    items = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        if i > 0:
            items.append(ACT_FNS[activation_fn]())
        items.append(get_dense(
            din, dout, coeff=coeff, n_iterations=n_iterations,
            atol=atol, rtol=rtol,
            domain=None if learn_p else domains[i],
            codomain=None if learn_p else codomains[i],
            zero_init=(zero_init_last and dout == dims[-1] and i == len(dims) - 2),
            learn_p=learn_p,
        ))
    return LipschitzNet(items, learn_p=learn_p)


def build_coupling_mlp(dims_in, hidden, dims_out, activation="relu"):
    """Plain MLP for RealNVP s/t nets (reference uses an unconstrained net)."""
    items = []
    last = dims_in
    for h in hidden:
        items.append(PlainDense(last, h))
        items.append(ACT_FNS[activation]())
        last = h
    items.append(PlainDense(last, dims_out))
    return LipschitzNet(items)


def _repeat_unit(unit_fns, n, scan):
    """``n`` copies of the [layer-constructor...] unit. With ``scan`` the
    copies run as ONE ``ScanRepeat`` (lax.scan over stacked per-copy
    variables): program size / compile time O(1) in ``n``, math identical
    per slice (tests/test_scan_blocks.py)."""
    if scan:
        layers = [fn() for fn in unit_fns]
        unit = layers[0] if len(layers) == 1 else SequentialFlow(layers)
        return [ScanRepeat(unit, n)]
    out = []
    for _ in range(n):
        out.extend(fn() for fn in unit_fns)
    return out


def build_toy_model(
    arch="implicit",
    data_dim=2,
    dims="128-128-128-128",
    nblocks=100,
    act="sin",
    coeff=0.9,
    vnorms="222222",
    n_lipschitz_iters=5,
    atol=None,
    rtol=None,
    learn_p=False,
    mixed=True,
    brute_force=False,
    actnorm=False,
    batchnorm=False,
    exact_trace=False,
    n_power_series=None,
    n_samples=1,
    n_dist="geometric",
    scan_blocks=False,
):
    """train_toy.py:200-250. ``scan_blocks`` folds the repeated block unit
    into one ``ScanRepeat`` (lax.scan over stacked variables) — program size
    and compile time O(1) in ``nblocks``, math identical per slice."""
    hidden = list(map(int, dims.split("-")))
    full_dims = [data_dim] + hidden + [data_dim]
    domains, codomains = parse_vnorms(vnorms)

    def mk_net():
        return build_lipschitz_mlp(
            full_dims, act, coeff, domains, codomains,
            n_iterations=n_lipschitz_iters, atol=atol, rtol=rtol,
            learn_p=learn_p,
        )

    blocks = []
    if arch == "implicit":
        if actnorm:
            blocks.append(ActNorm1d(data_dim))

        def mk_block():
            return ImplicitBlock(
                mk_net(), mk_net(),
                n_dist=n_dist, n_power_series=n_power_series,
                exact_trace=exact_trace, brute_force=brute_force,
                n_samples=n_samples, neumann_grad=False, grad_in_forward=False,
            )

        blocks.extend(_repeat_unit([mk_block], nblocks, scan_blocks))
    elif arch == "iresnet":
        if actnorm:
            blocks.append(ActNorm1d(data_dim))

        def mk_block():
            return IResBlock(
                mk_net(),
                n_dist=n_dist, n_power_series=n_power_series,
                exact_trace=exact_trace, brute_force=brute_force,
                n_samples=n_samples, neumann_grad=False, grad_in_forward=False,
            )

        unit_fns = [mk_block]
        if actnorm:
            unit_fns.append(lambda: ActNorm1d(data_dim))
        if batchnorm:
            unit_fns.append(lambda: MovingBatchNorm1d(data_dim))
        blocks.extend(_repeat_unit(unit_fns, nblocks, scan_blocks))
    elif arch == "realnvp":
        for _ in range(nblocks):
            blocks.append(CouplingBlock(
                data_dim, build_coupling_mlp(data_dim // 2, [64, 64], data_dim), swap=False))
            blocks.append(CouplingBlock(
                data_dim, build_coupling_mlp(data_dim // 2, [64, 64], data_dim), swap=True))
            if actnorm:
                blocks.append(ActNorm1d(data_dim))
            if batchnorm:
                blocks.append(MovingBatchNorm1d(data_dim))
    else:
        raise ValueError(f"unknown arch {arch}")
    return SequentialFlow(blocks)


def build_tabular_model(
    data_dim,
    dims="128-128-128-128",
    nblocks=20,
    act="sin",
    coeff=0.99,
    vnorms="222222",
    n_lipschitz_iters=None,
    atol=1e-3,
    rtol=1e-3,
    learn_p=False,
    actnorm=False,
    batchnorm=False,
    exact_trace=False,
    brute_force=False,
    n_power_series=None,
    n_samples=1,
    n_dist="geometric",
    eps_forward=1e-6,
    scan_blocks=False,
):
    """train_tabular.py:292-336 — flat chain of FC implicit blocks; the
    builder disables neumann/mem-eff so the logged loss is the true NLL
    (train_tabular.py:330-331). ``scan_blocks`` folds the nblocks-deep stack
    (recipe default 20) into one ScanRepeat."""
    hidden = list(map(int, dims.split("-")))
    full_dims = [data_dim] + hidden + [data_dim]
    domains, codomains = parse_vnorms(vnorms)

    def mk_net():
        return build_lipschitz_mlp(
            full_dims, act, coeff, domains, codomains,
            n_iterations=n_lipschitz_iters, atol=atol, rtol=rtol,
            learn_p=learn_p,
        )

    def mk_block():
        return ImplicitBlock(
            mk_net(), mk_net(),
            n_dist=n_dist, n_power_series=n_power_series,
            exact_trace=exact_trace, brute_force=brute_force,
            n_samples=n_samples, neumann_grad=False, grad_in_forward=False,
            eps_forward=eps_forward,
        )

    unit_fns = [mk_block]
    if actnorm:
        unit_fns.append(lambda: ActNorm1d(data_dim))
    if batchnorm:
        unit_fns.append(lambda: MovingBatchNorm1d(data_dim))

    blocks = []
    if actnorm:
        blocks.append(ActNorm1d(data_dim))
    blocks.extend(_repeat_unit(unit_fns, nblocks, scan_blocks))
    return SequentialFlow(blocks)
