"""Legacy Residual Flow model + RealNVP coupling baseline (reference:
``lib/resflow.py:18-629`` — the codebase the implicit repo forked from, kept
for parity: ``qualitative_samples.py`` renders from it).

``ResidualFlow`` shares the multiscale skeleton of ``ImplicitFlow`` with
explicit ``iResBlock`` residual blocks (one net per block instead of two) and
``fc_nblocks=4`` FC blocks at the tail (``resflow.py:281``).
``StackedCouplingBlocks`` is the RealNVP baseline with alternating
channel/checkerboard masks (``resflow.py:487-629``).
"""
from __future__ import annotations

from ..layers import (
    ACT_FNS,
    ActNorm1d,
    ActNorm2d,
    ChannelCouplingBlock,
    Dropout,
    InvertibleConv2d,
    InvertibleLinear,
    IResBlock,
    LipschitzNet,
    MaskedCouplingBlock,
    MovingBatchNorm2d,
    SequentialFlow,
    SqueezeLayer,
)
from .implicit_flow import (
    FCWrapper,
    ImplicitFlow,
    build_conv_net,
    build_fc_net,
    parse_vnorms,
)
from .modules import PlainConv2d, PlainDense


class StackediResBlocks(SequentialFlow):
    """resflow.py:255-417 — same chain layout as StackedImplicitBlocks with
    single-net iResBlocks and a 4-block FC tail."""

    def __init__(self, initial_size, idim, squeeze=True, init_layer=None,
                 n_blocks=1, quadratic=False, actnorm=False, fc_actnorm=False,
                 batchnorm=False, dropout=0, fc=False, coeff=0.9,
                 vnorms="122f", n_lipschitz_iters=None, sn_atol=None,
                 sn_rtol=None, n_power_series=5, n_dist="geometric",
                 n_samples=1, kernels="3-1-3", activation_fn="elu",
                 fc_end=True, fc_nblocks=4, fc_idim=128, n_exact_terms=0,
                 preact=False, neumann_grad=True, grad_in_forward=False,
                 first_resblock=False, learn_p=False):
        chain = []
        domains, codomains = parse_vnorms(vnorms)

        def _actnorm(size, fc_):
            if fc_:
                return FCWrapper(ActNorm1d(size[0] * size[1] * size[2]))
            return ActNorm2d(size[0])

        def _quadratic_layer(size, fc_):
            if fc_:
                c, h, w = size
                return FCWrapper(InvertibleLinear(c * h * w))
            return InvertibleConv2d(size[0])

        def _resblock(size, fc_, idim_=idim, first=False):
            common = dict(
                n_power_series=n_power_series, n_dist=n_dist, n_samples=n_samples,
                n_exact_terms=n_exact_terms, neumann_grad=neumann_grad,
                grad_in_forward=grad_in_forward,
            )
            if fc_:
                nhidden = len(kernels.split("-")) - 1
                net = build_fc_net(size, idim_, nhidden, coeff, domains,
                                   codomains, n_lipschitz_iters, activation_fn,
                                   preact, dropout, sn_atol, sn_rtol, learn_p)
            else:
                net = build_conv_net(size, idim_, kernels, coeff, domains,
                                     codomains, n_lipschitz_iters, activation_fn,
                                     preact, dropout, sn_atol, sn_rtol, learn_p,
                                     batchnorm=batchnorm, first_resblock=first)
            return IResBlock(net, **common)

        if init_layer is not None:
            chain.append(init_layer)
        if first_resblock and actnorm:
            chain.append(_actnorm(initial_size, fc))
        if first_resblock and fc_actnorm:
            chain.append(_actnorm(initial_size, True))

        for i in range(n_blocks):
            if quadratic:
                chain.append(_quadratic_layer(initial_size, fc))
            chain.append(_resblock(initial_size, fc, first=first_resblock and (i == 0)))
            if actnorm:
                chain.append(_actnorm(initial_size, fc))
            if fc_actnorm:
                chain.append(_actnorm(initial_size, True))
        if squeeze:
            chain.append(SqueezeLayer(2))
        elif fc_end:
            for _ in range(fc_nblocks):
                chain.append(_resblock(initial_size, True, fc_idim))
                if actnorm or fc_actnorm:
                    chain.append(_actnorm(initial_size, True))
        super().__init__(chain)


def _plain_conv_net(c_in, idim, c_out, kernels, activation_fn, batchnorm,
                    dropout, preact, first_resblock):
    """Unconstrained conv stack for coupling s/t nets (resflow.py:588-601)."""
    ks = list(map(int, kernels.split("-")))
    items = []
    if not first_resblock and preact:
        if batchnorm:
            items.append(MovingBatchNorm2d(c_in))
        items.append(ACT_FNS[activation_fn]())
    items.append(PlainConv2d(c_in, idim, ks[0], 1, ks[0] // 2))
    if batchnorm:
        items.append(MovingBatchNorm2d(idim))
    items.append(ACT_FNS[activation_fn]())
    for k in ks[1:-1]:
        items.append(PlainConv2d(idim, idim, k, 1, k // 2))
        if batchnorm:
            items.append(MovingBatchNorm2d(idim))
        items.append(ACT_FNS[activation_fn]())
    if dropout:
        items.append(Dropout(dropout))
    items.append(PlainConv2d(idim, c_out, ks[-1], 1, ks[-1] // 2))
    return LipschitzNet(items)


def _plain_fc_net(input_shape, idim, nhidden, activation_fn, preact, dropout, div_in=1):
    c, h, w = input_shape
    dim = c * h * w
    items = []
    last = dim // div_in
    if preact:
        items.append(ACT_FNS[activation_fn]())
    for _ in range(nhidden):
        items.append(PlainDense(last, idim))
        items.append(ACT_FNS[activation_fn]())
        last = idim
    if dropout:
        items.append(Dropout(dropout))
    items.append(PlainDense(last, dim))
    return LipschitzNet(items, flatten_io=True, input_shape=input_shape)


class StackedCouplingBlocks(SequentialFlow):
    """RealNVP baseline (resflow.py:487-629): alternating channel (after the
    first squeeze) or checkerboard (pre-squeeze) affine couplings."""

    def __init__(self, initial_size, idim, squeeze=True, init_layer=None,
                 n_blocks=1, quadratic=False, actnorm=False, fc_actnorm=False,
                 batchnorm=False, dropout=0, fc=False, kernels="3-1-3",
                 activation_fn="elu", fc_end=True, fc_nblocks=4, fc_idim=128,
                 preact=False, first_resblock=False, **unused):
        chain = []
        state = {"swap": True}

        def _actnorm(size, fc_):
            if fc_:
                return FCWrapper(ActNorm1d(size[0] * size[1] * size[2]))
            return ActNorm2d(size[0])

        def _quadratic_layer(size, fc_):
            if fc_:
                c, h, w = size
                return FCWrapper(InvertibleLinear(c * h * w))
            return InvertibleConv2d(size[0])

        def _coupling_block(size, fc_, idim_=idim, first=False):
            if fc_:
                state["swap"] = not state["swap"]
                nhidden = len(kernels.split("-")) - 1
                net = _plain_fc_net(size, idim_, nhidden, activation_fn, preact,
                                    dropout, div_in=2)
                from ..layers import CouplingBlock
                return FCWrapper(CouplingBlock(size[0] * size[1] * size[2], net,
                                               swap=state["swap"]))
            if init_layer is None:
                block_cls, mask_base, div_in, mult_out = ChannelCouplingBlock, "channel", 2, 1
            else:
                block_cls, mask_base, div_in, mult_out = MaskedCouplingBlock, "checkerboard", 1, 2
            state["swap"] = not state["swap"]
            mask_type = mask_base + ("1" if state["swap"] else "0")
            net = _plain_conv_net(size[0] // div_in, idim_, size[0] * mult_out,
                                  kernels, activation_fn, batchnorm, dropout,
                                  preact, first)
            return block_cls(size[0], net, mask_type=mask_type)

        if init_layer is not None:
            chain.append(init_layer)
        if first_resblock and actnorm:
            chain.append(_actnorm(initial_size, fc))
        if first_resblock and fc_actnorm:
            chain.append(_actnorm(initial_size, True))

        for i in range(n_blocks):
            if quadratic:
                chain.append(_quadratic_layer(initial_size, fc))
            chain.append(_coupling_block(initial_size, fc, first=first_resblock and (i == 0)))
            if actnorm:
                chain.append(_actnorm(initial_size, fc))
            if fc_actnorm:
                chain.append(_actnorm(initial_size, True))
        if squeeze:
            chain.append(SqueezeLayer(2))
        elif fc_end:
            for _ in range(fc_nblocks):
                chain.append(_coupling_block(initial_size, True, fc_idim))
                if actnorm or fc_actnorm:
                    chain.append(_actnorm(initial_size, True))
        super().__init__(chain)


def build_residual_flow(input_size, block_type="resblock", **kwargs):
    """Factory that assembles a ResidualFlow by constructing an ImplicitFlow
    shell and replacing its per-scale stacks with StackediResBlocks /
    StackedCouplingBlocks (resflow.py:103-139)."""
    model = ImplicitFlow.__new__(ImplicitFlow)
    stack_cls = StackediResBlocks if block_type == "resblock" else StackedCouplingBlocks

    # mirror ImplicitFlow.__init__ with the stack class swapped
    defaults = dict(
        n_blocks=(16, 16), intermediate_dim=64, factor_out=True,
        quadratic=False, init_layer=None, actnorm=False, fc_actnorm=False,
        batchnorm=False, dropout=0, fc=False, coeff=0.9, vnorms="122f",
        n_lipschitz_iters=None, sn_atol=None, sn_rtol=None, n_power_series=5,
        n_dist="geometric", n_samples=1, kernels="3-1-3", activation_fn="elu",
        fc_end=True, fc_idim=128, n_exact_terms=0, preact=False,
        neumann_grad=True, grad_in_forward=False, first_resblock=False,
        learn_p=False, classification=False, classification_hdim=64,
        n_classes=10,
    )
    defaults.update(kwargs)
    a = defaults

    model.input_size = tuple(input_size)
    _, c, h, w = model.input_size
    model.n_scale = min(len(a["n_blocks"]), ImplicitFlow._calc_n_scale(input_size))
    model.factor_out = a["factor_out"]
    model.classification = a["classification"]
    model.classification_hdim = a["classification_hdim"]
    model.n_classes = a["n_classes"]
    if not model.n_scale > 0:
        raise ValueError(f"Could not compute number of scales for input size {input_size}")

    transforms = []
    for i in range(model.n_scale):
        kw = dict(
            initial_size=(c, h, w), idim=a["intermediate_dim"],
            squeeze=(i < model.n_scale - 1),
            init_layer=a["init_layer"] if i == 0 else None,
            n_blocks=a["n_blocks"][i], quadratic=a["quadratic"],
            actnorm=a["actnorm"], fc_actnorm=a["fc_actnorm"],
            batchnorm=a["batchnorm"], dropout=a["dropout"], fc=a["fc"],
            kernels=a["kernels"], activation_fn=a["activation_fn"],
            fc_end=a["fc_end"], fc_idim=a["fc_idim"], preact=a["preact"],
            first_resblock=a["first_resblock"] and (i == 0),
        )
        if stack_cls is StackediResBlocks:
            kw.update(
                coeff=a["coeff"], vnorms=a["vnorms"],
                n_lipschitz_iters=a["n_lipschitz_iters"], sn_atol=a["sn_atol"],
                sn_rtol=a["sn_rtol"], n_power_series=a["n_power_series"],
                n_dist=a["n_dist"], n_samples=a["n_samples"],
                n_exact_terms=a["n_exact_terms"], neumann_grad=a["neumann_grad"],
                grad_in_forward=a["grad_in_forward"], learn_p=a["learn_p"],
            )
        transforms.append(stack_cls(**kw))
        c, h, w = c * 2 if a["factor_out"] else c * 4, h // 2, w // 2
    model.transforms = transforms
    model.dims = [o[1:] for o in model.calc_output_size(input_size)]
    if a["classification"]:
        model._build_multiscale_classifier(input_size)
    return model


# Public name matching the reference class (resflow.py:18).
ResidualFlow = build_residual_flow
