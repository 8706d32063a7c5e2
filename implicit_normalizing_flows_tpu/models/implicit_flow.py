"""Multiscale implicit-flow image model.

TPU-native counterpart of ``ImplicitFlow`` / ``StackedImplicitBlocks`` /
``FCNet`` / ``FCWrapper`` (``/root/reference/lib/implicit_flow.py:20-501``):
per scale, a chain of [init_layer?, actnorm?, n x (quadratic? -> implicit
block -> actnorm?) ..., Squeeze], factor-out channel splitting between
scales (``implicit_flow.py:199-202``), optional FC blocks at the last scale
(``:429-433``), and optional multiscale classification heads
(``:166-187,204-217``). Every implicit block gets TWO independently built
Lipschitz nets (nnet_x, nnet_z — ``:400-409``); the vnorms string (e.g.
``'122f'``) becomes per-layer (domain, codomain) pairs (``:292-299``).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..layers import (
    ACT_FNS,
    ActNorm1d,
    ActNorm2d,
    Dropout,
    ImplicitBlock,
    InvertibleConv2d,
    InvertibleLinear,
    LipschitzNet,
    MovingBatchNorm2d,
    ScanRepeat,
    SequentialFlow,
    SqueezeLayer,
    get_conv,
    get_dense,
)
from ..layers.protocol import Flow, fold_rng, make_vars
from .modules import PlainConv2d, PlainDense

__all__ = ["ImplicitFlow", "StackedImplicitBlocks", "FCWrapper", "parse_vnorms"]


def parse_vnorms(vnorms: str):
    """'122f' -> domains [1,2,2], codomains [2,2,inf] (implicit_flow.py:292-299)."""
    ps = [float("inf") if p == "f" else float(p) for p in vnorms]
    return ps[:-1], ps[1:]


class FCWrapper(Flow):
    """Flatten -> wrapped flow -> reshape (implicit_flow.py:477-501)."""

    def __init__(self, flow: Flow):
        self.flow = flow

    def init(self, rng, x):
        return self.flow.init(rng, x.reshape(x.shape[0], -1))

    def init_with_batch(self, variables, x, rng=None):
        return self.flow.init_with_batch(variables, x.reshape(x.shape[0], -1), rng=rng)

    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        shape = x.shape
        y, logpy, state = self.flow.forward(
            variables, x.reshape(x.shape[0], -1), logpx, rng=rng, train=train
        )
        return y.reshape(shape), logpy, state

    def inverse(self, variables, y, logpy=None, *, rng=None):
        shape = y.shape
        x, logpx = self.flow.inverse(variables, y.reshape(y.shape[0], -1), logpy, rng=rng)
        return x.reshape(shape), logpx

    def update_lipschitz(self, variables, n_iterations=None):
        return self.flow.update_lipschitz(variables, n_iterations)

    def lipschitz_sigmas(self, variables):
        return self.flow.lipschitz_sigmas(variables)


def build_fc_net(input_shape, idim, nhidden, coeff, domains, codomains,
                 n_iterations, activation_fn, preact, dropout, sn_atol,
                 sn_rtol, learn_p, div_in=1):
    """FCNet (implicit_flow.py:437-474): flatten, nhidden hidden layers of
    width idim, project back to the full dim, reshape."""
    c, h, w = input_shape
    dim = c * h * w
    items = []
    last_dim = dim // div_in
    if preact:
        items.append(ACT_FNS[activation_fn]())
    for i in range(nhidden):
        items.append(get_dense(
            last_dim, idim, coeff=coeff, n_iterations=n_iterations,
            domain=None if learn_p else domains[i],
            codomain=None if learn_p else codomains[i],
            atol=sn_atol, rtol=sn_rtol, learn_p=learn_p,
        ))
        items.append(ACT_FNS[activation_fn]())
        last_dim = idim
    if dropout:
        items.append(Dropout(dropout))
    items.append(get_dense(
        last_dim, dim, coeff=coeff, n_iterations=n_iterations,
        domain=None if learn_p else domains[-1],
        codomain=None if learn_p else codomains[-1],
        atol=sn_atol, rtol=sn_rtol, learn_p=learn_p,
    ))
    return LipschitzNet(items, learn_p=learn_p, flatten_io=True, input_shape=input_shape)


def build_conv_net(initial_size, idim, kernels, coeff, domains, codomains,
                   n_iterations, activation_fn, preact, dropout, sn_atol,
                   sn_rtol, learn_p, batchnorm=False, first_resblock=True):
    """build_nnet (implicit_flow.py:362-399): conv stack with kernel pattern
    e.g. 3-1-3, all stride 1, same padding."""
    c, h, w = initial_size
    ks = list(map(int, kernels.split("-")))
    items = []
    if not first_resblock and preact:
        if batchnorm:
            items.append(MovingBatchNorm2d(c))
        items.append(ACT_FNS[activation_fn]())
    items.append(get_conv(
        c, idim, ks[0], 1, ks[0] // 2, input_hw=(h, w), coeff=coeff,
        n_iterations=n_iterations,
        domain=None if learn_p else domains[0],
        codomain=None if learn_p else codomains[0],
        atol=sn_atol, rtol=sn_rtol, learn_p=learn_p,
    ))
    if batchnorm:
        items.append(MovingBatchNorm2d(idim))
    items.append(ACT_FNS[activation_fn]())
    for i, k in enumerate(ks[1:-1]):
        items.append(get_conv(
            idim, idim, k, 1, k // 2, input_hw=(h, w), coeff=coeff,
            n_iterations=n_iterations,
            domain=None if learn_p else domains[i + 1],
            codomain=None if learn_p else codomains[i + 1],
            atol=sn_atol, rtol=sn_rtol, learn_p=learn_p,
        ))
        if batchnorm:
            items.append(MovingBatchNorm2d(idim))
        items.append(ACT_FNS[activation_fn]())
    if dropout:
        items.append(Dropout(dropout))
    items.append(get_conv(
        idim, c, ks[-1], 1, ks[-1] // 2, input_hw=(h, w), coeff=coeff,
        n_iterations=n_iterations,
        domain=None if learn_p else domains[-1],
        codomain=None if learn_p else codomains[-1],
        atol=sn_atol, rtol=sn_rtol, learn_p=learn_p,
    ))
    if batchnorm:
        items.append(MovingBatchNorm2d(c))
    return LipschitzNet(items, learn_p=learn_p)


class StackedImplicitBlocks(SequentialFlow):
    """One scale of the multiscale stack (implicit_flow.py:254-434)."""

    def __init__(
        self,
        initial_size,
        idim,
        squeeze=True,
        init_layer=None,
        n_blocks=1,
        quadratic=False,
        actnorm=False,
        fc_actnorm=False,
        batchnorm=False,
        dropout=0,
        fc=False,
        coeff=0.9,
        vnorms="122f",
        n_lipschitz_iters=None,
        sn_atol=None,
        sn_rtol=None,
        n_power_series=5,
        n_dist="geometric",
        n_samples=1,
        kernels="3-1-3",
        activation_fn="elu",
        fc_end=True,
        fc_nblocks=2,
        fc_idim=128,
        n_exact_terms=0,
        preact=False,
        neumann_grad=True,
        grad_in_forward=False,
        first_resblock=True,
        learn_p=False,
        n_probes=1,
        scan_blocks=False,
    ):
        chain = []
        domains, codomains = parse_vnorms(vnorms)
        assert len(domains) == len(kernels.split("-"))

        def _actnorm(size, fc_):
            if fc_:
                return FCWrapper(ActNorm1d(size[0] * size[1] * size[2]))
            return ActNorm2d(size[0])

        def _quadratic_layer(size, fc_):
            if fc_:
                c, h, w = size
                return FCWrapper(InvertibleLinear(c * h * w))
            return InvertibleConv2d(size[0])

        def _resblock(size, fc_, idim_=idim, first=True):
            common = dict(
                n_power_series=n_power_series, n_dist=n_dist, n_samples=n_samples,
                n_exact_terms=n_exact_terms, neumann_grad=neumann_grad,
                grad_in_forward=grad_in_forward, n_probes=n_probes,
            )
            if fc_:
                nhidden = len(kernels.split("-")) - 1
                mk = lambda: build_fc_net(
                    size, idim_, nhidden, coeff, domains, codomains,
                    n_lipschitz_iters, activation_fn, preact, dropout,
                    sn_atol, sn_rtol, learn_p,
                )
                return ImplicitBlock(mk(), mk(), **common)
            mk = lambda first_=first: build_conv_net(
                size, idim_, kernels, coeff, domains, codomains,
                n_lipschitz_iters, activation_fn, preact, dropout,
                sn_atol, sn_rtol, learn_p, batchnorm=batchnorm,
                first_resblock=first_,
            )
            return ImplicitBlock(mk(), mk(), **common)

        if init_layer is not None:
            chain.append(init_layer)
        if first_resblock and actnorm:
            chain.append(_actnorm(initial_size, fc))
        if first_resblock and fc_actnorm:
            chain.append(_actnorm(initial_size, True))

        def _unit_layers(first):
            """One repeat of the per-scale pattern (quadratic? block actnorm?
            fc_actnorm?)."""
            items = []
            if quadratic:
                items.append(_quadratic_layer(initial_size, fc))
            items.append(_resblock(initial_size, fc, first=first))
            if actnorm:
                items.append(_actnorm(initial_size, fc))
            if fc_actnorm:
                items.append(_actnorm(initial_size, True))
            return items

        def _emit_blocks():
            """All n_blocks repeats at this scale. With ``scan_blocks`` the
            structurally identical tail collapses into one ScanRepeat (the
            reference unrolls all N — implicit_flow.py:64-97; scanning keeps
            program size / compile time O(1) in depth). The first repeat
            stays eager when ``first_resblock`` since it lacks the preact
            prefix (build_nnet, implicit_flow.py:370-373)."""
            n_eager = (1 if first_resblock else 0) if scan_blocks else n_blocks
            for i in range(min(n_eager, n_blocks)):
                chain.extend(_unit_layers(first=first_resblock and i == 0))
            n_tail = n_blocks - min(n_eager, n_blocks)
            if n_tail > 0:
                chain.append(ScanRepeat(
                    SequentialFlow(_unit_layers(first=False)), n_tail))

        if squeeze:
            _emit_blocks()
            chain.append(SqueezeLayer(2))
        else:
            _emit_blocks()
            if fc_end:
                for _ in range(fc_nblocks):
                    chain.append(_resblock(initial_size, True, fc_idim))
                    if actnorm or fc_actnorm:
                        chain.append(_actnorm(initial_size, True))
        super().__init__(chain)


class ImplicitFlow:
    """Full multiscale model (implicit_flow.py:20-251).

    Not a plain Flow (its forward returns the flattened concat of factored
    z's and optionally classification logits), but shares the same
    variables/threading conventions.
    """

    def __init__(
        self,
        input_size,
        n_blocks=(16, 16),
        intermediate_dim=64,
        factor_out=True,
        quadratic=False,
        init_layer=None,
        actnorm=False,
        fc_actnorm=False,
        batchnorm=False,
        dropout=0,
        fc=False,
        coeff=0.9,
        vnorms="122f",
        n_lipschitz_iters=None,
        sn_atol=None,
        sn_rtol=None,
        n_power_series=5,
        n_dist="geometric",
        n_samples=1,
        kernels="3-1-3",
        activation_fn="elu",
        fc_end=True,
        fc_idim=128,
        n_exact_terms=0,
        preact=False,
        neumann_grad=True,
        grad_in_forward=False,
        first_resblock=True,
        learn_p=False,
        n_probes=1,
        scan_blocks=False,
        classification=False,
        classification_hdim=64,
        n_classes=10,
    ):
        self.input_size = tuple(input_size)
        _, c, h, w = self.input_size
        self.n_scale = min(len(n_blocks), self._calc_n_scale(input_size))
        self.factor_out = factor_out
        self.classification = classification
        self.classification_hdim = classification_hdim
        self.n_classes = n_classes
        if not self.n_scale > 0:
            raise ValueError(f"Could not compute number of scales for input size {input_size}")

        transforms = []
        for i in range(self.n_scale):
            transforms.append(StackedImplicitBlocks(
                initial_size=(c, h, w),
                idim=intermediate_dim,
                squeeze=(i < self.n_scale - 1),  # don't squeeze last scale
                init_layer=init_layer if i == 0 else None,
                n_blocks=n_blocks[i],
                quadratic=quadratic,
                actnorm=actnorm,
                fc_actnorm=fc_actnorm,
                batchnorm=batchnorm,
                dropout=dropout,
                fc=fc,
                coeff=coeff,
                vnorms=vnorms,
                n_lipschitz_iters=n_lipschitz_iters,
                sn_atol=sn_atol,
                sn_rtol=sn_rtol,
                n_power_series=n_power_series,
                n_dist=n_dist,
                n_samples=n_samples,
                kernels=kernels,
                activation_fn=activation_fn,
                fc_end=fc_end,
                fc_idim=fc_idim,
                n_exact_terms=n_exact_terms,
                preact=preact,
                neumann_grad=neumann_grad,
                grad_in_forward=grad_in_forward,
                first_resblock=first_resblock and (i == 0),
                learn_p=learn_p,
                n_probes=n_probes,
                scan_blocks=scan_blocks,
            ))
            c, h, w = c * 2 if factor_out else c * 4, h // 2, w // 2
        self.transforms = transforms
        self.dims = [o[1:] for o in self.calc_output_size(input_size)]

        if classification:
            self._build_multiscale_classifier(input_size)

    @staticmethod
    def _calc_n_scale(input_size):
        _, _, h, w = input_size
        n_scale = 0
        while h >= 4 and w >= 4:
            n_scale += 1
            h //= 2
            w //= 2
        return n_scale

    def calc_output_size(self, input_size):
        n, c, h, w = input_size
        if not self.factor_out:
            k = self.n_scale - 1
            return [[n, c * 4 ** k, h // 2 ** k, w // 2 ** k]]
        output_sizes = []
        for i in range(self.n_scale):
            if i < self.n_scale - 1:
                c *= 2
                h //= 2
                w //= 2
            output_sizes.append((n, c, h, w))
        return tuple(output_sizes)

    def _build_multiscale_classifier(self, input_size):
        n, c, h, w = input_size
        hidden_shapes = []
        for i in range(self.n_scale):
            if i < self.n_scale - 1:
                c *= 2 if self.factor_out else 4
                h //= 2
                w //= 2
            hidden_shapes.append((n, c, h, w))
        self.classification_heads = []
        for hshape in hidden_shapes:
            self.classification_heads.append({
                "conv": PlainConv2d(hshape[1], self.classification_hdim, 3, 1, 1),
                "actnorm": ActNorm2d(self.classification_hdim),
            })
        self.logit_layer = PlainDense(
            self.classification_hdim * len(self.classification_heads), self.n_classes
        )

    # ---- variables ----
    def init(self, rng, x):
        params, states = [], []
        factors = []
        for i, t in enumerate(self.transforms):
            v = t.init(fold_rng(rng, i), x)
            params.append(v["params"])
            states.append(v["state"])
            x = t.init_forward(v, x, rng=fold_rng(rng, 5_000 + i))
            if self.factor_out and i < len(self.transforms) - 1:
                d = x.shape[1] // 2
                x, f = x[:, :d], x[:, d:]
                factors.append(f)
            else:
                factors.append(x)
        variables = make_vars({"transforms": params}, {"transforms": states})
        if self.classification:
            hp, hs = [], []
            for i, head in enumerate(self.classification_heads):
                kc = fold_rng(rng, 20_000 + i)
                cv = head["conv"].init(kc, factors[i])
                an = head["actnorm"].init(fold_rng(rng, 30_000 + i))
                hp.append({"conv": cv["params"], "actnorm": an["params"]})
                hs.append({"conv": cv["state"], "actnorm": an["state"]})
            lv = self.logit_layer.init(fold_rng(rng, 40_000))
            variables["params"]["heads"] = hp
            variables["params"]["logit"] = lv["params"]
            variables["state"]["heads"] = hs
        return variables

    def _t_vars(self, variables, i):
        return {"params": variables["params"]["transforms"][i],
                "state": variables["state"]["transforms"][i]}

    def init_with_batch(self, variables, x, rng=None):
        """Reference restore pass (train_img.py:502-507): thread the batch
        through, letting ActNorms capture their init stats."""
        params = dict(variables["params"])
        states = dict(variables["state"])
        tp = list(params["transforms"])
        ts = list(states["transforms"])
        factors = []
        for i, t in enumerate(self.transforms):
            v = {"params": tp[i], "state": ts[i]}
            v = t.init_with_batch(v, x, rng=fold_rng(rng, i) if rng is not None else None)
            tp[i], ts[i] = v["params"], v["state"]
            x, _, _ = t.forward(v, x, None, rng=fold_rng(rng, 5_000 + i) if rng is not None else None)
            if self.factor_out and i < len(self.transforms) - 1:
                d = x.shape[1] // 2
                x, f = x[:, :d], x[:, d:]
                factors.append(f)
            else:
                factors.append(x)
        params["transforms"], states["transforms"] = tp, ts
        if self.classification:
            hp = list(params["heads"])
            hs = list(states["heads"])
            for i, head in enumerate(self.classification_heads):
                h = head["conv"].apply(
                    {"params": hp[i]["conv"], "state": hs[i]["conv"]}, factors[i]
                )
                an = head["actnorm"].init_with_batch(
                    {"params": hp[i]["actnorm"], "state": hs[i]["actnorm"]}, h
                )
                hp[i] = dict(hp[i], actnorm=an["params"])
                hs[i] = dict(hs[i], actnorm=an["state"])
            params["heads"], states["heads"] = hp, hs
        return make_vars(params, states)

    # ---- forward / inverse ----
    def _apply_head(self, variables, i, f):
        head = self.classification_heads[i]
        hp = variables["params"]["heads"][i]
        hs = variables["state"]["heads"][i]
        h = head["conv"].apply({"params": hp["conv"], "state": hs["conv"]}, f)
        h, _, _ = head["actnorm"].forward({"params": hp["actnorm"], "state": hs["actnorm"]}, h)
        h = jax.nn.relu(h)
        return jnp.mean(h, axis=(2, 3))  # AdaptiveAvgPool2d((1,1))

    def forward(self, variables, x, logpx=None, *, rng=None, train=False,
                classify=False, inverse=False):
        if inverse:
            y, logpy = self.inverse(variables, x, logpx, rng=rng)
            return y, logpy, variables["state"]
        out = []
        class_outs = []
        new_states = []
        for i, t in enumerate(self.transforms):
            v = self._t_vars(variables, i)
            x, logpx, s = t.forward(v, x, logpx, rng=fold_rng(rng, i), train=train)
            new_states.append(s)
            if self.factor_out and i < len(self.transforms) - 1:
                d = x.shape[1] // 2
                x, f = x[:, :d], x[:, d:]
                out.append(f)
            else:
                f = x
            if classify:
                self._check_classification()
                class_outs.append(self._apply_head(variables, i, f if self.factor_out else x))
        out.append(x)
        out_flat = jnp.concatenate([o.reshape(o.shape[0], -1) for o in out], axis=1)
        state = dict(variables["state"], transforms=new_states)
        if classify:
            hcat = jnp.concatenate(class_outs, axis=1)
            logits = self.logit_layer.apply(
                {"params": variables["params"]["logit"], "state": {}}, hcat
            )
            return out_flat, logpx, state, logits
        return out_flat, logpx, state

    def _check_classification(self):
        if not self.classification:
            raise ValueError("model was not built with classification=True")

    def inverse(self, variables, z, logpz=None, *, rng=None):
        """Re-assemble factored z's and run scales backwards
        (implicit_flow.py:221-251)."""
        if self.factor_out:
            z = z.reshape(z.shape[0], -1)
            zs = []
            i = 0
            for dims in self.dims:
                s = int(math.prod(dims))
                zs.append(z[:, i:i + s].reshape((z.shape[0],) + tuple(dims)))
                i += s
            v_last = self._t_vars(variables, len(self.transforms) - 1)
            z_prev, logpz = self.transforms[-1].inverse(
                v_last, zs[-1], logpz, rng=fold_rng(rng, len(self.transforms) - 1)
            )
            for idx in range(len(self.transforms) - 2, -1, -1):
                z_prev = jnp.concatenate((z_prev, zs[idx]), axis=1)
                z_prev, logpz = self.transforms[idx].inverse(
                    self._t_vars(variables, idx), z_prev, logpz, rng=fold_rng(rng, idx)
                )
            return z_prev, logpz
        z = z.reshape((z.shape[0],) + tuple(self.dims[-1]))
        for idx in range(len(self.transforms) - 1, -1, -1):
            z, logpz = self.transforms[idx].inverse(
                self._t_vars(variables, idx), z, logpz, rng=fold_rng(rng, idx)
            )
        return z, logpz

    # ---- maintenance ----
    def update_lipschitz(self, variables, n_iterations=None):
        params = dict(variables["params"])
        states = dict(variables["state"])
        tp = list(params["transforms"])
        ts = list(states["transforms"])
        for i, t in enumerate(self.transforms):
            v = t.update_lipschitz({"params": tp[i], "state": ts[i]}, n_iterations)
            tp[i], ts[i] = v["params"], v["state"]
        params["transforms"], states["transforms"] = tp, ts
        return make_vars(params, states)

    def lipschitz_sigmas(self, variables):
        out = []
        for i, t in enumerate(self.transforms):
            out.extend(t.lipschitz_sigmas(self._t_vars(variables, i)))
        return out

    def lipschitz_one_iter(self, variables):
        total, count = jnp.zeros(()), 0
        for i, t in enumerate(self.transforms):
            tt, cc = t.lipschitz_one_iter(self._t_vars(variables, i))
            total, count = total + tt, count + cc
        return total, count

    def ords(self, variables):
        out = []
        for i, t in enumerate(self.transforms):
            out.extend(t.ords(self._t_vars(variables, i)))
        return out
