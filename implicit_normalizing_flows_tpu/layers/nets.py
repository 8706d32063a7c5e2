"""Residual nets used inside implicit/iResBlocks.

Mirrors the reference's inline net builders: ``build_nnet`` for conv stacks
(``lib/implicit_flow.py:362-399``), ``FCNet`` (``:437-474``) and the toy MLP
builder (``train_toy.py:145-164``). A net is NOT a flow — just a
Lipschitz-bounded map ``g: x -> g(x)`` with the Net protocol
(``init``/``apply``) plus Lipschitz maintenance hooks.

Learned p-orders: one unconstrained order vector ``p`` of length n_lip_layers
lives at the net level; layer i sees ``domain=p[i], codomain=p[(i+1) % L]`` —
the functional equivalent of the reference sharing ``nn.Parameter`` objects
between consecutive layers (``implicit_flow.py:365-366``,
``train_toy.py:150-155`` mixed mode).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .protocol import fold_rng, make_vars


class Dropout:
    """Inverted dropout (reference uses nn.Dropout inside nets; default 0)."""

    def __init__(self, rate):
        self.rate = rate

    def init(self, rng, x):
        return make_vars()

    def apply(self, variables, x, *, rng=None, train=False):
        if not train or rng is None or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)


class LipschitzNet:
    """Ordered stack of Lipschitz layers / activations / dropout.

    Args:
      items: the ordered sub-nets. Items exposing ``one_iter_sigma`` are
        treated as Lipschitz layers for learn-p order threading.
      learn_p: create the shared order vector (asym-squashed at use sites).
      flatten_io: FCNet behaviour (``implicit_flow.py:471-474``): flatten the
        (B, C, H, W) input to (B, D), run the MLP, reshape back to
        ``input_shape``.
      input_shape: per-example output shape when flatten_io.
    """

    def __init__(self, items: Sequence, learn_p: bool = False,
                 flatten_io: bool = False, input_shape=None):
        self.items = list(items)
        self.learn_p = learn_p
        self.flatten_io = flatten_io
        self.input_shape = tuple(input_shape) if input_shape is not None else None
        self.lip_indices = [i for i, it in enumerate(self.items)
                            if hasattr(it, "one_iter_sigma") or hasattr(it, "_normalized_weight")]

    def _orders_for(self, variables, item_index):
        """(domain, codomain) traced values for a lipschitz item, or (None, None)."""
        if not self.learn_p:
            return None, None
        p = variables["params"]["p_orders"]
        pos = self.lip_indices.index(item_index)
        L = len(self.lip_indices)
        return p[pos], p[(pos + 1) % L]

    def init(self, rng, x):
        if self.flatten_io:
            x = x.reshape(x.shape[0], -1)
        params, states = [], []
        for i, item in enumerate(self.items):
            v = item.init(fold_rng(rng, i), x)
            params.append(v["params"])
            states.append(v["state"])
            x = item.apply(v, x)
        p = {"layers": params}
        if self.learn_p:
            p["p_orders"] = jnp.zeros((len(self.lip_indices),))
        return make_vars(p, states)

    def apply(self, variables, x, *, rng=None, train=False):
        orig_shape = x.shape
        if self.flatten_io:
            x = x.reshape(x.shape[0], -1)
        for i, item in enumerate(self.items):
            v = {"params": variables["params"]["layers"][i],
                 "state": variables["state"][i]}
            if i in self.lip_indices:
                d, c = self._orders_for(variables, i)
                x = item.apply(v, x, rng=fold_rng(rng, i), train=train,
                               domain=d, codomain=c)
            else:
                x = item.apply(v, x, rng=fold_rng(rng, i), train=train)
        if self.flatten_io:
            shape = self.input_shape if self.input_shape is not None else orig_shape[1:]
            x = x.reshape((x.shape[0],) + tuple(shape))
        return x

    def conv_chain_data(self, variables, x):
        """Linearization data for the fused Neumann-chain Pallas kernel
        (``ops.fused_chain``), or None when the stack doesn't match.

        Matches the recipe conv stack [act?] conv(k3) act conv(k1) act
        conv(k3) with stride-1 same-padding InducedNorm convs and elementwise
        activations. Returns (s0, s1, s2, w1, w2, w3): the activation
        derivatives at the linearization point ``x`` (s0 = ones when there is
        no preact prefix) and the effective (soft-normalized) conv kernels.
        """
        from .activations import Identity, LipschitzCube, Sin, Swish
        from .lipschitz import InducedNormConv

        if self.flatten_io or self.learn_p:
            return None
        items = self.items
        ew_acts = (Swish, Sin, LipschitzCube, Identity)
        pattern = "".join(
            "a" if isinstance(it, ew_acts)
            else "c" if isinstance(it, InducedNormConv) else "?"
            for it in items)
        if pattern not in ("cacac", "acacac"):
            return None
        preact = pattern == "acacac"
        conv_pos = [i for i, t in enumerate(pattern) if t == "c"]
        act_pos = [i for i, t in enumerate(pattern) if t == "a"]
        convs = [items[i] for i in conv_pos]
        if [cv.kernel_size for cv in convs] != [(3, 3), (1, 1), (3, 3)]:
            return None
        for cv in convs:
            if cv.stride != (1, 1) or cv.padding != (cv.kernel_size[0] // 2,) * 2:
                return None

        def item_vars(i):
            return {"params": variables["params"]["layers"][i],
                    "state": variables["state"][i]}

        def ew_deriv(pos, h):
            # elementwise activation => jvp with a ones tangent is f'(h)
            v = item_vars(pos)
            return jax.jvp(lambda a: items[pos].apply(v, a), (h,),
                           (jnp.ones_like(h),))[1]

        c1, c2, c3 = conv_pos
        if preact:
            a0 = act_pos[0]
            s0 = ew_deriv(a0, x)
            h = items[a0].apply(item_vars(a0), x)
            a1, a2 = act_pos[1], act_pos[2]
        else:
            s0 = jnp.ones_like(x)
            h = x
            a1, a2 = act_pos[0], act_pos[1]
        h1 = items[c1].apply(item_vars(c1), h)
        s1 = ew_deriv(a1, h1)
        h2 = items[c2].apply(item_vars(c2), items[a1].apply(item_vars(a1), h1))
        s2 = ew_deriv(a2, h2)
        w1 = items[c1].effective_weight(item_vars(c1))
        w2 = items[c2].effective_weight(item_vars(c2))
        w3 = items[c3].effective_weight(item_vars(c3))
        return s0, s1, s2, w1, w2, w3

    def conv_forward_data(self, variables):
        """Forward-eval data for the fused Broyden-solve Pallas kernel
        (``ops.fused_solve``), or None when the stack doesn't match.

        Same structural gate as :meth:`conv_chain_data` but restricted to
        Swish activations (the kernel evaluates the nonlinearity itself, not
        just its derivative). Returns a dict with the effective conv kernels
        ``w1/w2/w3``, biases ``b1/b2/b3`` (zeros when bias-free), the
        softplus-resolved swish slopes ``betas`` = (beta0, beta1, beta2)
        (beta0 unused when not preact) and the ``preact`` flag.
        """
        from .activations import Swish
        from .lipschitz import InducedNormConv

        if self.flatten_io or self.learn_p:
            return None
        items = self.items
        pattern = "".join(
            "a" if isinstance(it, Swish)
            else "c" if isinstance(it, InducedNormConv) else "?"
            for it in items)
        if pattern not in ("cacac", "acacac"):
            return None
        preact = pattern == "acacac"
        conv_pos = [i for i, t in enumerate(pattern) if t == "c"]
        act_pos = [i for i, t in enumerate(pattern) if t == "a"]
        convs = [items[i] for i in conv_pos]
        if [cv.kernel_size for cv in convs] != [(3, 3), (1, 1), (3, 3)]:
            return None
        for cv in convs:
            if cv.stride != (1, 1) or cv.padding != (cv.kernel_size[0] // 2,) * 2:
                return None

        def item_vars(i):
            return {"params": variables["params"]["layers"][i],
                    "state": variables["state"][i]}

        def beta_of(pos):
            return jax.nn.softplus(
                variables["params"]["layers"][pos]["beta"]).reshape(())

        c1, c2, c3 = conv_pos
        betas = ([beta_of(act_pos[0])] if preact else [jnp.ones(())])
        betas += [beta_of(act_pos[-2]), beta_of(act_pos[-1])]

        def bias_of(pos, n):
            cv = items[pos]
            if cv.use_bias:
                return variables["params"]["layers"][pos]["bias"]
            return jnp.zeros((n,), jnp.float32)

        return dict(
            w1=items[c1].effective_weight(item_vars(c1)),
            w2=items[c2].effective_weight(item_vars(c2)),
            w3=items[c3].effective_weight(item_vars(c3)),
            b1=bias_of(c1, items[c1].out_channels),
            b2=bias_of(c2, items[c2].out_channels),
            b3=bias_of(c3, items[c3].out_channels),
            betas=jnp.stack(betas),
            preact=preact,
        )

    def update_lipschitz(self, variables, n_iterations=None):
        params = variables["params"]
        states = list(variables["state"])
        for i, item in enumerate(self.items):
            if i not in self.lip_indices:
                continue
            d, c = self._orders_for(variables, i)
            v = item.update_lipschitz(
                {"params": params["layers"][i], "state": states[i]},
                n_iterations, domain=d, codomain=c,
            )
            states[i] = v["state"]
        return make_vars(params, states)

    def lipschitz_sigmas(self, variables):
        out = []
        for i in self.lip_indices:
            out.append(variables["state"][i]["sigma"])
        return out

    def lipschitz_one_iter(self, variables):
        """Sum of differentiable one-step sigmas over learn-p layers
        (``compute_p_grads``, train_toy.py:133-144)."""
        total, count = jnp.zeros(()), 0
        for i in self.lip_indices:
            item = self.items[i]
            if not getattr(item, "learn_p", False) or not hasattr(item, "one_iter_sigma"):
                continue
            d, c = self._orders_for(variables, i)
            if d is None:
                continue
            v = {"params": variables["params"]["layers"][i],
                 "state": variables["state"][i]}
            total = total + item.one_iter_sigma(v, d, c)
            count += 1
        return total, count

    def ords(self, variables):
        from ..ops.power_iter import asym_squash
        out = []
        for i in self.lip_indices:
            item = self.items[i]
            if self.learn_p and getattr(item, "learn_p", False):
                d, c = self._orders_for(variables, i)
                out.extend([float(asym_squash(d)), float(asym_squash(c))])
            else:
                out.extend([getattr(item, "domain", None), getattr(item, "codomain", None)])
        return out
