"""Lipschitz-constrained dense/conv layers over explicit state.

TPU-native counterpart of the reference's spectral machinery:

* ``InducedNormDense`` / ``InducedNormConv``  <- ``InducedNormLinear`` /
  ``InducedNormConv2d`` (``lib/layers/base/mixed_lipschitz.py:12-403``):
  weight soft-normalised to a Lipschitz coefficient under mixed
  (domain, codomain) p-norms; power-iteration vectors u/v live in ``state``
  and are refreshed out-of-band by ``update_lipschitz`` (the reference's
  forward always uses ``update=False``: ``mixed_lipschitz.py:134-136,388-391``).
* ``SpectralNormDense`` / ``SpectralNormConv``  <- ``lipschitz.py:13-271``
  (classic l2 power iteration; the reference updates it inside the training
  forward — here it shares the out-of-band update pass, which is the same
  schedule the training drivers impose anyway via ``update_lipschitz`` after
  every optimizer step, ``train_img.py:657``).
* ``LopDense`` / ``LopConv``  <- ``lipschitz.py:274-366``: closed-form
  operator-norm bound, no iteration.
* ``LipNormDense`` / ``LipNormConv``  <- ``lipschitz.py:369-459``: sigma as a
  learnable parameter (not routed by the factories, kept for parity).
* factories ``get_dense`` / ``get_conv``  <- ``get_linear``/``get_conv2d``
  (``lipschitz.py:510-531``): InducedNorm by default, Lop for (1, *) and
  (*, inf) norm pairs.

Unlike the reference there is **no lazy shape capture**: conv layers receive
their spatial dims at ``init`` (the example batch), so the ``initialized`` /
``spatial_dims`` buffer dance (``mixed_lipschitz.py:174-239``) disappears.

Learned p-orders (``learn_p``): the reference shares ``nn.Parameter`` order
tensors *between consecutive layers* (codomain_i is domain_{i+1} —
``implicit_flow.py:365-366``). Functionally that sharing lives one level up:
the owning net keeps one order vector and passes traced ``domain``/``codomain``
values into ``apply``; a layer built with ``learn_p=True`` maps them through
``asym_squash`` exactly like ``compute_domain_codomain``
(``mixed_lipschitz.py:68-74``).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops import power_iter as pi
from .protocol import make_vars


def _kaiming_uniform(key, shape, fan_in):
    """torch.nn.init.kaiming_uniform_(a=sqrt(5)) == U(-1/sqrt(fan_in), +)
    (mixed_lipschitz.py:58-66; SURVEY.md §7 parity discipline)."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def _resolve_orders(layer, variables, domain, codomain):
    """Static orders from config, or traced ones squashed through asym_squash."""
    if domain is None:
        domain, codomain = layer.domain, layer.codomain
    if layer.learn_p:
        domain = pi.asym_squash(domain)
        codomain = pi.asym_squash(codomain)
    return domain, codomain


class _LipschitzBase:
    """Shared Net-protocol plumbing for all Lipschitz layers."""

    def update_lipschitz(self, variables, n_iterations=None, domain=None, codomain=None):
        return variables

    def lipschitz_sigmas(self, variables):
        return [variables["state"]["sigma"]]

    def apply(self, variables, x, *, rng=None, train=False, domain=None, codomain=None):
        raise NotImplementedError


class InducedNormDense(_LipschitzBase):
    def __init__(self, in_features, out_features, bias=True, coeff=0.97,
                 domain=2.0, codomain=2.0, n_iterations=None, atol=None,
                 rtol=None, zero_init=False, learn_p=False, **unused):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self.coeff = coeff
        self.domain = domain
        self.codomain = codomain
        self.n_iterations = n_iterations
        self.atol = atol
        self.rtol = rtol
        self.zero_init = zero_init
        self.learn_p = learn_p

    def init(self, rng, x=None):
        kw, kb, ku, kv, kr = jax.random.split(rng, 5)
        w = _kaiming_uniform(kw, (self.out_features, self.in_features), self.in_features)
        if self.zero_init:
            w = w / 1000.0  # mixed_lipschitz.py:60-62
        params = {"weight": w}
        if self.use_bias:
            bound = 1.0 / math.sqrt(self.in_features)
            params["bias"] = jax.random.uniform(kb, (self.out_features,), minval=-bound, maxval=bound)

        domain, codomain = self.domain, self.codomain
        if self.learn_p:
            domain = codomain = 2.0  # init-time iteration uses squashed 0 -> ~2
        u = pi.normalize_u(jax.random.normal(ku, (self.out_features,)), codomain)
        v = pi.normalize_v(jax.random.normal(kv, (self.in_features,)), domain)
        # Init-time 200-iteration settle + best-of-10 restarts for non-(2,2)
        # norms (mixed_lipschitz.py:44-56).
        u, v, _ = pi.induced_norm_dense(w, u, v, domain, codomain, n_iterations=200)
        best_sigma = pi.dense_sigma(w, u, v)
        if not (domain == 2 and codomain == 2) and not self.learn_p:
            for t in range(10):
                k1, k2, kr = jax.random.split(kr, 3)
                u2 = pi.normalize_u(jax.random.normal(k1, (self.out_features,)), codomain)
                v2 = pi.normalize_v(jax.random.normal(k2, (self.in_features,)), domain)
                u2, v2, _ = pi.induced_norm_dense(w, u2, v2, domain, codomain, n_iterations=200)
                s2 = pi.dense_sigma(w, u2, v2)
                take = s2 > best_sigma
                u = jnp.where(take, u2, u)
                v = jnp.where(take, v2, v)
                best_sigma = jnp.maximum(best_sigma, s2)
        return make_vars(params, {"u": u, "v": v, "sigma": best_sigma})

    def _normalized_weight(self, variables, domain=None, codomain=None):
        w = variables["params"]["weight"]
        u = jax.lax.stop_gradient(variables["state"]["u"])
        v = jax.lax.stop_gradient(variables["state"]["v"])
        sigma = pi.dense_sigma(w, u, v)  # differentiable w.r.t. w
        factor = jnp.maximum(1.0, sigma / self.coeff)
        return w / factor, sigma

    def apply(self, variables, x, *, rng=None, train=False, domain=None, codomain=None):
        w, _ = self._normalized_weight(variables)
        y = x @ w.T
        if self.use_bias:
            y = y + variables["params"]["bias"]
        return y

    def update_lipschitz(self, variables, n_iterations=None, domain=None, codomain=None):
        domain, codomain = _resolve_orders(self, variables, domain, codomain)
        n_iterations = n_iterations if n_iterations is not None else self.n_iterations
        w = jax.lax.stop_gradient(variables["params"]["weight"])
        u, v = variables["state"]["u"], variables["state"]["v"]
        u, v, _ = pi.induced_norm_dense(
            w, u, v, domain, codomain,
            n_iterations=n_iterations, atol=self.atol, rtol=self.rtol,
        )
        sigma = pi.dense_sigma(w, u, v)
        return make_vars(variables["params"], {"u": u, "v": v, "sigma": sigma})

    def one_iter_sigma(self, variables, domain, codomain):
        """Differentiable sigma for learn-p (mixed_lipschitz.py:76-83)."""
        if self.learn_p:
            domain = pi.asym_squash(domain)
            codomain = pi.asym_squash(codomain)
        w = jax.lax.stop_gradient(variables["params"]["weight"])
        u = jax.lax.stop_gradient(variables["state"]["u"])
        v = jax.lax.stop_gradient(variables["state"]["v"])
        return pi.dense_one_iter_sigma(w, u, v, domain, codomain)


class InducedNormConv(_LipschitzBase):
    """kxk (or 1x1) conv with induced-norm soft normalisation
    (mixed_lipschitz.py:149-403). ``input_hw`` is the static spatial size."""

    def __init__(self, in_channels, out_channels, kernel_size, stride, padding,
                 input_hw, bias=True, coeff=0.97, domain=2.0, codomain=2.0,
                 n_iterations=None, atol=None, rtol=None, learn_p=False, **unused):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
        self.stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
        self.padding = (padding, padding) if isinstance(padding, int) else tuple(padding)
        self.input_hw = tuple(input_hw)
        self.use_bias = bias
        self.coeff = coeff
        self.domain = domain
        self.codomain = codomain
        self.n_iterations = n_iterations
        self.atol = atol
        self.rtol = rtol
        self.learn_p = learn_p

        h, w = self.input_hw
        self.x_shape = (1, in_channels, h, w)
        oh = (h + 2 * self.padding[0] - self.kernel_size[0]) // self.stride[0] + 1
        ow = (w + 2 * self.padding[1] - self.kernel_size[1]) // self.stride[1] + 1
        self.out_shape = (1, out_channels, oh, ow)
        self.is_1x1 = self.kernel_size == (1, 1) and self.stride == (1, 1)

    def _u_v_sizes(self):
        if self.is_1x1:
            return self.out_channels, self.in_channels
        return int(math.prod(self.out_shape)), int(math.prod(self.x_shape))

    def init(self, rng, x=None):
        kw, kb, ku, kv, kr = jax.random.split(rng, 5)
        fan_in = self.in_channels * self.kernel_size[0] * self.kernel_size[1]
        w = _kaiming_uniform(kw, (self.out_channels, self.in_channels) + self.kernel_size, fan_in)
        params = {"weight": w}
        if self.use_bias:
            bound = 1.0 / math.sqrt(fan_in)
            params["bias"] = jax.random.uniform(kb, (self.out_channels,), minval=-bound, maxval=bound)

        domain, codomain = (2.0, 2.0) if self.learn_p else (self.domain, self.codomain)
        nu, nv = self._u_v_sizes()
        u = pi.normalize_u(jax.random.normal(ku, (nu,)), codomain)
        v = pi.normalize_v(jax.random.normal(kv, (nv,)), domain)
        u, v, _ = self._power_iter(w, u, v, domain, codomain, n_iterations=200)
        best_sigma = self._sigma(w, u, v)
        if not (domain == 2 and codomain == 2) and not self.learn_p:
            for t in range(10):  # mixed_lipschitz.py:220-236
                k1, k2, kr = jax.random.split(kr, 3)
                u2 = pi.normalize_u(jax.random.normal(k1, (nu,)), codomain)
                v2 = pi.normalize_v(jax.random.normal(k2, (nv,)), domain)
                u2, v2, _ = self._power_iter(w, u2, v2, domain, codomain, n_iterations=200)
                s2 = self._sigma(w, u2, v2)
                take = s2 > best_sigma
                u = jnp.where(take, u2, u)
                v = jnp.where(take, v2, v)
                best_sigma = jnp.maximum(best_sigma, s2)
        return make_vars(params, {"u": u, "v": v, "sigma": best_sigma})

    def _power_iter(self, w, u, v, domain, codomain, n_iterations=None, atol=None, rtol=None):
        if self.is_1x1:
            w2 = w.reshape(self.out_channels, self.in_channels)
            return pi.induced_norm_dense(w2, u, v, domain, codomain,
                                         n_iterations=n_iterations, atol=atol, rtol=rtol)
        return pi.induced_norm_conv(
            w, u, v, self.x_shape, self.out_shape, domain, codomain,
            stride=self.stride, padding=self.padding,
            n_iterations=n_iterations, atol=atol, rtol=rtol,
        )

    def _sigma(self, w, u, v):
        if self.is_1x1:
            return pi.dense_sigma(w.reshape(self.out_channels, self.in_channels), u, v)
        return pi.conv_sigma(w, u, v, self.x_shape, self.stride, self.padding)

    def effective_weight(self, variables):
        """The soft-normalized kernel actually convolved in ``apply``
        (w / max(1, sigma/coeff)); consumed by the fused Neumann-chain
        kernel's cotangent matrices."""
        w = variables["params"]["weight"]
        u = jax.lax.stop_gradient(variables["state"]["u"])
        v = jax.lax.stop_gradient(variables["state"]["v"])
        sigma = self._sigma(w, u, v)
        return w / jnp.maximum(1.0, sigma / self.coeff)

    def apply(self, variables, x, *, rng=None, train=False, domain=None, codomain=None):
        y = pi.conv_apply(self.effective_weight(variables), x,
                          self.stride, self.padding)
        if self.use_bias:
            y = y + variables["params"]["bias"][None, :, None, None]
        return y

    def update_lipschitz(self, variables, n_iterations=None, domain=None, codomain=None):
        domain, codomain = _resolve_orders(self, variables, domain, codomain)
        n_iterations = n_iterations if n_iterations is not None else self.n_iterations
        w = jax.lax.stop_gradient(variables["params"]["weight"])
        u, v = variables["state"]["u"], variables["state"]["v"]
        u, v, _ = self._power_iter(w, u, v, domain, codomain,
                                   n_iterations=n_iterations, atol=self.atol, rtol=self.rtol)
        sigma = self._sigma(w, u, v)
        return make_vars(variables["params"], {"u": u, "v": v, "sigma": sigma})

    def one_iter_sigma(self, variables, domain, codomain):
        if self.learn_p:
            domain = pi.asym_squash(domain)
            codomain = pi.asym_squash(codomain)
        w = jax.lax.stop_gradient(variables["params"]["weight"])
        u = jax.lax.stop_gradient(variables["state"]["u"])
        v = jax.lax.stop_gradient(variables["state"]["v"])
        if self.is_1x1:
            w2 = w.reshape(self.out_channels, self.in_channels)
            return pi.dense_one_iter_sigma(w2, u, v, domain, codomain)
        return pi.conv_one_iter_sigma(w, u, v, self.x_shape, self.out_shape,
                                      domain, codomain, self.stride, self.padding)


class SpectralNormDense(InducedNormDense):
    """Plain l2 spectral normalisation (lipschitz.py:13-99). Same data layout
    as InducedNormDense with (2,2) norms; kept as its own class for factory
    parity and because the reference's iteration order differs."""

    def __init__(self, in_features, out_features, bias=True, coeff=0.97,
                 n_iterations=None, atol=None, rtol=None, **unused):
        super().__init__(in_features, out_features, bias=bias, coeff=coeff,
                         domain=2.0, codomain=2.0, n_iterations=n_iterations,
                         atol=atol, rtol=rtol)

    def update_lipschitz(self, variables, n_iterations=None, domain=None, codomain=None):
        n_iterations = n_iterations if n_iterations is not None else self.n_iterations
        w = jax.lax.stop_gradient(variables["params"]["weight"])
        u, v = variables["state"]["u"], variables["state"]["v"]
        u, v, _ = pi.spectral_norm_dense(w, u, v, n_iterations=n_iterations,
                                         atol=self.atol, rtol=self.rtol)
        sigma = pi.dense_sigma(w, u, v)
        return make_vars(variables["params"], {"u": u, "v": v, "sigma": sigma})


class SpectralNormConv(InducedNormConv):
    """l2 spectral normalisation through the conv operator (lipschitz.py:102-262)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride, padding,
                 input_hw, bias=True, coeff=0.97, n_iterations=None, atol=None,
                 rtol=None, **unused):
        super().__init__(in_channels, out_channels, kernel_size, stride, padding,
                         input_hw, bias=bias, coeff=coeff, domain=2.0, codomain=2.0,
                         n_iterations=n_iterations, atol=atol, rtol=rtol)

    def update_lipschitz(self, variables, n_iterations=None, domain=None, codomain=None):
        n_iterations = n_iterations if n_iterations is not None else self.n_iterations
        w = jax.lax.stop_gradient(variables["params"]["weight"])
        u, v = variables["state"]["u"], variables["state"]["v"]
        if self.is_1x1:
            w2 = w.reshape(self.out_channels, self.in_channels)
            u, v, _ = pi.spectral_norm_dense(w2, u, v, n_iterations=n_iterations,
                                             atol=self.atol, rtol=self.rtol)
        else:
            u, v, _ = pi.spectral_norm_conv(w, u, v, self.x_shape, self.out_shape,
                                            self.stride, self.padding,
                                            n_iterations=n_iterations,
                                            atol=self.atol, rtol=self.rtol)
        sigma = self._sigma(w, u, v)
        return make_vars(variables["params"], {"u": u, "v": v, "sigma": sigma})


class LopDense(_LipschitzBase):
    """Closed-form operator-norm bound, no iteration (lipschitz.py:274-317)."""

    def __init__(self, in_features, out_features, bias=True, coeff=0.97,
                 domain=float("inf"), codomain=float("inf"),
                 local_constraint=True, **unused):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self.coeff = coeff
        self.domain = domain
        self.codomain = codomain
        self.local_constraint = local_constraint
        max_across_input, self.norm_type = pi.operator_norm_settings(domain, codomain)
        self.max_across_dim = 1 if max_across_input else 0
        self.learn_p = False

    def init(self, rng, x=None):
        kw, kb = jax.random.split(rng)
        w = _kaiming_uniform(kw, (self.out_features, self.in_features), self.in_features)
        params = {"weight": w}
        if self.use_bias:
            bound = 1.0 / math.sqrt(self.in_features)
            params["bias"] = jax.random.uniform(kb, (self.out_features,), minval=-bound, maxval=bound)
        return make_vars(params, {"sigma": jnp.zeros(())})

    def _normalized_weight(self, w):
        scale = pi.norm_except_dim(w, self.norm_type, dim=self.max_across_dim)
        if not self.local_constraint:
            scale = jnp.max(scale)
        factor = jnp.maximum(1.0, scale / self.coeff)
        return w / factor, jnp.max(scale)

    def apply(self, variables, x, *, rng=None, train=False, domain=None, codomain=None):
        w, _ = self._normalized_weight(variables["params"]["weight"])
        y = x @ w.T
        if self.use_bias:
            y = y + variables["params"]["bias"]
        return y

    def update_lipschitz(self, variables, n_iterations=None, domain=None, codomain=None):
        _, sigma = self._normalized_weight(jax.lax.stop_gradient(variables["params"]["weight"]))
        return make_vars(variables["params"], {"sigma": sigma})


class LopConv(_LipschitzBase):
    """Closed-form operator-norm bound for convs (lipschitz.py:320-366)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride, padding,
                 input_hw=None, bias=True, coeff=0.97, domain=float("inf"),
                 codomain=float("inf"), local_constraint=True, **unused):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
        self.stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
        self.padding = (padding, padding) if isinstance(padding, int) else tuple(padding)
        self.use_bias = bias
        self.coeff = coeff
        self.domain = domain
        self.codomain = codomain
        self.local_constraint = local_constraint
        max_across_input, self.norm_type = pi.operator_norm_settings(domain, codomain)
        self.max_across_dim = 1 if max_across_input else 0
        self.learn_p = False

    def init(self, rng, x=None):
        kw, kb = jax.random.split(rng)
        fan_in = self.in_channels * self.kernel_size[0] * self.kernel_size[1]
        w = _kaiming_uniform(kw, (self.out_channels, self.in_channels) + self.kernel_size, fan_in)
        params = {"weight": w}
        if self.use_bias:
            bound = 1.0 / math.sqrt(fan_in)
            params["bias"] = jax.random.uniform(kb, (self.out_channels,), minval=-bound, maxval=bound)
        return make_vars(params, {"sigma": jnp.zeros(())})

    def _normalized_weight(self, w):
        scale = pi.norm_except_dim(w, self.norm_type, dim=self.max_across_dim)
        if not self.local_constraint:
            scale = jnp.max(scale)
        factor = jnp.maximum(1.0, scale / self.coeff)
        return w / factor, jnp.max(scale)

    def apply(self, variables, x, *, rng=None, train=False, domain=None, codomain=None):
        w, _ = self._normalized_weight(variables["params"]["weight"])
        y = pi.conv_apply(w, x, self.stride, self.padding)
        if self.use_bias:
            y = y + variables["params"]["bias"][None, :, None, None]
        return y

    def update_lipschitz(self, variables, n_iterations=None, domain=None, codomain=None):
        _, sigma = self._normalized_weight(jax.lax.stop_gradient(variables["params"]["weight"]))
        return make_vars(variables["params"], {"sigma": sigma})


class LipNormDense(LopDense):
    """Sigma as a learnable parameter through a sigmoid gate
    (lipschitz.py:369-411; NOT routed by the factories — kept for parity).
    weight_hat = W / scale(W) * sigmoid(s) * coeff."""

    def init(self, rng, x=None):
        v = super().init(rng, x)
        w_scale = pi.norm_except_dim(v["params"]["weight"], self.norm_type,
                                     dim=self.max_across_dim)
        if not self.local_constraint:
            w_scale = jnp.max(w_scale)
        v["params"]["scale"] = _logit_clamped(w_scale / self.coeff)
        return v

    def _normalized_weight(self, w, scale_param=None):
        w_scale = pi.norm_except_dim(w, self.norm_type, dim=self.max_across_dim)
        if not self.local_constraint:
            w_scale = jnp.max(w_scale)
        return w / w_scale * jax.nn.sigmoid(scale_param) * self.coeff, jnp.max(w_scale)

    def apply(self, variables, x, *, rng=None, train=False, domain=None, codomain=None):
        w, _ = self._normalized_weight(variables["params"]["weight"],
                                       variables["params"]["scale"])
        y = x @ w.T
        if self.use_bias:
            y = y + variables["params"]["bias"]
        return y

    def update_lipschitz(self, variables, n_iterations=None, domain=None, codomain=None):
        _, sigma = self._normalized_weight(
            jax.lax.stop_gradient(variables["params"]["weight"]),
            jax.lax.stop_gradient(variables["params"]["scale"]))
        return make_vars(variables["params"], {"sigma": sigma})


class LipNormConv(LopConv):
    """Conv variant of LipNormDense (lipschitz.py:414-459)."""

    def init(self, rng, x=None):
        v = super().init(rng, x)
        w_scale = pi.norm_except_dim(v["params"]["weight"], self.norm_type,
                                     dim=self.max_across_dim)
        if not self.local_constraint:
            w_scale = jnp.max(w_scale)
        v["params"]["scale"] = _logit_clamped(w_scale / self.coeff)
        return v

    def _normalized_weight(self, w, scale_param=None):
        w_scale = pi.norm_except_dim(w, self.norm_type, dim=self.max_across_dim)
        if not self.local_constraint:
            w_scale = jnp.max(w_scale)
        # NB the reference conv variant omits the *coeff factor
        # (lipschitz.py:449 vs :401) — reproduced as-is.
        return w / w_scale * jax.nn.sigmoid(scale_param), jnp.max(w_scale)

    def apply(self, variables, x, *, rng=None, train=False, domain=None, codomain=None):
        w, _ = self._normalized_weight(variables["params"]["weight"],
                                       variables["params"]["scale"])
        y = pi.conv_apply(w, x, self.stride, self.padding)
        if self.use_bias:
            y = y + variables["params"]["bias"][None, :, None, None]
        return y

    def update_lipschitz(self, variables, n_iterations=None, domain=None, codomain=None):
        _, sigma = self._normalized_weight(
            jax.lax.stop_gradient(variables["params"]["weight"]),
            jax.lax.stop_gradient(variables["params"]["scale"]))
        return make_vars(variables["params"], {"sigma": sigma})


def _logit_clamped(p):
    """log(p) + log(1-p) after clamping to [0.1, 0.9] — the reference's odd
    _logit (lipschitz.py:462-464; note it is log(p)+log(1-p), not log(p/(1-p)),
    reproduced as-is for parity)."""
    p = jnp.clip(p, 0.1, 0.9)
    return jnp.log(p + 1e-10) + jnp.log(1 - p + 1e-10)


def get_dense(in_features, out_features, bias=True, coeff=0.97, domain=None,
              codomain=None, **kwargs):
    """Factory routing (lipschitz.py:510-518): InducedNorm by default; Lop for
    (1, *) and (2|inf, inf)."""
    cls = InducedNormDense
    if domain == 1 and codomain in (1, 2, float("inf")):
        cls = LopDense
    elif codomain == float("inf") and domain in (2, float("inf")):
        cls = LopDense
    return cls(in_features, out_features, bias=bias, coeff=coeff,
               domain=domain, codomain=codomain, **kwargs)


def get_conv(in_channels, out_channels, kernel_size, stride, padding, input_hw,
             bias=True, coeff=0.97, domain=None, codomain=None, **kwargs):
    """Factory routing (lipschitz.py:521-531)."""
    cls = InducedNormConv
    if domain == 1 and codomain in (1, 2, float("inf")):
        cls = LopConv
    elif codomain == float("inf") and domain in (2, float("inf")):
        cls = LopConv
    return cls(in_channels, out_channels, kernel_size, stride, padding,
               input_hw=input_hw, bias=bias, coeff=coeff,
               domain=domain, codomain=codomain, **kwargs)
