"""Legacy explicit invertible residual block ``y = x + g(x)``
(reference: ``lib/layers/iresblock.py`` — the Residual Flows model the
implicit repo forked from). Shares the estimator family in ``ops.logdet``;
the inverse is Banach fixed-point iteration ``x <- y - g(x)``
(``iresblock.py:69-79``) with per-example masking on-device.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops import logdet as ld
from .protocol import Flow, make_vars


class IResBlock(Flow):
    def __init__(
        self,
        nnet,
        geom_p=0.5,
        lamb=2.0,
        n_power_series=None,
        exact_trace=False,
        brute_force=False,
        n_samples=1,
        n_exact_terms=2,
        n_exact_terms_test=20,
        n_dist="geometric",
        neumann_grad=True,
        grad_in_forward=False,
        series_cap=24,
    ):
        self.nnet = nnet
        self.geom_p_init = geom_p
        self.lamb_init = lamb
        self.logdet_cfg = ld.LogdetConfig(
            n_dist=n_dist,
            n_samples=n_samples,
            n_power_series=n_power_series,
            n_exact_terms=n_exact_terms,
            n_exact_terms_test=n_exact_terms_test,
            neumann_grad=neumann_grad,
            grad_in_forward=grad_in_forward,
            exact_trace=exact_trace,
            brute_force=brute_force,
            series_cap=series_cap,
        )

    def init(self, rng, x):
        v = self.nnet.init(rng, x)
        p = self.geom_p_init
        params = {
            "nnet": v["params"],
            "geom_p": jnp.asarray(jnp.log(p) - jnp.log1p(-p), jnp.float32),
            "lamb": jnp.asarray(self.lamb_init, jnp.float32),
        }
        state = {
            "nnet": v["state"],
            "last_n_samples": jnp.zeros((self.logdet_cfg.n_samples,), jnp.float32),
            "last_firmom": jnp.zeros((1,), jnp.float32),
            "last_secmom": jnp.zeros((1,), jnp.float32),
        }
        return make_vars(params, state)

    def _net_vars(self, variables):
        return {"params": variables["params"]["nnet"], "state": variables["state"]["nnet"]}

    def init_forward(self, variables, x, rng=None):
        # y = x + g(x) has x's shape; skip the net eval during param init.
        return x

    def forward(self, variables, x, logpx=None, *, rng=None, train=False):
        v = self._net_vars(variables)
        g = self.nnet.apply(v, x, rng=rng, train=train)
        if logpx is None:
            return x + g, None, variables["state"]
        logdet, new_state = self._logdetgrad(variables, x, rng, train)
        return x + g, logpx - logdet, new_state

    def inverse(self, variables, y, logpy=None, *, rng=None):
        """Banach iteration x <- y - g(x) with elementwise tolerance
        (iresblock.py:69-79), per-example masked."""
        v = jax.tree.map(jax.lax.stop_gradient, self._net_vars(variables))
        y = jax.lax.stop_gradient(y)
        atol = rtol = 1e-5
        tol = atol + jnp.abs(y) * rtol
        B = y.shape[0]

        def row_done(x, x_prev):
            d = ((x - x_prev) ** 2 / tol).reshape(B, -1)
            return jnp.all(d < 1.0, axis=1)

        gy = self.nnet.apply(v, y)
        x0 = y - gy

        def cond(carry):
            x, x_prev, i, active = carry
            return jnp.any(active) & (i <= 1000)

        def body(carry):
            x, x_prev, i, active = carry
            x_new = y - self.nnet.apply(v, x)
            mask = active.reshape((B,) + (1,) * (y.ndim - 1))
            x_new = jnp.where(mask, x_new, x)
            x_prev_new = jnp.where(mask, x, x_prev)
            return x_new, x_prev_new, i + 1, active & ~row_done(x_new, x_prev_new)

        x, _, _, _ = jax.lax.while_loop(
            cond, body, (x0, y, jnp.zeros((), jnp.int32), ~row_done(x0, y))
        )
        if logpy is None:
            return x, None
        logdet, _ = self._logdetgrad(variables, x, rng, train=False)
        return x, logpy + logdet

    def _logdetgrad(self, variables, x, rng, train):
        cfg = self.logdet_cfg
        v = self._net_vars(variables)
        apply_fn = self.nnet.apply

        D = int(math.prod(x.shape[1:]))
        if (cfg.brute_force or not train) and (x.ndim == 2 and D <= 10):
            return ld.brute_force_logdet(apply_fn, v, x), variables["state"]

        if rng is None:
            raise ValueError("stochastic logdet estimation requires an rng key")
        k_n, k_e = jax.random.split(rng)
        geom_p = jax.nn.sigmoid(variables["params"]["geom_p"])
        lamb = variables["params"]["lamb"]
        coeffs, n_power, n_samples = ld.sample_n_dist(k_n, cfg, geom_p, lamb, train)
        vareps = ld.sample_rademacher(k_e, x.shape, x.dtype)
        neumann = train and cfg.neumann_grad

        def estimate(apply, vv, y, eps):
            return ld.residual_logdet(
                apply, vv, y, eps, coeffs, n_power,
                neumann=neumann, exact_trace=cfg.exact_trace,
            )

        if train and cfg.grad_in_forward:
            estimate = jax.checkpoint(estimate, static_argnums=(0,))
        logdet = estimate(apply_fn, v, x, vareps)

        state = dict(variables["state"])
        if train and cfg.n_power_series is None:
            est = jax.lax.stop_gradient(logdet)
            state["last_n_samples"] = n_samples.astype(jnp.float32)
            state["last_firmom"] = jnp.mean(est)[None]
            state["last_secmom"] = jnp.mean(est ** 2)[None]
        return logdet, state

    def update_lipschitz(self, variables, n_iterations=None):
        v = self.nnet.update_lipschitz(self._net_vars(variables), n_iterations)
        params = dict(variables["params"], nnet=v["params"])
        state = dict(variables["state"], nnet=v["state"])
        return make_vars(params, state)

    def lipschitz_sigmas(self, variables):
        return self.nnet.lipschitz_sigmas(self._net_vars(variables))

    def lipschitz_one_iter(self, variables):
        return self.nnet.lipschitz_one_iter(self._net_vars(variables))

    def ords(self, variables):
        return self.nnet.ords(self._net_vars(variables))
