"""Stochastic log-determinant estimators for residual maps ``x + g(x)``.

TPU-native counterpart of the reference estimator family
(``/root/reference/lib/layers/implicit_block.py:370-483``):

* Hutchinson trace estimation with Rademacher probes
  (``implicit_block.py:297-298``),
* an unbiased Russian-roulette truncation of the log-det power series with a
  geometric or Poisson truncation distribution (``:457-483``),
* the **Neumann** gradient estimator — series accumulated without gradient,
  one differentiable VJP at the end, giving O(1)-memory parameter gradients
  (``neumann_logdet_estimator``, ``:429-438``),
* the **basic** differentiable power series (``basic_logdet_estimator``,
  ``:418-426``), used when the logged loss must be the true bpd/NLL,
* exact-trace and brute-force (``slogdet``) oracles (``:323-343, :249-260``).

TPU-first differences:

* The truncation index ``n`` is sampled **on device** from the PRNG key
  (reference: host-side numpy per block per step, ``implicit_block.py:274``).
* The roulette coefficients ``coeff(k) = P̂(N >= k - offset) / P(N >= k -
  offset)`` are computed as one vectorised array over ``k`` (reference: a
  python lambda evaluated per term).
* The Neumann no-grad accumulation is a ``lax.while_loop`` with a *traced*
  trip count (runs exactly ``max(n) + offset`` VJPs); the differentiable basic
  series is a ``lax.scan`` over a static cap with zero-masked coefficients so
  shapes stay static under jit (SURVEY.md §7 hard part 2). The sampled ``n``
  is clipped to the cap; with the default cap the clipped mass is < 1e-6 of
  draws (documented bias far below Monte-Carlo noise).
* The reference's ``MemoryEfficientLogDetEstimator`` (backprop-in-forward,
  ``:373-415``) is unnecessary: wrap the caller in ``jax.checkpoint`` to get
  the same activation-memory/compute trade under XLA.
"""
from __future__ import annotations
from ..config import kernel_config

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class LogdetConfig:
    """Static estimator configuration (reference imBlock ctor args,
    ``implicit_block.py:105-124``)."""

    n_dist: str = "geometric"        # 'geometric' | 'poisson'
    n_samples: int = 1
    n_power_series: int | None = None  # not None => biased fixed truncation
    n_exact_terms: int = 2
    n_exact_terms_test: int = 20
    neumann_grad: bool = True
    grad_in_forward: bool = True       # honored via jax.checkpoint at the block level
    exact_trace: bool = False
    brute_force: bool = False
    series_cap: int = 24               # static tail cap beyond the exact terms
    # Independent Hutchinson probes averaged per step (variance / n_probes).
    # Probes are embarrassingly parallel: on a Mesh with a 'trace' axis the
    # probe dimension shards for free (SURVEY.md §5 long-axis reading).
    n_probes: int = 1


def sample_rademacher(key, shape, dtype=jnp.float32):
    """±1 probes (implicit_block.py:297-298)."""
    return jax.random.bernoulli(key, 0.5, shape).astype(dtype) * 2 - 1


def sample_geometric(key, p, shape):
    """Geometric on {1, 2, ...} with success prob p (numpy semantics of
    ``np.random.geometric``, implicit_block.py:457-458), via inverse CDF."""
    u = jax.random.uniform(key, shape, minval=jnp.finfo(jnp.float32).tiny, maxval=1.0)
    n = jnp.floor(jnp.log(u) / jnp.log1p(-p)) + 1.0
    return jnp.maximum(n, 1.0).astype(jnp.int32)


def geometric_1mcdf(p, k, offset):
    """P(n >= k - offset), == 1 for k <= offset (implicit_block.py:461-467)."""
    kk = jnp.maximum(k - offset, 1)
    return jnp.where(k <= offset, 1.0, (1.0 - p) ** jnp.maximum(kk - 1, 0))


def poisson_1mcdf(lamb, k, offset, max_k):
    """P(n >= k - offset) for Poisson (implicit_block.py:470-483):
    1 - exp(-lamb) * sum_{i=0}^{kk-2}... — note the reference sums
    ``1 + sum_{i=1}^{kk-1} lamb^i/i!`` which is P(N <= kk-1) + exp supported
    here as a vectorised cumulative sum up to the static ``max_k``."""
    i = jnp.arange(0, max_k + 1, dtype=jnp.float32)
    log_terms = i * jnp.log(jnp.maximum(lamb, 1e-20)) - jax.lax.lgamma(i + 1.0)
    cum = jnp.cumsum(jnp.exp(log_terms))  # cum[j] = sum_{i<=j} lamb^i / i!
    kk = jnp.clip(k - offset, 1, max_k + 1)
    s = cum[jnp.minimum(kk - 1, max_k)]
    return jnp.where(k <= offset, 1.0, 1.0 - jnp.exp(-lamb) * s)


def sample_n_dist(key, cfg: LogdetConfig, geom_p, lamb, train: bool):
    """Draw the roulette truncations and build the masked coefficient vector.

    Returns ``(coeffs, n_power, n_samples)`` where ``coeffs`` has static
    length ``offset + series_cap`` with ``coeffs[k-1]`` multiplying the k-th
    power-series term (zero beyond ``n_power = max(n_samples) + offset``).
    Mirrors ``coeff_fn`` in ``implicit_block.py:276-289``.
    """
    offset = cfg.n_exact_terms if train else cfg.n_exact_terms_test
    cap = offset + cfg.series_cap

    if cfg.n_power_series is not None and train:
        # Biased fixed truncation (implicit_block.py:279-281).
        n_power = jnp.asarray(min(cfg.n_power_series, cap), jnp.int32)
        ks = jnp.arange(1, cap + 1)
        coeffs = (ks <= n_power).astype(jnp.float32)
        return coeffs, n_power, jnp.zeros((cfg.n_samples,), jnp.int32)

    geom_p = jax.lax.stop_gradient(geom_p)
    lamb = jax.lax.stop_gradient(lamb)
    if cfg.n_dist == "geometric":
        n_samples = sample_geometric(key, geom_p, (cfg.n_samples,))
    elif cfg.n_dist == "poisson":
        n_samples = jax.random.poisson(key, lamb, (cfg.n_samples,)).astype(jnp.int32)
    else:
        raise ValueError(f"unknown n_dist {cfg.n_dist}")
    n_samples = jnp.minimum(n_samples, cfg.series_cap)  # static-shape clip

    n_power = jnp.max(n_samples) + offset
    ks = jnp.arange(1, cap + 1)
    if cfg.n_dist == "geometric":
        rcdf = geometric_1mcdf(geom_p, ks, offset)
    else:
        rcdf = poisson_1mcdf(lamb, ks, offset, cfg.series_cap)
    frac = jnp.mean(
        (n_samples[None, :] >= (ks[:, None] - offset)).astype(jnp.float32), axis=1
    )
    coeffs = jnp.where(ks <= n_power, frac / rcdf, 0.0)
    return coeffs, n_power, n_samples


def _batch_dot(a, b, batch_ndim=1):
    """Sum over all but the leading batch_ndim axes; accumulate in f32 (the
    operands may be bf16 when the estimator runs in reduced precision)."""
    axes = tuple(range(batch_ndim, a.ndim))
    return jnp.sum(a.astype(jnp.float32) * b.astype(jnp.float32), axis=axes)


def neumann_logdet_estimator(apply_fn, params, x, vareps, coeffs, n_power,
                             batch_ndim=1):
    """O(1)-memory gradient estimator (implicit_block.py:429-438).

    ``v_k = J^k eps`` accumulated with roulette weights under stop-gradient
    (the loop trip count is the traced ``n_power`` — no wasted VJPs), then a
    single differentiable VJP: ``logdet_hat = <J^T neumann_v, eps>``.
    """
    # Differentiable VJP closure (params traced => grads flow to them).
    _, vjp_fn = jax.vjp(lambda xx: apply_fn(params, xx), x)
    # Fully detached copy for the no-grad accumulation.
    params_sg = jax.tree.map(jax.lax.stop_gradient, params)
    x_sg = jax.lax.stop_gradient(x)
    _, vjp_sg = jax.vjp(lambda xx: apply_fn(params_sg, xx), x_sg)
    vareps_sg = jax.lax.stop_gradient(vareps)
    coeffs_sg = jax.lax.stop_gradient(coeffs)

    def cond(carry):
        k, _, _ = carry
        return k <= n_power

    def body(carry):
        k, vjp_k, acc = carry
        vjp_k = vjp_sg(vjp_k)[0]
        sign = jnp.where(k % 2 == 0, 1.0, -1.0)  # (-1)^k
        c = jax.lax.dynamic_index_in_dim(coeffs_sg, k - 1, keepdims=False)
        # keep the carry dtype stable under reduced-precision runs
        w = (sign * c).astype(acc.dtype)
        return k + 1, vjp_k, acc + w * vjp_k

    _, _, neumann_v = jax.lax.while_loop(
        cond, body, (jnp.ones((), jnp.int32), vareps_sg, vareps_sg)
    )
    if _final_form() == "jvp":
        # <J^T v, eps> == <v, J eps>: the JVP form builds a forward-over-
        # reverse gradient plan instead of reverse-over-reverse — same value
        # and gradients, different XLA program (perf knob IMNF_FINAL_FORM).
        _, jac_eps = jax.jvp(lambda xx: apply_fn(params, xx), (x,), (vareps_sg,))
        return _batch_dot(jax.lax.stop_gradient(neumann_v), jac_eps, batch_ndim)
    vjp_jac = vjp_fn(jax.lax.stop_gradient(neumann_v))[0]
    return _batch_dot(vjp_jac, vareps, batch_ndim)


def neumann_logdet_pair_fused(apply_x, params_x, x, vareps_x,
                              apply_z, params_z, z, vareps_z,
                              chain_x, chain_z, coeffs, n_power,
                              interpret=False, reps=1):
    """Both nets' Neumann estimates with the stop-gradient chains fused into
    ONE Pallas kernel (``ops.fused_chain``) — semantics identical to two
    :func:`neumann_logdet_estimator` calls (same signed coefficients, same
    traced trip count; float reassociation only).

    ``chain_*`` is (s0, s1, s2, w1, w2, w3) from
    ``LipschitzNet.conv_chain_data`` at the same cast/precision as the
    ``apply`` closures. Returns ``(logdet_x_hat, logdet_z_hat)``.
    """
    from .fused_chain import (
        conv1x1_transpose_mat,
        conv3_transpose_mats,
        conv3_transpose_mats_cout,
        fused_neumann_chain2,
    )

    acc_x, acc_z = neumann_pair_accs(x, vareps_x, z, vareps_z, chain_x,
                                     chain_z, coeffs, n_power,
                                     interpret=interpret, reps=reps)
    return (neumann_final(apply_x, params_x, x, vareps_x, acc_x),
            neumann_final(apply_z, params_z, z, vareps_z, acc_z))


def neumann_pair_accs(x, vareps_x, z, vareps_z, chain_x, chain_z, coeffs,
                      n_power, interpret=False, reps=1):
    """Both nets' stop-gradient Neumann accumulations via the fused chain
    kernel (``ops.fused_chain``), returned in the inputs' (B, c, H, W)
    shape (f32). Feed to :func:`neumann_final` / the fused final kernel.
    ``reps`` lane-packs that many examples per kernel program (small spatial
    dims; see ``fused_chain.pack_reps``)."""
    from .fused_chain import (
        conv1x1_transpose_mat,
        conv3_transpose_mats,
        conv3_transpose_mats_cout,
        fused_neumann_chain2,
        pack_reps,
        unpack_reps,
    )

    B, c, H, W = x.shape
    c8 = max(8, -(-c // 8) * 8)
    cap = coeffs.shape[0]
    ks = jnp.arange(1, cap + 1)
    signed = jnp.where(ks % 2 == 0, 1.0, -1.0) * jax.lax.stop_gradient(coeffs)

    def prep(eps, data):
        s0, s1, s2, w1, w2, w3 = [jax.lax.stop_gradient(a) for a in data]
        eps = jax.lax.stop_gradient(eps)
        pad = lambda a: jnp.pad(a, ((0, 0), (0, c8 - c), (0, 0), (0, 0)))
        flat = lambda a: pack_reps(
            a.reshape(a.shape[0], a.shape[1], H * W), reps)
        return (flat(pad(eps)), flat(pad(s0)), flat(s1), flat(s2),
                conv3_transpose_mats(w3, c8), conv1x1_transpose_mat(w2),
                conv3_transpose_mats_cout(w1, c8))

    acc_x, acc_z = fused_neumann_chain2(
        prep(vareps_x, chain_x), prep(vareps_z, chain_z), signed, n_power,
        H=H, W=W, reps=reps, interpret=interpret)
    unpad = lambda a: unpack_reps(a, reps)[:, :c].reshape(B, c, H, W)
    return unpad(acc_x), unpad(acc_z)


def _final_form():
    import os
    return kernel_config().final_form


def neumann_final(apply_fn, params, y, eps, acc):
    """The single differentiable term closing a Neumann-chain accumulation
    (grads to params and y), as in ``neumann_logdet_estimator``: returns
    ``<J^T acc, eps>`` with ``acc`` stop-gradient. IMNF_FINAL_FORM=jvp
    computes the equal-value ``<acc, J eps>`` instead (different AD plan)."""
    import os
    acc = acc.astype(y.dtype)
    if kernel_config().ablate == "final":
        # Timing-attribution ablation (WRONG estimator/gradients — perf
        # experiments only): skip the differentiable VJP.
        return _batch_dot(acc, eps)
    if _final_form() == "jvp":
        _, jac_eps = jax.jvp(lambda yy: apply_fn(params, yy), (y,),
                             (jax.lax.stop_gradient(eps),))
        return _batch_dot(jax.lax.stop_gradient(acc), jac_eps)
    _, vjp_fn = jax.vjp(lambda yy: apply_fn(params, yy), y)
    return _batch_dot(vjp_fn(jax.lax.stop_gradient(acc))[0], eps)


def basic_logdet_estimator(apply_fn, params, x, vareps, coeffs, batch_ndim=1):
    """Differentiable power series (implicit_block.py:418-426):
    ``sum_k (-1)^(k+1)/k * coeff(k) * <eps, J^k eps>`` as a lax.scan over the
    static coefficient vector (zero coefficients contribute exactly zero)."""
    _, vjp_fn = jax.vjp(lambda xx: apply_fn(params, xx), x)
    cap = coeffs.shape[0]
    ks = jnp.arange(1, cap + 1).astype(jnp.float32)
    signs = jnp.where(jnp.arange(1, cap + 1) % 2 == 1, 1.0, -1.0)  # (-1)^(k+1)
    weights = signs / ks * coeffs

    def step(carry, w):
        vjp_k, acc = carry
        vjp_k = vjp_fn(vjp_k)[0]
        acc = acc + w * _batch_dot(vjp_k, vareps, batch_ndim)
        return (vjp_k, acc), None

    (_, logdet), _ = jax.lax.scan(
        step, (vareps, jnp.zeros(x.shape[:batch_ndim], x.dtype)), weights
    )
    return logdet


def _batch_jacobian(apply_fn, params, x):
    """(B, D, D) Jacobian of the flattened residual map (implicit_block.py:358-362)."""
    flat = x.reshape(x.shape[0], -1)

    def single(xf):
        f = lambda xx: apply_fn(params, xx.reshape((1,) + x.shape[1:])).reshape(-1)
        return jax.jacrev(f)(xf)

    return jax.vmap(single)(flat)


def exact_trace_logdet(apply_fn, params, x, coeffs):
    """Power series with exact traces of J^k (implicit_block.py:323-343)."""
    J = _batch_jacobian(apply_fn, params, x)
    cap = coeffs.shape[0]
    ks = jnp.arange(1, cap + 1).astype(jnp.float32)
    signs = jnp.where(jnp.arange(1, cap + 1) % 2 == 1, 1.0, -1.0)
    weights = signs / ks * coeffs

    def step(carry, w):
        Jk, acc = carry
        tr = jnp.trace(Jk, axis1=1, axis2=2)
        acc = acc + w * tr
        return (jnp.einsum("bij,bjk->bik", J, Jk), acc), None

    (_, logdet), _ = jax.lax.scan(
        step, (J, jnp.zeros((x.shape[0],), x.dtype)), weights
    )
    return logdet


def brute_force_logdet(apply_fn, params, x):
    """Exact ``logdet(I + J_g)`` via the full Jacobian + slogdet — the built-in
    correctness oracle for small dims (implicit_block.py:249-260)."""
    J = _batch_jacobian(apply_fn, params, x)
    eye = jnp.eye(J.shape[-1], dtype=J.dtype)
    _, logdet = jnp.linalg.slogdet(eye[None] + J)
    return logdet


def residual_logdet(
    apply_fn: Callable,
    params,
    x,
    vareps,
    coeffs,
    n_power,
    *,
    neumann: bool,
    exact_trace: bool = False,
):
    """Dispatch used by the implicit block for each of its two nets
    (``_logdetgrad``, implicit_block.py:291-343). Callers with a stacked
    layout vmap this over the stack axis (the round-1 stacked-two-nets
    estimator was removed after measuring slower than sequential chains)."""
    if exact_trace:
        return exact_trace_logdet(apply_fn, params, x, coeffs)
    if neumann:
        return neumann_logdet_estimator(apply_fn, params, x, vareps, coeffs,
                                        n_power)
    return basic_logdet_estimator(apply_fn, params, x, vareps, coeffs)
