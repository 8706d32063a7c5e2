"""Induced-norm / spectral-norm power iteration as pure on-device functions.

TPU-native counterpart of the reference's out-of-band Lipschitz machinery
(``/root/reference/lib/layers/base/mixed_lipschitz.py`` and ``lipschitz.py``):
the reference mutates ``u``/``v`` buffers inside modules with host Python
loops; here each step is a pure ``(W, u, v) -> (u, v)`` map run under
``lax.fori_loop`` (fixed budget) or ``lax.while_loop`` (adaptive atol/rtol
with a 200-iteration cap, mirroring ``mixed_lipschitz.py:99-120``), and the
caller threads the returned vectors through its explicit state pytree.

The estimated induced norm ``sigma = <u, W v>`` is differentiable w.r.t. ``W``
(and w.r.t. learned p-orders through ``asym_squash``), which is exactly how
the reference routes gradients into the soft normalization
(``mixed_lipschitz.py:126-131``) and the learn-p penalty
(``compute_one_iter``, ``mixed_lipschitz.py:76-83``).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

MAX_POWER_ITERS = 200  # reference cap: mixed_lipschitz.py:99,284,336


def vector_norm(x, p):
    """sum(|x|^p)^(1/p) over the flattened vector (mixed_lipschitz.py:447-449)."""
    x = x.reshape(-1)
    return jnp.sum(x ** p) ** (1.0 / p)


def projmax(v):
    """One-hot at argmax |v| (mixed_lipschitz.py:406-411)."""
    ind = jnp.argmax(jnp.abs(v))
    return jnp.zeros_like(v).at[ind].set(1.0)


def _l2_normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)


def normalize_v(v, domain):
    """Normalize the right vector under the domain p-norm
    (mixed_lipschitz.py:414-426). ``domain`` may be a static float or a traced
    scalar (learn-p); traced orders always take the general-p branch, exactly
    like the reference's ``torch.is_tensor(domain)`` split."""
    if not isinstance(domain, jax.Array) and domain == 2:
        return _l2_normalize(v)
    if not isinstance(domain, jax.Array) and domain == 1:
        return projmax(v)
    vabs = jnp.abs(v)
    vph = jnp.where(vabs > 0, v / jnp.where(vabs > 0, vabs, 1.0), 1.0)
    vabs = vabs / jnp.max(vabs)
    vabs = vabs ** (1.0 / (domain - 1))
    return vph * vabs / vector_norm(vabs, domain)


def normalize_u(u, codomain):
    """Normalize the left vector under the codomain dual norm
    (mixed_lipschitz.py:429-444)."""
    if not isinstance(codomain, jax.Array) and codomain == 2:
        return _l2_normalize(u)
    if not isinstance(codomain, jax.Array) and codomain == float("inf"):
        return projmax(u)
    uabs = jnp.abs(u)
    uph = jnp.where(uabs > 0, u / jnp.where(uabs > 0, uabs, 1.0), 1.0)
    uabs = uabs / jnp.max(uabs)
    uabs = uabs ** (codomain - 1)
    if not isinstance(codomain, jax.Array) and codomain == 1:
        return uph * uabs / vector_norm(uabs, float("inf"))
    return uph * uabs / vector_norm(uabs, codomain / (codomain - 1))


def leaky_elu(x, a=0.3):
    return a * x + (1 - a) * jax.nn.elu(x)


def asym_squash(x):
    """Map an unconstrained learn-p parameter into (1, 5)-ish order space
    (mixed_lipschitz.py:456-457)."""
    return jnp.tanh(-leaky_elu(-x + 0.5493061829986572)) * 2 + 3


class PowerIterResult(NamedTuple):
    u: jax.Array
    v: jax.Array
    n_iters: jax.Array  # () int32


def _run_power_iteration(step, u, v, n_iterations, atol, rtol):
    """Shared driver: fixed-budget fori_loop, or adaptive while_loop with the
    reference's convergence test (mixed_lipschitz.py:114-120)."""
    if n_iterations is not None:
        def body(i, carry):
            u, v = carry
            return step(u, v)
        u, v = jax.lax.fori_loop(0, n_iterations, body, (u, v))
        return PowerIterResult(u, v, jnp.asarray(n_iterations, jnp.int32))

    if atol is None or rtol is None:
        raise ValueError("Need one of n_iterations or (atol, rtol).")

    def cond(carry):
        u, v, old_u, old_v, i, done = carry
        return (~done) & (i < MAX_POWER_ITERS)

    def body(carry):
        u, v, old_u, old_v, i, _ = carry
        new_u, new_v = step(u, v)
        err_u = jnp.linalg.norm(new_u - u) / (new_u.size ** 0.5)
        err_v = jnp.linalg.norm(new_v - v) / (new_v.size ** 0.5)
        tol_u = atol + rtol * jnp.max(new_u)
        tol_v = atol + rtol * jnp.max(new_v)
        done = (err_u < tol_u) & (err_v < tol_v)
        return new_u, new_v, u, v, i + 1, done

    u, v, _, _, i, _ = jax.lax.while_loop(
        cond, body, (u, v, u, v, jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    )
    return PowerIterResult(u, v, i)


def _static_orders(domain, codomain):
    """True when both orders are static Python numbers (hashable -> jittable
    with a shared cache entry across layers)."""
    return not isinstance(domain, jax.Array) and not isinstance(codomain, jax.Array)


@partial(jax.jit, static_argnames=("domain", "codomain", "n_iterations", "atol", "rtol"))
def _induced_norm_dense_jit(weight, u, v, *, domain, codomain, n_iterations, atol, rtol):
    return _induced_norm_dense_impl(weight, u, v, domain, codomain, n_iterations, atol, rtol)


def _induced_norm_dense_impl(weight, u, v, domain, codomain, n_iterations, atol, rtol):
    def step(u, v):
        u2 = normalize_u(weight @ v, codomain)
        v2 = normalize_v(weight.T @ u2, domain)
        return u2, v2

    return _run_power_iteration(step, u, v, n_iterations, atol, rtol)


def induced_norm_dense(
    weight, u, v, domain, codomain, n_iterations=None, atol=None, rtol=None
):
    """Power-iterate ``u = N_u(W v); v = N_v(W^T u)`` for a dense weight
    (mixed_lipschitz.py:103-124). Runs without gradient; call
    ``dense_sigma`` afterwards for the differentiable norm estimate.

    Dispatched through a module-level jit (static orders/budgets) so repeated
    layer inits/updates with the same shapes share ONE compiled program —
    eager per-layer tracing through the TPU tunnel is orders of magnitude
    slower than the iteration itself."""
    if _static_orders(domain, codomain):
        return _induced_norm_dense_jit(
            weight, u, v, domain=domain, codomain=codomain,
            n_iterations=n_iterations, atol=atol, rtol=rtol)
    return _induced_norm_dense_impl(weight, u, v, domain, codomain, n_iterations, atol, rtol)


def dense_sigma(weight, u, v):
    """sigma = <u, W v>; differentiable w.r.t. W (mixed_lipschitz.py:126)."""
    return jnp.dot(u, weight @ v)


def dense_one_iter_sigma(weight, u, v, domain, codomain):
    """One extra (differentiable) iteration for learn-p gradients
    (``compute_one_iter``, mixed_lipschitz.py:76-83)."""
    u = normalize_u(weight @ v, codomain)
    v = normalize_v(weight.T @ u, domain)
    return jnp.dot(u, weight @ v)


def conv_apply(weight, x, stride, padding):
    """NCHW conv2d with torch-style symmetric int padding."""
    return jax.lax.conv_general_dilated(
        x, weight,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def conv_transpose_apply(weight, y, x_shape, stride, padding):
    """Adjoint of ``conv_apply`` (== F.conv_transpose2d with output_padding=0
    for matching shapes, mixed_lipschitz.py:356-358): computed as the VJP of
    the forward conv so it is the exact linear transpose on any geometry."""
    zeros = jnp.zeros(x_shape, weight.dtype)
    _, vjp = jax.vjp(lambda xx: conv_apply(weight, xx, stride, padding), zeros)
    return vjp(y)[0]


@partial(jax.jit, static_argnames=("x_shape", "out_shape", "domain", "codomain",
                                   "stride", "padding", "n_iterations", "atol", "rtol"))
def _induced_norm_conv_jit(weight, u, v, *, x_shape, out_shape, domain, codomain,
                           stride, padding, n_iterations, atol, rtol):
    return _induced_norm_conv_impl(weight, u, v, x_shape, out_shape, domain,
                                   codomain, stride, padding, n_iterations, atol, rtol)


def _induced_norm_conv_impl(weight, u, v, x_shape, out_shape, domain, codomain,
                            stride, padding, n_iterations, atol, rtol):
    def step(u, v):
        u_s = conv_apply(weight, v.reshape(x_shape), stride, padding)
        u2 = normalize_u(u_s.reshape(-1), codomain)
        v_s = conv_transpose_apply(weight, u2.reshape(out_shape), x_shape, stride, padding)
        v2 = normalize_v(v_s.reshape(-1), domain)
        return u2, v2

    return _run_power_iteration(step, u, v, n_iterations, atol, rtol)


def induced_norm_conv(
    weight, u, v, x_shape, out_shape, domain, codomain,
    stride=(1, 1), padding=(0, 0), n_iterations=None, atol=None, rtol=None,
):
    """Power iteration for a kxk conv treated as one big linear operator
    (mixed_lipschitz.py:328-376). ``u``/``v`` are flat vectors over the full
    output/input feature maps; shapes are static (captured at layer init — no
    lazy ``spatial_dims`` buffers needed on the functional side). Dispatched
    through a shared module-level jit (see induced_norm_dense)."""
    if _static_orders(domain, codomain):
        return _induced_norm_conv_jit(
            weight, u, v, x_shape=tuple(x_shape), out_shape=tuple(out_shape),
            domain=domain, codomain=codomain, stride=tuple(stride),
            padding=tuple(padding), n_iterations=n_iterations, atol=atol, rtol=rtol)
    return _induced_norm_conv_impl(weight, u, v, x_shape, out_shape, domain,
                                   codomain, stride, padding, n_iterations, atol, rtol)


def conv_sigma(weight, u, v, x_shape, stride=(1, 1), padding=(0, 0)):
    """sigma = <u, conv(v)>; differentiable w.r.t. W (mixed_lipschitz.py:378-380)."""
    wv = conv_apply(weight, v.reshape(x_shape), stride, padding)
    return jnp.dot(u.reshape(-1), wv.reshape(-1))


def conv_one_iter_sigma(weight, u, v, x_shape, out_shape, domain, codomain,
                        stride=(1, 1), padding=(0, 0)):
    """Differentiable one-step sigma for learn-p (mixed_lipschitz.py:241-265)."""
    u_s = conv_apply(weight, v.reshape(x_shape), stride, padding)
    u = normalize_u(u_s.reshape(-1), codomain)
    v_s = conv_transpose_apply(weight, u.reshape(out_shape), x_shape, stride, padding)
    v = normalize_v(v_s.reshape(-1), domain)
    wv = conv_apply(weight, v.reshape(x_shape), stride, padding)
    return jnp.dot(u.reshape(-1), wv.reshape(-1))


@partial(jax.jit, static_argnames=("n_iterations", "atol", "rtol"))
def spectral_norm_dense(weight, u, v, n_iterations=None, atol=None, rtol=None):
    """Classic l2 power iteration (lipschitz.py:60-83); note the reference
    updates ``v`` before ``u`` here, opposite of the induced-norm order."""
    def step(u, v):
        v2 = _l2_normalize(weight.T @ u)
        u2 = _l2_normalize(weight @ v2)
        return u2, v2

    return _run_power_iteration(step, u, v, n_iterations, atol, rtol)


@partial(jax.jit, static_argnames=("x_shape", "out_shape", "stride", "padding",
                                   "n_iterations", "atol", "rtol"))
def spectral_norm_conv(weight, u, v, x_shape, out_shape,
                       stride=(1, 1), padding=(0, 0),
                       n_iterations=None, atol=None, rtol=None):
    """l2 power iteration through the conv operator (lipschitz.py:228-247);
    the reference updates v (transpose conv) first, then u."""
    def step(u, v):
        v_s = conv_transpose_apply(weight, u.reshape(out_shape), x_shape, stride, padding)
        v2 = _l2_normalize(v_s.reshape(-1))
        u_s = conv_apply(weight, v2.reshape(x_shape), stride, padding)
        u2 = _l2_normalize(u_s.reshape(-1))
        return u2, v2

    return _run_power_iteration(step, u, v, n_iterations, atol, rtol)


# ---- Closed-form operator-norm bounds (LopLinear/LopConv2d) ----

def operator_norm_settings(domain, codomain):
    """(max_across_input_dims, norm_type) routing table (lipschitz.py:483-507)."""
    if domain == 1 and codomain == 1:
        return True, 1
    if domain == 1 and codomain == 2:
        return True, 2
    if domain == 1 and codomain == float("inf"):
        return True, float("inf")
    if domain == 2 and codomain == float("inf"):
        return False, 2
    if domain == float("inf") and codomain == float("inf"):
        return False, 1
    raise ValueError(f"Unknown combination of domain {domain} and codomain {codomain}")


def norm_except_dim(w, norm_type, dim):
    """p-norm (or max) over all axes except ``dim``, keepdims
    (lipschitz.py:467-480)."""
    axes = tuple(i for i in range(w.ndim) if i != dim)
    if norm_type == float("inf"):
        return jnp.max(jnp.abs(w), axis=axes, keepdims=True)
    return jnp.sum(jnp.abs(w) ** norm_type, axis=axes, keepdims=True) ** (1.0 / norm_type)
