"""Fused Pallas kernel for the Neumann estimator's VJP chain.

The dominant cost of a CIFAR-recipe train step is the log-det estimator's
stop-gradient power-series accumulation (``ops.logdet.neumann_logdet_
estimator``): ~13 sequential applications of ``u <- J_g^T u`` through each
residual conv net (reference semantics: ``implicit_block.py:429-438``). Under
XLA every application streams the two swish-derivative tensors (B, 512, H, W)
from HBM — measured ~0.7-1.8 ms per application on v5e, ~4-5x over the HBM
roofline, because nothing is resident across applications.

This kernel runs the *entire* chain for one example per grid step with the
activation-derivative tensors resident in VMEM: traffic drops from
O(n_power * |s|) to O(|s|). It is specialised to the recipe's conv stack

    [preact act?] conv k3 (c->M) -> act -> conv 1x1 (M->M) -> act -> conv k3 (M->c)

with stride 1, same padding, elementwise activations (swish/sin/...). The
Jacobian transpose is

    J^T = S0 . C1^T . S1 . C2^T . S2 . C3^T

applied as: 9-offset shifted matmuls for the 3x3 conv transposes (kernel
matrices pre-arranged XLA-side), one (M, M) matmul for the 1x1, elementwise
multiplies for the S_i. Spatial shifts are lane rolls over the flattened HW
axis with border masks.

Exactness: the accumulation reproduces the while_loop in
``neumann_logdet_estimator`` term for term (same signed coefficients, same
traced trip count); only float reassociation differs. Anything that doesn't
match the stack pattern falls back to the XLA path.
"""
from __future__ import annotations
from ..config import kernel_config

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_neumann_chain", "fused_neumann_chain2",
           "conv3_transpose_mats", "conv3_transpose_mats_cout",
           "conv1x1_transpose_mat", "pack_reps", "unpack_reps", "choose_reps"]


def pack_reps(a, reps):
    """(B, C, HW) -> (B//reps, C, reps*HW): lane-concatenate ``reps``
    consecutive examples per kernel program. At small spatial dims (8x8 the
    CIFAR recipe's last scale) a single example's HW=64 lanes leave the MXU
    nearly idle; packing restores full 128-lane tiles. Group boundaries stay
    inside a 'data' shard as long as the per-shard batch is a multiple of
    ``reps`` (``choose_reps`` guarantees it)."""
    if reps == 1:
        return a
    B, C, HW = a.shape
    return (a.reshape(B // reps, reps, C, HW)
            .transpose(0, 2, 1, 3)
            .reshape(B // reps, C, reps * HW))


def unpack_reps(a, reps):
    """Inverse of :func:`pack_reps`."""
    if reps == 1:
        return a
    Bg, C, RHW = a.shape
    HW = RHW // reps
    return (a.reshape(Bg, C, reps, HW)
            .transpose(0, 2, 1, 3)
            .reshape(Bg * reps, C, HW))


def choose_reps(B, H, W, target=None):
    """Examples to lane-pack per program: enough to reach
    IMNF_FUSED_PACK_LANES lanes, constrained to divide the PER-SHARD batch
    when a 'data' mesh axis is active (so packed groups never straddle
    shards).

    Default 256 (two full MXU tiles: reps=4 at the 8x8 scale, 1 at >=16x16)
    from a CIFAR-recipe sweep on v5e — samples/s by target: 64 (=never
    pack) 952, 256 -> 959, 512 -> 940, 1024 -> 948, 2048 -> 827. Packing the
    8x8 blocks beats their XLA fallback slightly; packing 16x16 (where the
    per-example kernels already run well) only adds while-loop convoy
    overhead (the packed solve runs to the slowest packed example's
    iteration count)."""
    import os

    from jax.sharding import get_abstract_mesh

    m = get_abstract_mesh()
    ndata = 1
    if "data" in getattr(m, "axis_names", ()):
        ndata = dict(m.shape).get("data", 1)
    if B % ndata:
        return 1
    b_local = B // ndata
    if target is None:
        target = kernel_config().fused_pack_lanes
    r = max(1, min(b_local, target // (H * W)))
    while b_local % r:
        r -= 1
    return r


def _pad_rows(a, rows, axis):
    """Zero-pad ``axis`` of ``a`` up to ``rows``."""
    if a.shape[axis] == rows:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, rows - a.shape[axis])
    return jnp.pad(a, pad)


def conv3_transpose_mats(w, c8):
    """(O=c, I=mid, 3, 3) conv kernel -> (mid, 9*c8) im2col cotangent matrix.

    For y = conv(x, w) (stride 1, same padding), the cotangent map is
    t(i, p) = sum_{o, d} w[o, i, dy+1, dx+1] * u(o, p - d); offset index
    d = (dy+1)*3 + (dx+1). Columns are offset-major, channel-minor to match
    the kernel's im2col stack; the O (cotangent input) axis is padded to
    ``c8`` per offset group.
    """
    m = jnp.transpose(w, (2, 3, 1, 0)).reshape(9, w.shape[1], w.shape[0])
    m = _pad_rows(m, c8, axis=2)                   # (9, mid, c8)
    return jnp.transpose(m, (1, 0, 2)).reshape(w.shape[1], 9 * c8)


def conv3_transpose_mats_cout(w, c8):
    """(O=mid, I=c, 3, 3) -> (9*c8, mid): stacked per-offset cotangent mats
    for the conv whose cotangent OUTPUT carries the small image-channel count
    (rows offset-major, channel-minor, padded per offset group)."""
    m = jnp.transpose(w, (2, 3, 1, 0)).reshape(9, w.shape[1], w.shape[0])
    m = _pad_rows(m, c8, axis=1)                   # (9, c8, mid)
    return m.reshape(9 * c8, w.shape[0])


def conv1x1_transpose_mat(w):
    """(O, I, 1, 1) -> (I, O) cotangent matmul matrix."""
    return jnp.transpose(w[:, :, 0, 0])


def _make_shifted(H, W, reps=1):
    """shift helper: t(:, p - (dy, dx)) with zeros outside the image, as a
    lane roll over the flattened HW axis plus a border mask.

    ``reps`` > 1 packs that many examples along the lane axis (period H*W):
    the border masks are computed on per-example LOCAL coordinates
    (``lane % HW``), which exactly kills the roll's cross-example
    contamination — for every |dy|,|dx| <= 1 offset, each lane that would
    read a neighbouring example's pixels is an image-border lane the mask
    zeroes anyway (checked case by case for all 9 offsets)."""
    from jax.experimental.pallas import tpu as pltpu

    HW = H * W
    RHW = reps * HW
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, RHW), 1)
    yy = (lane // W) % H
    xx = lane % W

    def mask_for(dy, dx):
        m = jnp.ones((1, RHW), jnp.bool_)
        if dy == 1:
            m = m & (yy >= 1)
        elif dy == -1:
            m = m & (yy < H - 1)
        if dx == 1:
            m = m & (xx >= 1)
        elif dx == -1:
            m = m & (xx < W - 1)
        return m

    def shifted(t, dy, dx):
        s = (dy * W + dx) % RHW  # pltpu.roll requires a non-negative shift
        # Mosaic only implements 32-bit rotates: roll in f32, cast back.
        r = pltpu.roll(t.astype(jnp.float32), s, 1).astype(t.dtype) if s else t
        return jnp.where(mask_for(dy, dx), r, jnp.zeros_like(r))

    return shifted


_OFFSETS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _make_apply_jt(shifted, s0, s1, s2, m3_ref, m2_ref, m1_ref, u9_ref,
                   c8, mid, HW, cdtype):
    """Build u -> J^T u for one net from VMEM-resident operands.

    Only the SMALL c8-channel tensors are ever rolled: the C3^T side im2cols
    u (9 shifted copies -> one K=9*c8 matmul); the C1^T side computes all 9
    per-offset products in one M=9*c8 matmul and shifts the small results.
    Rolling the (mid, HW) tensors instead was measured 1.4x slower than XLA
    end to end.
    """
    f32 = jnp.float32

    def apply_JT(u):
        for d, (dy, dx) in enumerate(_OFFSETS):
            u9_ref[d * c8:(d + 1) * c8] = shifted(u, dy, dx)   # (9*c8, HW)
        t = jax.lax.dot_general(m3_ref[:], u9_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)    # (mid, HW)
        t = (t * s2.astype(f32)).astype(cdtype)
        # C2^T (1x1)
        t = jax.lax.dot_general(m2_ref[:], t, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
        t = (t * s1.astype(f32)).astype(cdtype)
        # v = C1^T t: R[d] = M1[d] @ t for all offsets at once, then
        # v = sum_d shift_d(R[d])
        R = jax.lax.dot_general(m1_ref[:], t, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)    # (9*c8, HW)
        v = jnp.zeros((c8, HW), f32)
        for d, (dy, dx) in enumerate(_OFFSETS):
            v += shifted(R[d * c8:(d + 1) * c8], dy, dx)
        return (v * s0.astype(f32)).astype(cdtype)

    return apply_JT


def _chain_kernel(n_ref, sc_ref, eps_ref, s0_ref, s1_ref, s2_ref,
                  m3_ref, m2_ref, m1_ref, out_ref, u9_ref, *, H, W, reps,
                  c8, mid, cdtype):
    """One example (or ``reps`` lane-packed examples): run the full
    signed-coefficient Neumann accumulation."""
    f32 = jnp.float32
    shifted = _make_shifted(H, W, reps)
    apply_JT = _make_apply_jt(shifted, s0_ref[0], s1_ref[0], s2_ref[0],
                              m3_ref, m2_ref, m1_ref, u9_ref,
                              c8, mid, reps * H * W, cdtype)

    def body(k, carry):
        u, acc = carry
        u = apply_JT(u)
        return u, acc + sc_ref[k] * u.astype(f32)

    eps = eps_ref[0]
    n_power = n_ref[0]
    _, acc = jax.lax.fori_loop(0, n_power, body,
                               (eps, eps.astype(f32)))
    out_ref[0] = acc


def _chain2_kernel(n_ref, sc_ref,
                   epsx_ref, s0x_ref, s1x_ref, s2x_ref,
                   epsz_ref, s0z_ref, s1z_ref, s2z_ref,
                   m3x_ref, m2x_ref, m1x_ref,
                   m3z_ref, m2z_ref, m1z_ref,
                   outx_ref, outz_ref, u9x_ref, u9z_ref,
                   *, H, W, reps, c8, mid, cdtype):
    """Both nets' chains interleaved in one loop: the two chains are
    independent, so each iteration exposes twice the instruction-level
    parallelism (MXU work of one chain overlaps VPU rolls/masks of the
    other)."""
    f32 = jnp.float32
    shifted = _make_shifted(H, W, reps)
    jt_x = _make_apply_jt(shifted, s0x_ref[0], s1x_ref[0], s2x_ref[0],
                          m3x_ref, m2x_ref, m1x_ref, u9x_ref,
                          c8, mid, reps * H * W, cdtype)
    jt_z = _make_apply_jt(shifted, s0z_ref[0], s1z_ref[0], s2z_ref[0],
                          m3z_ref, m2z_ref, m1z_ref, u9z_ref,
                          c8, mid, reps * H * W, cdtype)

    def body(k, carry):
        ux, uz, accx, accz = carry
        ux = jt_x(ux)
        uz = jt_z(uz)
        c = sc_ref[k]
        return ux, uz, accx + c * ux.astype(f32), accz + c * uz.astype(f32)

    ex, ez = epsx_ref[0], epsz_ref[0]
    n_power = n_ref[0]
    _, _, accx, accz = jax.lax.fori_loop(
        0, n_power, body, (ex, ez, ex.astype(f32), ez.astype(f32)))
    outx_ref[0] = accx
    outz_ref[0] = accz


@functools.partial(jax.jit, static_argnames=("H", "W", "reps", "interpret"))
def fused_neumann_chain(eps, s0, s1, s2, m3, m2, m1, signed_coeffs, n_power,
                        *, H, W, reps=1, interpret=False):
    """acc = eps + sum_{k=1}^{n_power} signed_coeffs[k-1] * (J^T)^k eps.

    Args:
      eps: (B, c8, HW) probe, channel-padded to a multiple of 8; its dtype
        (bf16 in production, f32 in exactness tests) is the chain compute
        dtype.
      s0/s1/s2: activation derivatives at the linearization point,
        (B, c8, HW) / (B, mid, HW) / (B, mid, HW) bf16 (s0 = ones when the
        net has no preact activation).
      m3: (mid, 9*c8) im2col cotangent matrix; m2: (mid, mid);
        m1: (9*c8, mid) stacked per-offset cotangent mats.
      signed_coeffs: (cap,) f32 — roulette coefficients with the (-1)^k sign
        folded in.
      n_power: traced int32 — chain length (== the XLA while_loop trip count).

    Returns (B, c8, HW) f32 accumulation.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, c8, HW = eps.shape
    mid = s1.shape[1]
    assert HW == reps * H * W, (HW, H, W, reps)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, c8, HW), lambda i, n, sc: (i, 0, 0)),
            pl.BlockSpec((1, c8, HW), lambda i, n, sc: (i, 0, 0)),
            pl.BlockSpec((1, mid, HW), lambda i, n, sc: (i, 0, 0)),
            pl.BlockSpec((1, mid, HW), lambda i, n, sc: (i, 0, 0)),
            pl.BlockSpec((mid, 9 * c8), lambda i, n, sc: (0, 0)),
            pl.BlockSpec((mid, mid), lambda i, n, sc: (0, 0)),
            pl.BlockSpec((9 * c8, mid), lambda i, n, sc: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c8, HW), lambda i, n, sc: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((9 * c8, HW), eps.dtype)],
    )
    kernel = functools.partial(_chain_kernel, H=H, W=W, reps=reps, c8=c8,
                               mid=mid, cdtype=eps.dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, c8, HW), jnp.float32),
        # the rolled f32 temporaries of the 9-offset loops overflow the
        # default 16M scoped-vmem stack at mid=512, HW=1024
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(n_power, jnp.int32).reshape(1),
      signed_coeffs.astype(jnp.float32),
      eps, s0, s1, s2, m3, m2, m1)


@functools.partial(jax.jit, static_argnames=("H", "W", "reps", "interpret"))
def fused_neumann_chain2(chain_x, chain_z, signed_coeffs, n_power,
                         *, H, W, reps=1, interpret=False):
    """Run both nets' Neumann accumulations in one kernel (see
    ``_chain2_kernel``). ``chain_x``/``chain_z`` are (eps, s0, s1, s2, m3,
    m2, m1) tuples shaped as in :func:`fused_neumann_chain`; both share the
    roulette draw (the estimator samples one n per step). Returns
    (acc_x, acc_z)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    epsx, s0x, s1x, s2x, m3x, m2x, m1x = chain_x
    epsz, s0z, s1z, s2z, m3z, m2z, m1z = chain_z
    B, c8, HW = epsx.shape
    mid = s1x.shape[1]
    assert HW == reps * H * W, (HW, H, W, reps)

    small = lambda: pl.BlockSpec((1, c8, HW), lambda i, n, sc: (i, 0, 0))
    big = lambda: pl.BlockSpec((1, mid, HW), lambda i, n, sc: (i, 0, 0))
    mats = [
        pl.BlockSpec((mid, 9 * c8), lambda i, n, sc: (0, 0)),
        pl.BlockSpec((mid, mid), lambda i, n, sc: (0, 0)),
        pl.BlockSpec((9 * c8, mid), lambda i, n, sc: (0, 0)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[small(), small(), big(), big(),
                  small(), small(), big(), big()] + mats + mats,
        out_specs=[pl.BlockSpec((1, c8, HW), lambda i, n, sc: (i, 0, 0)),
                   pl.BlockSpec((1, c8, HW), lambda i, n, sc: (i, 0, 0))],
        scratch_shapes=[pltpu.VMEM((9 * c8, HW), epsx.dtype),
                        pltpu.VMEM((9 * c8, HW), epsx.dtype)],
    )
    kernel = functools.partial(_chain2_kernel, H=H, W=W, reps=reps, c8=c8,
                               mid=mid, cdtype=epsx.dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, c8, HW), jnp.float32),
                   jax.ShapeDtypeStruct((B, c8, HW), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(n_power, jnp.int32).reshape(1),
      signed_coeffs.astype(jnp.float32),
      epsx, s0x, s1x, s2x, epsz, s0z, s1z, s2z,
      m3x, m2x, m1x, m3z, m2z, m1z)
