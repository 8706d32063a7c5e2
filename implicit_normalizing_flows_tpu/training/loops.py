"""Shared density-training step builders (the loop skeleton of
``train_toy.py:285-351`` / ``train_tabular.py`` / ``train_img.py:591-694``):
loss -> grad -> clip -> optimizer -> post-step ``update_lipschitz`` -> EMA,
all fused into ONE jitted step (the reference runs each of these as separate
host-driven phases)."""
from __future__ import annotations

import math
import os
import jax
import jax.numpy as jnp
import optax


def _donate_args(nums):
    """Buffer donation for the step state. OFF by default: the axon TPU
    tunnel in this image reports platform 'tpu' but fails donated executions
    with InvalidArgument. Set IMNF_DONATE=1 on real TPU runtimes to update
    params/opt-state in place."""
    from ..config import kernel_config
    return nums if kernel_config().donate else ()

def _under_mesh(jitted, mesh):
    """Invoke the jitted step under the ambient mesh (jax.sharding.set_mesh)
    so mesh-aware fast paths — the shard_map-partitioned Pallas kernels
    (ops.fused_solve._maybe_shard) and the Hutchinson probe-axis constraint
    (parallel.mesh.constrain_probe_axis) — see the mesh at trace time. A
    GSPMD-opaque custom call would otherwise force its operands replicated."""
    import functools

    from jax.sharding import set_mesh

    @functools.wraps(jitted)
    def run(*args, **kwargs):
        with set_mesh(mesh):
            return jitted(*args, **kwargs)

    return run


from ..layers.protocol import make_vars
from .ema import ema_apply


def solver_stats(state):
    """Aggregate per-block Broyden telemetry stored by the implicit blocks
    (state['solver_diag'] = [nstep, converged fraction, prot_break,
    rms_over_tol, converged_3eps] — see implicit_block._solver_diag) into
    step metrics — the first-class iters-to-converge metric BASELINE.md asks
    for. rms_over_tol pools as the WORST block (the reference's batch-global
    stopping ratio); converged fractions pool as means over blocks."""
    diags = []

    def visit(s):
        if isinstance(s, dict):
            if "solver_diag" in s:
                diags.append(s["solver_diag"])
            for v in s.values():
                visit(v)
        elif isinstance(s, (list, tuple)):
            for v in s:
                visit(v)

    visit(state)
    if not diags:
        return {}
    # ScanRepeat stacks per-slice diags to (n, 5); flatten before pooling.
    d = jnp.concatenate([jnp.reshape(x, (-1, 5)) for x in diags])
    return {
        "broyden_nstep": jnp.mean(d[:, 0]),
        "broyden_converged": jnp.mean(d[:, 1]),
        "broyden_prot_break": jnp.max(d[:, 2]),
        "broyden_rms_over_tol": jnp.max(d[:, 3]),
        "broyden_converged_3eps": jnp.mean(d[:, 4]),
    }


def estimator_stats(state):
    """Aggregate the log-det estimator's first/second moments stored by each
    implicit/iRes block (state['last_firmom'/'last_secmom']) into step
    metrics — the reference logs these at print-freq as its estimator-health
    monitor (train_img.py:557-564)."""
    fir, sec = [], []

    def visit(s):
        if isinstance(s, dict):
            if "last_firmom" in s:
                fir.append(jnp.reshape(s["last_firmom"], (-1,)))
                sec.append(jnp.reshape(s["last_secmom"], (-1,)))
            for v in s.values():
                visit(v)
        elif isinstance(s, (list, tuple)):
            for v in s:
                visit(v)

    visit(state)
    if not fir:
        return {}
    return {
        "est_firmom": jnp.mean(jnp.concatenate(fir)),
        "est_secmom": jnp.mean(jnp.concatenate(sec)),
    }


def standard_normal_logprob(z):
    """Per-example sum log N(z; 0, I) (train_toy.py:100-102)."""
    logZ = -0.5 * math.log(2 * math.pi)
    return jnp.sum(logZ - z ** 2 / 2, axis=tuple(range(1, z.ndim)))


def make_density_train_step(model, optimizer, *, n_lipschitz_iters=None,
                            ema_decay=0.999, mesh=None, in_shardings=None,
                            learn_p=False, p_penalty_scale=0.01):
    """Build the jitted train step for a Flow-protocol density model
    (SequentialFlow chains: toy/tabular).

    Returned step: (params, state, opt_state, ema_shadow, x, rng, beta)
    -> (params, state, opt_state, ema_shadow, metrics). Metrics are a
    PackedMetrics view (all scalars in one device vector -> one
    device->host transfer per step; see make_image_step).
    """
    from ..utils.meters import make_metric_packer

    _pack, _unpack = make_metric_packer()

    def loss_fn(params, state, x, rng, beta):
        zeros = jnp.zeros((x.shape[0],), x.dtype)
        z, delta_logp, new_state = model.forward(
            make_vars(params, state), x, zeros, rng=rng, train=True
        )
        logpz = standard_normal_logprob(z)
        logpx = logpz - beta * delta_logp
        loss = -jnp.mean(logpx)
        if learn_p:
            # learned p-order penalty (compute_p_grads, train_toy.py:133-144:
            # mean one-step sigma scaled by 0.01, grads only to the orders)
            total, count = model.lipschitz_one_iter(make_vars(params, state))
            if count > 0:
                loss = loss + p_penalty_scale * total / count
        return loss, (new_state, jnp.mean(logpz), jnp.mean(-delta_logp))

    def step(params, state, opt_state, ema_shadow, x, rng, beta):
        (loss, (new_state, logpz, neg_delta)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, state, x, rng, beta)
        if learn_p:
            grads = jax.tree.map(lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # Post-step power iteration, same schedule as the reference
        # (update_lipschitz after every optimizer step, train_img.py:657).
        v = model.update_lipschitz(make_vars(params, new_state), n_lipschitz_iters)
        params, new_state = v["params"], v["state"]
        ema_shadow = ema_apply(ema_shadow, params, ema_decay)
        metrics = {
            "loss": loss,
            "logpz": logpz,
            "delta_logp": neg_delta,
            "grad_norm": optax.global_norm(grads),
        }
        metrics.update(solver_stats(new_state))
        metrics.update(estimator_stats(new_state))
        return params, new_state, opt_state, ema_shadow, _pack(metrics)

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated

        rep = replicated(mesh)
        xs = in_shardings if in_shardings is not None else batch_sharding(mesh, 2)
        jitted = _under_mesh(jax.jit(
            step,
            in_shardings=(rep, rep, rep, rep, xs, rep, rep),
            out_shardings=(rep, rep, rep, rep, rep),
            donate_argnums=_donate_args((0, 1, 2, 3)),
        ), mesh)
    else:
        # params/state/opt_state/EMA are consumed and rebound every step —
        # donate their buffers so XLA updates in place instead of copying.
        jitted = jax.jit(step, donate_argnums=_donate_args((0, 1, 2, 3)))

    def run(*a):
        p, s, o, e, m = jitted(*a)
        return p, s, o, e, _unpack(m)

    return run


def make_density_eval_step(model, *, mesh=None, in_shardings=None):
    """Eval loss (basic estimator with the test exact-term budget kicks in via
    train=False inside the blocks)."""

    def step(params, state, x, rng):
        zeros = jnp.zeros((x.shape[0],), x.dtype)
        z, delta_logp, _ = model.forward(
            make_vars(params, state), x, zeros, rng=rng, train=False
        )
        logpz = standard_normal_logprob(z)
        loss = -jnp.mean(logpz - delta_logp)
        return loss, jnp.mean(logpz), jnp.mean(-delta_logp)

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated

        rep = replicated(mesh)
        xs = in_shardings if in_shardings is not None else batch_sharding(mesh, 2)
        return _under_mesh(jax.jit(step, in_shardings=(rep, rep, xs, rep)), mesh)
    return jax.jit(step)


# ---------------------------------------------------------------------------
# Image workloads (train_img.py): density / classification / hybrid.
# ---------------------------------------------------------------------------

def dequantize(x_u8, rng, nvals=256, nbits=8, add_noise=True):
    """On-device uniform dequantisation. (u8 + u)/nvals equals the reference's
    ToTensor -> (x*255 + u)/256 pipeline (train_img.py:161-169); nbits < 8
    first floors to the reduced bit depth (reduce_bits, train_img.py:152-158)."""
    x = x_u8.astype(jnp.float32)
    if nbits < 8:
        x = jnp.floor(x / 2 ** (8 - nbits))
    if add_noise:
        x = (x + jax.random.uniform(rng, x.shape)) / nvals
    else:
        x = x / nvals + 1.0 / (2 * nvals)
    return x


def add_padding(x, rng, padding, padding_dist="uniform", nvals=256):
    """Pad extra uniform/gaussian channels (train_img.py:179-194). Returns
    (x_padded, logpu) with logpu the log-density of the padding sample."""
    if padding <= 0:
        return x, jnp.zeros((x.shape[0],), x.dtype)
    b, _, h, w = x.shape
    if padding_dist == "uniform":
        u = jax.random.uniform(rng, (b, padding, h, w))
        logpu = jnp.zeros((b,), x.dtype)
        return jnp.concatenate([x, u / nvals], axis=1), logpu
    if padding_dist == "gaussian":
        mean, std = nvals / 2.0, nvals / 8.0
        u = mean + std * jax.random.normal(rng, (b, padding, h, w))
        logp = -0.5 * (((u - mean) / std) ** 2 + 2 * math.log(std) + math.log(2 * math.pi))
        return jnp.concatenate([x, u / nvals], axis=1), jnp.sum(logp, axis=(1, 2, 3))
    raise ValueError(padding_dist)


def make_image_step(model, optimizer=None, *, im_dim, imagesize, nvals=256,
                    nbits=8, padding=0, padding_dist="uniform", task="density",
                    add_noise_flag=True, squeeze_first=False,
                    n_lipschitz_iters=None, ema_decay=0.999, learn_p=False,
                    p_penalty_scale=1.0, train=True, mesh=None, accum_steps=1,
                    scale_dim=False, thread_rng=False):
    """Jitted image train (optimizer given) or eval step for the multiscale
    ImplicitFlow model, fusing the reference's whole iteration
    (compute_loss train_img.py:517-554 + step + update_lipschitz + EMA).

    Returned metrics are a :class:`~..utils.meters.PackedMetrics` view: all
    scalars live in ONE device vector so the host pays a single
    device->host transfer per step instead of one blocking RPC per scalar
    (a ~2.5x driver-loop speedup through the axon tunnel)."""
    from ..layers.squeeze import squeeze as squeeze_fn
    from ..utils.meters import make_metric_packer

    _pack, _unpack = make_metric_packer()

    dim_total = imagesize * imagesize * (im_dim + padding)
    dim_data = imagesize * imagesize * im_dim

    def loss_fn(params, state, x_u8, y, rng, beta):
        k_noise, k_pad, k_fwd = jax.random.split(rng, 3)
        x = dequantize(x_u8, k_noise, nvals=nvals, nbits=nbits, add_noise=add_noise_flag)
        x, logpu = add_padding(x, k_pad, padding, padding_dist, nvals)
        if squeeze_first:
            x = squeeze_fn(x)
        variables = make_vars(params, state)

        logits = None
        if task == "hybrid":
            z, delta_logp, new_state, logits = model.forward(
                variables, x, jnp.zeros((x.shape[0],), x.dtype),
                rng=k_fwd, train=train, classify=True)
        elif task == "density":
            z, delta_logp, new_state = model.forward(
                variables, x, jnp.zeros((x.shape[0],), x.dtype),
                rng=k_fwd, train=train)
        elif task == "classification":
            z, _, new_state, logits = model.forward(
                variables, x, None, rng=k_fwd, train=train, classify=True)
            delta_logp = None
        else:
            raise ValueError(task)

        metrics = {}
        bpd = jnp.zeros(())
        if task in ("density", "hybrid"):
            logpz = standard_normal_logprob(z)
            # bits/dim constants (train_img.py:541-549)
            logpx = logpz - beta * delta_logp - math.log(nvals) * dim_total - logpu
            bpd_vec = -logpx / dim_data / math.log(2)
            bpd = jnp.mean(bpd_vec)
            metrics["bpd"] = bpd
            metrics["logpz"] = jnp.mean(logpz)
            metrics["delta_logp"] = jnp.mean(-delta_logp)
            if not train:
                # Per-example bpd so the driver can evaluate EVERY test
                # example (ragged tail batches padded + masked on the host;
                # the reference evaluates the full test set,
                # train_img.py:697-737).
                metrics["bpd_vec"] = bpd_vec

        if task == "density":
            loss = bpd
        else:
            ce_vec = -jnp.sum(
                jax.nn.log_softmax(logits) * jax.nn.one_hot(y, logits.shape[1]), axis=1)
            correct_vec = (jnp.argmax(logits, axis=1) == y).astype(jnp.float32)
            ce = jnp.mean(ce_vec)
            acc = jnp.mean(correct_vec)
            metrics["ce"] = ce
            metrics["acc"] = acc
            if not train:
                metrics["ce_vec"] = ce_vec
                metrics["correct_vec"] = correct_vec
            if task == "classification":
                loss = ce
            elif scale_dim:  # --scale-dim True keeps the per-dim bpd scale
                loss = bpd + ce / math.log(2)
            else:  # hybrid default: bpd scaled back to per-image nats
                   # (train_img.py:640-641)
                loss = bpd * dim_data + ce / math.log(2)

        if learn_p and train:
            total, count = model.lipschitz_one_iter(variables)
            if count > 0:
                loss = loss + p_penalty_scale * total / count
        metrics["loss"] = loss
        return loss, (new_state, metrics)

    if optimizer is None:
        def eval_step(params, state, x_u8, y, rng):
            _, (st2, metrics) = loss_fn(params, state, x_u8, y, rng, jnp.ones(()))
            # Eval-path solver telemetry: EMA weights can make eval solves
            # harder than train solves (sigma drift), which is invisible
            # without per-eval nstep/converged.
            metrics.update(solver_stats(st2))
            return _pack(metrics)
        step = eval_step
    else:
        def train_step(params, state, opt_state, ema_shadow, x_u8, y, rng, beta):
            if thread_rng:
                # The caller passes a DEVICE key and threads the returned
                # next_key back in: the per-step host-side
                # jax.random.split dispatch disappears (one fewer tunnel
                # RPC per step; each costs ~20 ms through this tunnel).
                rng, next_rng = jax.random.split(rng)
            if accum_steps > 1:
                # Gradient accumulation (--update-freq, train_img.py:644-650):
                # x_u8/y arrive stacked (accum, B, ...); one lax.scan
                # accumulates grads, then a single optimizer step applies the
                # mean (the reference divides by update_freq, :648).
                def micro(carry, inp):
                    g_acc, st = carry
                    xb, yb, kb = inp
                    (_, (st2, mets)), g = jax.value_and_grad(
                        loss_fn, has_aux=True)(params, st, xb, yb, kb, beta)
                    g_acc = jax.tree.map(jnp.add, g_acc, g)
                    return (g_acc, st2), mets
                keys = jax.random.split(rng, accum_steps)
                zero_g = jax.tree.map(jnp.zeros_like, params)
                (g_sum, new_state), mets = jax.lax.scan(
                    micro, (zero_g, state), (x_u8, y, keys))
                grads = jax.tree.map(lambda g: g / accum_steps, g_sum)
                metrics = jax.tree.map(lambda a: a[-1], mets)
                loss = metrics["loss"]
            else:
                (loss, (new_state, metrics)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, state, x_u8, y, rng, beta)
            # NaN-grad nulling for learn-p (train_img.py:575-578 analog),
            # applied uniformly: non-finite grads become 0.
            if learn_p:
                grads = jax.tree.map(lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
            metrics["grad_norm"] = optax.global_norm(grads)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            v = model.update_lipschitz(make_vars(params, new_state), n_lipschitz_iters)
            params, new_state = v["params"], v["state"]
            ema_shadow = ema_apply(ema_shadow, params, ema_decay)
            metrics.update(solver_stats(new_state))
            metrics.update(estimator_stats(new_state))
            out = (params, new_state, new_opt_state, ema_shadow, _pack(metrics))
            return out + (next_rng,) if thread_rng else out
        step = train_step

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import batch_sharding, replicated

        rep = replicated(mesh)
        if accum_steps > 1 and optimizer is not None:
            # stacked (accum, B, ...) microbatches: shard the batch axis (1)
            xs = NamedSharding(mesh, P(None, "data", None, None, None))
            ys = NamedSharding(mesh, P(None, "data"))
        else:
            xs = batch_sharding(mesh, 4)
            ys = batch_sharding(mesh, 1)
        # params/state/opt/EMA shardings are INFERRED from their input
        # placement (None), so the same step serves replicated (pure DP,
        # place_replicated) and tensor-parallel (place_tp) parameters.
        if optimizer is None:
            # out_shardings replicated: the per-example eval vectors must be
            # fully addressable on every process (multi-host eval reads them
            # with np.asarray)
            jitted = _under_mesh(
                jax.jit(step, in_shardings=(None, None, xs, ys, rep),
                        out_shardings=rep), mesh)
            return lambda *a: _unpack(jitted(*a))
        jitted = _under_mesh(
            jax.jit(step, in_shardings=(None, None, None, None, xs, ys, rep, rep),
                    donate_argnums=_donate_args((0, 1, 2, 3))), mesh)
    elif optimizer is None:
        jitted = jax.jit(step)
        return lambda *a: _unpack(jitted(*a))
    else:
        jitted = jax.jit(step, donate_argnums=_donate_args((0, 1, 2, 3)))

    def run_train(*a):
        p, s, o, e, m, *k = jitted(*a)
        out = (p, s, o, e, _unpack(m))
        return out + tuple(k) if k else out

    return run_train
