"""Tabular density-estimation driver (reference:
``/root/reference/train_tabular.py``; POWER recipe: ``run_tabular.sh``).

The builder disables neumann-grad / mem-eff so the logged loss is the true
NLL in nats (``train_tabular.py:330-331``). Example:

  python train_tabular.py --nblocks 20 --vnorms '222222' --dims 128-128-128-128 \
      --act sin --data power --batchsize 1000 --coeff 0.99 --nepochs 10000 --epsf 1e-5
"""
import argparse
import math
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from implicit_normalizing_flows_tpu.data.tabular import batch_iterator, get_tabular_datasets
from implicit_normalizing_flows_tpu.models import build_tabular_model
from implicit_normalizing_flows_tpu.config import (
    add_kernel_config_flag,
    apply_kernel_config_flag,
)
from implicit_normalizing_flows_tpu.parallel import (
    add_distributed_flags,
    is_main,
    local_shard,
    setup_distributed,
    sync,
    make_mesh,
    place_batch,
    place_replicated,
)
from implicit_normalizing_flows_tpu.parallel.mesh import replicated
from implicit_normalizing_flows_tpu.training import (
    adam,
    adamax,
    ema_init,
    linear_warmup,
    load_checkpoint,
    make_density_eval_step,
    make_density_train_step,
    rmsprop,
    save_most_recent,
)
from implicit_normalizing_flows_tpu.utils import (
    LaggedMetrics, RunningAverageMeter, get_logger, makedirs)

ACTS = ["identity", "relu", "tanh", "elu", "selu", "fullsort", "maxmin", "swish", "lcube", "sin", "zero"]


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, default="gas",
                   choices=["miniboone", "gas", "hepmass", "power", "bsds300"])
    p.add_argument("--dataroot", type=str, default="data")
    p.add_argument("--coeff", type=float, default=0.9)
    p.add_argument("--vnorms", type=str, default="222222")
    p.add_argument("--n-lipschitz-iters", type=int, default=None)
    p.add_argument("--sn-tol", type=float, default=1e-3)
    p.add_argument("--epsf", type=float, default=1e-6)
    p.add_argument("--n-power-series", type=int, default=None)
    p.add_argument("--n-dist", choices=["geometric", "poisson"], default="geometric")
    p.add_argument("--n-samples", type=int, default=1)
    p.add_argument("--n-exact-terms", type=int, default=2)
    p.add_argument("--brute-force", type=eval, choices=[True, False], default=False)
    p.add_argument("--act", type=str, choices=ACTS, default="swish")
    p.add_argument("--dims", type=str, default="128-128-128-128")
    p.add_argument("--nblocks", type=int, default=5)
    p.add_argument("--scan-blocks", type=eval, choices=[True, False], default=False,
                   help="fold the repeated block unit into one lax.scan "
                        "(O(1) compile time in depth; same math)")
    p.add_argument("--optimizer", type=str, choices=["adam", "adamax", "rmsprop"], default="adam")
    p.add_argument("--nepochs", type=int, default=1000)
    p.add_argument("--batchsize", type=int, default=1000)
    p.add_argument("--val-batchsize", type=int, default=4000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--wd", type=float, default=0)
    p.add_argument("--warmup-iters", type=int, default=1000)
    p.add_argument("--lr-schedule", type=str, choices=["warmup", "sgdr"],
                   default="warmup",
                   help="warmup: linear warmup then constant (reference "
                        "update_lr); sgdr: cosine annealing with warm "
                        "restarts (lib/lr_scheduler.py) x warmup")
    p.add_argument("--sgdr-t0", type=int, default=10000,
                   help="SGDR first-cycle length in optimizer steps")
    p.add_argument("--sgdr-tmult", type=int, default=1)
    p.add_argument("--sgdr-eta-min", type=float, default=0.0)
    p.add_argument("--annealing-iters", type=int, default=0)
    p.add_argument("--save", type=str, default="experiments/tabular")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--synthetic-data", type=eval, choices=[True, False], default=False)
    p.add_argument("--ndevices", type=int, default=None,
                   help="data-parallel over the first N local devices "
                        "(default: all; 1 disables the mesh)")
    p.add_argument("--max-iters-per-epoch", type=int, default=None)
    add_distributed_flags(p)
    add_kernel_config_flag(p)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    apply_kernel_config_flag(args)
    n_proc = setup_distributed(args)  # before anything queries jax.devices()
    makedirs(args.save)
    logger = get_logger(os.path.join(args.save, "logs"), os.path.abspath(__file__))
    if not is_main():
        import logging as _logging
        logger.setLevel(_logging.WARNING)
    logger.info(args)

    np_rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)

    train_x, valid_x, test_x = get_tabular_datasets(
        args.data, args.dataroot, synthetic_fallback=args.synthetic_data)
    data_dim = train_x.shape[1]
    logger.info(f"{args.data}: dim={data_dim}, train={len(train_x)}, "
                f"valid={len(valid_x)}, test={len(test_x)}")

    model = build_tabular_model(
        data_dim, dims=args.dims, nblocks=args.nblocks, act=args.act,
        coeff=args.coeff, vnorms=args.vnorms,
        n_lipschitz_iters=args.n_lipschitz_iters, atol=args.sn_tol,
        rtol=args.sn_tol, brute_force=args.brute_force,
        n_power_series=args.n_power_series, n_samples=args.n_samples,
        n_dist=args.n_dist, eps_forward=args.epsf,
        scan_blocks=args.scan_blocks,
    )

    x0 = jnp.asarray(train_x[:args.batchsize])
    key, k_init = jax.random.split(key)
    variables = jax.jit(model.init)(k_init, x0)  # one program, not 1000s of eager RPCs
    variables = jax.jit(model.init_with_batch)(variables, x0)
    params, state = variables["params"], variables["state"]
    n_params = sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(params))
    logger.info(f"Number of trainable parameters: {n_params}")

    if args.resume is not None:
        ckpt = load_checkpoint(args.resume)
        params, state = ckpt["params"], ckpt["state"]

    if args.lr_schedule == "sgdr":
        from implicit_normalizing_flows_tpu.training import cosine_annealing_warm_restarts
        lr_schedule = cosine_annealing_warm_restarts(
            args.lr, args.sgdr_t0, args.sgdr_tmult, args.sgdr_eta_min,
            warmup_iters=args.warmup_iters)
    else:
        lr_schedule = linear_warmup(args.lr, args.warmup_iters)
    opt_fns = {"adam": adam, "adamax": adamax, "rmsprop": rmsprop}
    optimizer = opt_fns[args.optimizer](lr_schedule, weight_decay=args.wd, grad_clip=1.0)
    opt_state = optimizer.init(params)
    shadow = ema_init(params)

    # Data parallelism (reference: nn.DataParallel): batch over the 'data'
    # mesh axis, params replicated. Eval batches can be ragged
    # (drop_last=False), so eval inputs are replicated instead of sharded.
    n_dev = args.ndevices if args.ndevices is not None else len(jax.devices())
    if n_proc > 1:
        n_dev = len(jax.devices())  # multi-host always uses the global mesh
    mesh = None
    if n_dev > 1:
        if args.batchsize % n_dev:
            raise SystemExit(f"--batchsize ({args.batchsize}) must be divisible "
                             f"by the device count ({n_dev}); pass --ndevices.")
        mesh = make_mesh(n_data=n_dev, devices=jax.devices()[:n_dev])
        logger.info(f"Data-parallel Mesh over {n_dev} devices"
                    + (f" across {n_proc} processes" if n_proc > 1 else ""))
        params, state, opt_state, shadow = (
            place_replicated(mesh, t) for t in (params, state, opt_state, shadow))
    elif n_proc > 1:
        raise SystemExit("multi-host training requires a device mesh (>1 device)")

    train_step = make_density_train_step(model, optimizer, mesh=mesh,
                                         n_lipschitz_iters=args.n_lipschitz_iters)
    eval_step = (make_density_eval_step(model, mesh=mesh, in_shardings=replicated(mesh))
                 if mesh is not None else make_density_eval_step(model))

    from implicit_normalizing_flows_tpu.layers.protocol import make_vars as _mv

    @jax.jit
    def refresh_sigma_state(p, s):
        return model.update_lipschitz(_mv(p, s))["state"]

    meters = {k: RunningAverageMeter(0.97) for k in ("time", "nll", "logpz", "delta")}

    # Lag-1 metric materialisation: step N+1 is dispatched before the host
    # blocks on step N's scalars (see utils.meters.LaggedMetrics).
    last_t = [time.time()]

    def consume_metrics(m, epoch, i):
        now = time.time()
        meters["time"].update(now - last_t[0])
        last_t[0] = now
        meters["nll"].update(float(m["loss"]))
        meters["logpz"].update(float(m["logpz"]))
        meters["delta"].update(float(m["delta_logp"]))
        if i % args.print_freq == 0:
            s = (f"Epoch [{epoch}][{i}] | Time {meters['time'].val:.3f} | "
                 f"NLL {meters['nll'].val:.4f}({meters['nll'].avg:.4f}) | "
                 f"Logpz {meters['logpz'].avg:.2f} | -DeltaLogp {meters['delta'].avg:.2f}")
            if "broyden_nstep" in m:
                # solver health band next to throughput (VERDICT r3 item 10)
                s += (f" | BroydenIters {float(m['broyden_nstep']):.1f} | "
                      f"Converged {float(m['broyden_converged']):.2f} | "
                      f"Conv3eps {float(m['broyden_converged_3eps']):.2f} | "
                      f"RefRMS {float(m['broyden_rms_over_tol']):.2f}")
            if "est_firmom" in m:
                # estimator moments (reference train_img.py:557-564 analog)
                s += (f" | EstMoment {float(m['est_firmom']):.2f}"
                      f"({float(m['est_secmom']):.2f})")
            logger.info(s)
        from implicit_normalizing_flows_tpu.ops.broyden import triage_metrics
        warn = triage_metrics(m)
        if warn:
            logger.info(f"{warn} [epoch {epoch} iter {i}]")

    lag = LaggedMetrics(consume_metrics)

    # Device-resident train data (single-process): tabular sets fit in HBM
    # (POWER: 1.6M x 6 f32 = 40 MB), so transfer ONCE and gather batches on
    # device — each per-step host->device transfer costs 45-100 ms through
    # the axon tunnel, dwarfing the small tabular step (round-3 profiling,
    # NOTES_ROUND3.md). Works for real and synthetic data alike (no
    # host-side augmentation in the tabular pipeline).
    use_device_data = mesh is None and n_proc == 1
    if use_device_data:
        dev_train = jnp.asarray(train_x)
        n_eff = len(train_x) - len(train_x) % args.batchsize

        @jax.jit
        def next_batch(xd, perm, idx):
            sel = jax.lax.dynamic_slice_in_dim(perm, idx * args.batchsize,
                                               args.batchsize)
            return xd[sel], idx + 1

        def device_batches(epoch):
            k = jax.random.fold_in(jax.random.PRNGKey(args.seed), 900 + epoch)
            perm = jax.random.permutation(k, n_eff)
            idx = jnp.zeros((), jnp.int32)
            for _ in range(n_eff // args.batchsize):
                xb, idx = next_batch(dev_train, perm, idx)
                yield xb

        logger.info(f"device-resident train set: {n_eff} rows in HBM "
                    "(per-step host transfers eliminated)")

    beta_const = jnp.asarray(1.0) if args.annealing_iters <= 0 else None
    best_val = math.inf
    global_itr = 0
    for epoch in range(args.nepochs):
        last_t[0] = time.time()
        batch_iter = (device_batches(epoch) if use_device_data
                      else batch_iterator(train_x, args.batchsize, np_rng))
        for i, xb in enumerate(batch_iter):
            if args.max_iters_per_epoch and i >= args.max_iters_per_epoch:
                break
            beta = min(1.0, global_itr / args.annealing_iters) if args.annealing_iters > 0 else 1.0
            key, sub = jax.random.split(key)
            if not use_device_data:
                xb = (place_batch(mesh, local_shard(np.asarray(xb)))
                      if mesh is not None else jnp.asarray(xb))
            sub_r = sub
            beta_r = beta_const if beta_const is not None else jnp.asarray(beta)
            if n_proc > 1:
                sub_r, beta_r = place_replicated(mesh, sub_r), place_replicated(mesh, beta_r)
            params, state, opt_state, shadow, m = train_step(
                params, state, opt_state, shadow, xb, sub_r, beta_r)
            global_itr += 1
            lag.push(m, epoch=epoch, i=i)
        lag.flush()

        # Lipschitz health monitor (reference train_img.py:774-783 analog)
        from implicit_normalizing_flows_tpu.layers.protocol import make_vars
        sigmas = [float(s) for s in
                  model.lipschitz_sigmas(make_vars(params, state))]
        if sigmas:
            logger.info("Lipschitz constants: ["
                        + ", ".join(f"{s:.4f}" for s in sigmas) + "]")

        # validate with EMA params on the validation split (async: metrics
        # materialised after the last dispatch). As in train_img, the
        # power-iteration state is refreshed against the EMA weights first —
        # sigma from live-weight u/v underestimates sigma(w_ema).
        eval_state = refresh_sigma_state(shadow, state)
        pending = []
        for xb in batch_iterator(valid_x, args.val_batchsize, np_rng, shuffle=False, drop_last=False):
            key, sub = jax.random.split(key)
            xe = place_replicated(mesh, jnp.asarray(xb)) if mesh is not None else jnp.asarray(xb)
            if n_proc > 1:
                sub = place_replicated(mesh, sub)
            pending.append((eval_step(shadow, eval_state, xe, sub)[0], len(xb)))
        val_nll = sum(float(l) * n for l, n in pending)
        nb = sum(n for _, n in pending)
        val_nll /= max(nb, 1)
        logger.info(f"Epoch {epoch} | Val NLL {val_nll:.4f}")
        if val_nll < best_val:
            best_val = val_nll
            test_nll, nb = 0.0, 0
            for xb in batch_iterator(test_x, args.val_batchsize, np_rng, shuffle=False, drop_last=False):
                key, sub = jax.random.split(key)
                xe = place_replicated(mesh, jnp.asarray(xb)) if mesh is not None else jnp.asarray(xb)
                if n_proc > 1:
                    sub = place_replicated(mesh, sub)
                loss, _, _ = eval_step(shadow, eval_state, xe, sub)
                test_nll += float(loss) * len(xb)
                nb += len(xb)
            logger.info(f"Epoch {epoch} | Test NLL {test_nll / max(nb, 1):.4f} (best val)")
            if is_main():
                save_most_recent({"args": vars(args), "params": params, "state": state,
                                  "ema": shadow, "val_nll": val_nll}, args.save)
            sync("tabular_ckpt")

    logger.info("Training has finished.")
    return params, state


if __name__ == "__main__":
    main()
