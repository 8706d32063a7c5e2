"""Toy 2-D density training driver (reference: ``/root/reference/train_toy.py``).

Same CLI surface and training recipe; TPU-native execution: one jitted train
step containing forward solve, implicit-gradient backward, estimator, Adam,
post-step Lipschitz power iteration and EMA. Run e.g.:

  python train_toy.py --nblocks 6 --vnorms '2222' --dims '128-128' \
      --arch implicit --brute-force True --act sin --data checkerboard \
      --batch_size 5000 --coeff 0.99 --n-lipschitz-iters 20
"""
import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from implicit_normalizing_flows_tpu.data import inf_train_gen
from implicit_normalizing_flows_tpu.models import build_toy_model
from implicit_normalizing_flows_tpu.config import (
    add_kernel_config_flag,
    apply_kernel_config_flag,
)
from implicit_normalizing_flows_tpu.parallel import (
    add_distributed_flags,
    is_main,
    local_shard,
    make_mesh,
    place_batch,
    place_replicated,
    setup_distributed,
    sync,
)
from implicit_normalizing_flows_tpu.parallel.mesh import replicated
from implicit_normalizing_flows_tpu.training import (
    adam,
    ema_init,
    linear_warmup,
    load_checkpoint,
    make_density_eval_step,
    make_density_train_step,
    save_most_recent,
    standard_normal_logprob,
)
from implicit_normalizing_flows_tpu.layers.protocol import make_vars
from implicit_normalizing_flows_tpu.utils import (
    LaggedMetrics, RunningAverageMeter, get_logger, makedirs)

ACTIVATIONS = ["identity", "relu", "tanh", "elu", "selu", "fullsort", "maxmin", "swish", "lcube", "sin"]


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", choices=[
        "swissroll", "8gaussians", "pinwheel", "circles", "moons", "2spirals",
        "checkerboard", "rings"], type=str, default="pinwheel")
    parser.add_argument("--arch", choices=["iresnet", "realnvp", "implicit"], default="implicit")
    parser.add_argument("--coeff", type=float, default=0.9)
    parser.add_argument("--vnorms", type=str, default="222222")
    parser.add_argument("--n-lipschitz-iters", type=int, default=5)
    parser.add_argument("--atol", type=float, default=None)
    parser.add_argument("--rtol", type=float, default=None)
    parser.add_argument("--learn-p", type=eval, choices=[True, False], default=False)
    parser.add_argument("--mixed", type=eval, choices=[True, False], default=True)
    parser.add_argument("--dims", type=str, default="128-128-128-128")
    parser.add_argument("--act", type=str, choices=ACTIVATIONS, default="sin")
    parser.add_argument("--nblocks", type=int, default=100)
    parser.add_argument("--scan-blocks", type=eval, choices=[True, False], default=False,
                        help="fold the repeated block unit into one lax.scan "
                             "(O(1) compile time in depth; same math)")
    parser.add_argument("--brute-force", type=eval, choices=[True, False], default=False)
    parser.add_argument("--actnorm", type=eval, choices=[True, False], default=False)
    parser.add_argument("--batchnorm", type=eval, choices=[True, False], default=False)
    parser.add_argument("--exact-trace", type=eval, choices=[True, False], default=False)
    parser.add_argument("--n-power-series", type=int, default=None)
    parser.add_argument("--n-samples", type=int, default=1)
    parser.add_argument("--n-dist", choices=["geometric", "poisson"], default="geometric")
    parser.add_argument("--niters", type=int, default=50000)
    parser.add_argument("--batch_size", type=int, default=1000)
    parser.add_argument("--test_batch_size", type=int, default=10000)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--weight-decay", type=float, default=1e-5)
    parser.add_argument("--annealing-iters", type=int, default=0)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--save", type=str, default="experiments/implicit_toy")
    parser.add_argument("--viz_freq", type=int, default=1000)
    parser.add_argument("--val_freq", type=int, default=1000)
    parser.add_argument("--log_freq", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ndevices", type=int, default=None,
                        help="data-parallel over the first N local devices "
                             "(default: all; 1 disables the mesh)")
    add_distributed_flags(parser)
    add_kernel_config_flag(parser)
    return parser.parse_args()


def main():
    args = parse_args()
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

    model = build_toy_model(
        arch=args.arch, dims=args.dims, nblocks=args.nblocks, act=args.act,
        coeff=args.coeff, vnorms=args.vnorms,
        n_lipschitz_iters=args.n_lipschitz_iters, atol=args.atol, rtol=args.rtol,
        learn_p=args.learn_p, mixed=args.mixed, brute_force=args.brute_force,
        actnorm=args.actnorm, batchnorm=args.batchnorm,
        exact_trace=args.exact_trace, n_power_series=args.n_power_series,
        n_samples=args.n_samples, n_dist=args.n_dist,
        scan_blocks=args.scan_blocks,
    )

    x0 = jnp.asarray(inf_train_gen(args.data, args.batch_size, np_rng))
    key, k_init = jax.random.split(key)
    variables = jax.jit(model.init)(k_init, x0)  # one program, not 1000s of eager RPCs
    variables = jax.jit(model.init_with_batch)(variables, x0)
    params, state = variables["params"], variables["state"]
    n_params = sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(params))
    logger.info(f"Number of trainable parameters: {n_params}")

    if args.resume is not None:
        logger.info(f"Resuming model from {args.resume}")
        ckpt = load_checkpoint(args.resume)
        params, state = ckpt["params"], ckpt["state"]

    # Reference: Adam with the inert weight decay (optimizers.py:104-105) —
    # the effective decay is 0; see training/optimizers.py.
    optimizer = adam(linear_warmup(args.lr, 0), grad_clip=None)
    opt_state = optimizer.init(params)
    shadow = ema_init(params)

    n_dev = args.ndevices if args.ndevices is not None else len(jax.devices())
    if n_proc > 1:
        n_dev = len(jax.devices())  # multi-host always uses the global mesh
    mesh = None
    if n_dev > 1:
        if args.batch_size % n_dev:
            raise SystemExit(f"--batch_size ({args.batch_size}) must be divisible "
                             f"by the device count ({n_dev}); pass --ndevices.")
        mesh = make_mesh(n_data=n_dev, devices=jax.devices()[:n_dev])
        logger.info(f"Data-parallel Mesh over {n_dev} devices"
                    + (f" across {n_proc} processes" if n_proc > 1 else ""))
        params, state, opt_state, shadow = (
            place_replicated(mesh, t) for t in (params, state, opt_state, shadow))
    elif n_proc > 1:
        raise SystemExit("multi-host training requires a device mesh (>1 device)")

    train_step = make_density_train_step(model, optimizer, mesh=mesh,
                                         n_lipschitz_iters=args.n_lipschitz_iters,
                                         learn_p=args.learn_p)
    eval_step = (make_density_eval_step(model, mesh=mesh, in_shardings=replicated(mesh))
                 if mesh is not None else make_density_eval_step(model))

    time_meter = RunningAverageMeter(0.93)
    loss_meter = RunningAverageMeter(0.93)
    logpz_meter = RunningAverageMeter(0.93)
    delta_logp_meter = RunningAverageMeter(0.93)

    # Lag-1 metric materialisation (utils.meters.LaggedMetrics): iteration
    # N+1 is dispatched before the host blocks on iteration N's scalars.
    last_t = [time.time()]

    def consume_metrics(metrics, itr):
        now = time.time()
        time_meter.update(now - last_t[0])
        last_t[0] = now
        loss_meter.update(float(metrics["loss"]))
        logpz_meter.update(float(metrics["logpz"]))
        delta_logp_meter.update(float(metrics["delta_logp"]))
        if itr % args.log_freq == 0:
            logger.info(
                "Iter {:04d} | Time {:.4f}({:.4f}) | Loss {:.6f}({:.6f})"
                " | Logp(z) {:.6f}({:.6f}) | DeltaLogp {:.6f}({:.6f})".format(
                    itr, time_meter.val, time_meter.avg, loss_meter.val,
                    loss_meter.avg, logpz_meter.val, logpz_meter.avg,
                    delta_logp_meter.val, delta_logp_meter.avg,
                )
            )

    lag = LaggedMetrics(consume_metrics)

    best_loss = float("inf")
    for itr in range(1, args.niters + 1):
        beta = min(1.0, itr / args.annealing_iters) if args.annealing_iters > 0 else 1.0
        x = inf_train_gen(args.data, args.batch_size, np_rng)
        if mesh is not None:
            # multi-host: same generator draw everywhere, each process feeds
            # its contiguous shard
            x = place_batch(mesh, local_shard(np.asarray(x)))
        else:
            x = jnp.asarray(x)
        key, sub = jax.random.split(key)
        sub_r, beta_r = sub, jnp.asarray(beta)
        if n_proc > 1:
            sub_r, beta_r = place_replicated(mesh, sub_r), place_replicated(mesh, beta_r)
        params, state, opt_state, shadow, metrics = train_step(
            params, state, opt_state, shadow, x, sub_r, beta_r
        )
        lag.push(metrics, itr=itr)

        if itr % args.val_freq == 0 or itr == args.niters:
            lag.flush()
            # settle power iteration before eval (train_toy.py:307: 200 iters)
            v = model.update_lipschitz(make_vars(params, state), 200)
            params, state = v["params"], v["state"]
            x_test = jnp.asarray(inf_train_gen(args.data, args.test_batch_size, np_rng))
            key, sub = jax.random.split(key)
            if mesh is not None:
                x_test = place_replicated(mesh, x_test)
            if n_proc > 1:
                sub = place_replicated(mesh, sub)
            test_loss, test_logpz, test_delta = eval_step(params, state, x_test, sub)
            logger.info(
                "[TEST] Iter {:04d} | Test Loss {:.6f} | Test Logp(z) {:.6f}"
                " | Test DeltaLogp {:.6f}".format(
                    itr, float(test_loss), float(test_logpz), float(test_delta))
            )
            # Lipschitz health monitor (reference train_img.py:774-783 analog)
            sigmas = [float(s) for s in
                      model.lipschitz_sigmas(make_vars(params, state))]
            if sigmas:
                logger.info("Lipschitz constants: ["
                            + ", ".join(f"{s:.4f}" for s in sigmas) + "]")
            if args.learn_p:
                ords = [float(o) for o in model.ords(make_vars(params, state))]
                logger.info("Order: [" + ", ".join(f"{o:.4f}" for o in ords) + "]")
            if float(test_loss) < best_loss:
                best_loss = float(test_loss)
                if is_main():
                    save_most_recent(
                        {"args": vars(args), "params": params, "state": state},
                        args.save,
                    )
                sync("toy_ckpt")

        if (args.viz_freq > 0 and (itr == 1 or itr % args.viz_freq == 0)
                and n_proc == 1):
            try:
                import matplotlib
                matplotlib.use("Agg")
                import matplotlib.pyplot as plt
                from implicit_normalizing_flows_tpu.utils.viz import visualize_transform

                variables_now = make_vars(params, state)
                p_samples = inf_train_gen(args.data, 20000, np_rng)

                @jax.jit
                def logdensity(xx):
                    z, delta, _ = model.forward(
                        variables_now, xx, jnp.zeros((xx.shape[0],)), rng=jax.random.PRNGKey(0)
                    )
                    return standard_normal_logprob(z) - delta

                def sample_fn(n=20000):
                    z = jax.random.normal(jax.random.PRNGKey(int(itr)), (n, 2))
                    x_s, _ = model.inverse(variables_now, z)
                    return x_s

                fig = plt.figure(figsize=(9, 3))
                visualize_transform(fig, p_samples, sample_fn, logdensity, npts=400)
                fig_path = os.path.join(args.save, "figs", f"{itr:04d}.jpg")
                makedirs(os.path.dirname(fig_path))
                plt.savefig(fig_path)
                plt.close()
            except Exception as e:  # viz must never kill training
                logger.info(f"viz failed: {e}")

        # don't let (infrequent) val/viz wall-time pollute the step timer
        if (itr == 1 or itr % args.val_freq == 0
                or (args.viz_freq > 0 and itr % args.viz_freq == 0)):
            last_t[0] = time.time()

    lag.flush()
    logger.info("Training has finished.")


if __name__ == "__main__":
    main()
