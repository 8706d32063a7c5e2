"""Classification driver with ImplicitResNet18 (reference:
``/root/reference/train_classification.py``; recipe: ``run_classification.sh``).

Implicit blocks are used as plain feature maps (no log-det); the loss is the
summed cross entropy (``train_classification.py:356``, size_average=False),
with step-decay LR at epochs 75/90/100 (``:418-429``), post-step Lipschitz
power iteration and EMA.
"""
import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from implicit_normalizing_flows_tpu.data.images import (
    load_dataset,
    random_crop,
    random_flip,
)
from implicit_normalizing_flows_tpu.layers.protocol import make_vars
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
from implicit_normalizing_flows_tpu.parallel.mesh import batch_sharding, replicated
from implicit_normalizing_flows_tpu.models.classification import ImplicitResNet18, ResNet18
from implicit_normalizing_flows_tpu.training import adam, ema_apply, ema_init
from implicit_normalizing_flows_tpu.utils import (
    LaggedMetrics, RunningAverageMeter, get_logger, makedirs)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, default="cifar100", choices=["cifar10", "cifar100"])
    p.add_argument("--dataroot", type=str, default="data")
    p.add_argument("--arch", type=str, default="implicit", choices=["implicit", "resnet"])
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--test-batch-size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=76)
    p.add_argument("--weight-decay", "--wd", type=float, default=2e-4)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--ndevices", type=int, default=None,
                   help="data-parallel over the first N local devices "
                        "(default: all; 1 disables the mesh)")
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--model-dir", default="./experiments/model-cifar-Resnet18")
    p.add_argument("--coeff", type=float, default=0.99)
    p.add_argument("--n-lipschitz-iters", type=int, default=None)
    p.add_argument("--sn-tol", type=float, default=1e-3)
    p.add_argument("--rcrop-pad-mode", type=str, default="reflect")
    p.add_argument("--ema-decay", type=float, default=0.999,
                   help="EMA horizon is ~1/(1-decay) steps; short smoke/e2e "
                        "runs need a smaller decay or eval sees ~init weights")
    p.add_argument("--imagesize", type=int, default=32,
                   help="input size; synthetic data and the generic "
                        "ImplicitResNet adapt (reference is 32-only)")
    p.add_argument("--synthetic-data", type=eval, choices=[True, False], default=False)
    p.add_argument("--synthetic-n", type=int, default=2048)
    p.add_argument("--synthetic-structured", type=eval, choices=[True, False],
                   default=False)
    p.add_argument("--max-iters-per-epoch", type=int, default=None)
    add_distributed_flags(p)
    add_kernel_config_flag(p)
    return p.parse_args(argv)


def load_cifar100(dataroot, train, synthetic_fallback):
    try:
        from torchvision.datasets import CIFAR100

        ds = CIFAR100(dataroot, train=train, download=False)
        from implicit_normalizing_flows_tpu.data.images import ImageData

        x = np.asarray(ds.data).transpose(0, 3, 1, 2).astype(np.uint8)
        return ImageData("cifar100", x, np.asarray(ds.targets, np.int64))
    except Exception:
        if not synthetic_fallback:
            raise
        from implicit_normalizing_flows_tpu.data.images import _synthetic

        return _synthetic("cifar100", 2048, 3, 32, 32, n_classes=100)


def main(argv=None):
    args = parse_args(argv)
    apply_kernel_config_flag(args)
    n_proc = setup_distributed(args)  # before anything queries jax.devices()
    makedirs(args.model_dir)
    logger = get_logger(os.path.join(args.model_dir, "logs"), os.path.abspath(__file__))
    if not is_main():
        import logging as _logging
        logger.setLevel(_logging.WARNING)
    logger.info(args)

    np_rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)
    n_classes = 100 if args.data == "cifar100" else 10

    if args.data == "cifar100":
        train_data = load_cifar100(args.dataroot, True, args.synthetic_data)
        test_data = load_cifar100(args.dataroot, False, args.synthetic_data)
    elif args.synthetic_data and args.imagesize != 32:
        from implicit_normalizing_flows_tpu.data.images import _synthetic

        train_data = _synthetic("cifar10", args.synthetic_n, 3,
                                args.imagesize, args.imagesize, seed=0,
                                structured=args.synthetic_structured)
        test_data = _synthetic("cifar10", min(args.synthetic_n, 2048), 3,
                               args.imagesize, args.imagesize, seed=1,
                               structured=args.synthetic_structured)
    else:
        train_data = load_dataset(
            "cifar10", args.dataroot, True, args.synthetic_data,
            synthetic_n=args.synthetic_n,
            synthetic_structured=args.synthetic_structured)
        test_data = load_dataset(
            "cifar10", args.dataroot, False, args.synthetic_data,
            synthetic_n=args.synthetic_n,
            synthetic_structured=args.synthetic_structured)

    ctor = ImplicitResNet18 if args.arch == "implicit" else ResNet18
    model = ctor(num_classes=n_classes, imagesize=args.imagesize, coeff=args.coeff,
                 n_lipschitz_iters=args.n_lipschitz_iters,
                 sn_atol=args.sn_tol, sn_rtol=args.sn_tol)

    x0_u8, _ = next(train_data.batches(args.batch_size, np_rng))
    x0 = jnp.asarray(x0_u8).astype(jnp.float32) / 255.0
    key, k_init = jax.random.split(key)
    variables = jax.jit(model.init)(k_init, x0)  # one program, not 1000s of eager RPCs
    params, state = variables["params"], variables["state"]
    n_params = sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(params))
    logger.info(f"Number of trainable parameters: {n_params}")

    # step-decay at 75/90/100 (train_classification.py:418-429); the step fn
    # is rebuilt at each decay boundary (3 recompiles per run).
    def make_optimizer(lr):
        return adam(lambda step: lr, betas=(0.9, 0.99), weight_decay=args.weight_decay)

    optimizer = make_optimizer(args.lr)
    opt_state = optimizer.init(params)
    shadow = ema_init(params)

    # Data parallelism (reference: nn.DataParallel): batch over 'data',
    # params replicated; the summed-CE gradient all-reduces by construction.
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

    def loss_fn(params, state, x, y, rng):
        # train_apply threads BN running stats (and solver telemetry) back
        # out — the r3 driver used apply() and dropped them, so eval
        # normalized with INIT statistics and test accuracy sat at chance
        logits, new_state = model.train_apply(make_vars(params, state), x,
                                              rng=rng)
        ce = -jnp.sum(jax.nn.log_softmax(logits) *
                      jax.nn.one_hot(y, n_classes))  # summed CE (reference :356)
        acc = jnp.mean((jnp.argmax(logits, 1) == y).astype(jnp.float32))
        return ce, (acc, new_state)

    def make_train_step(lr):
        opt = make_optimizer(lr)

        def train_step(params, state, opt_state, shadow, x_u8, y, rng):
            k1, k2 = jax.random.split(rng)
            x = (x_u8.astype(jnp.float32) + jax.random.uniform(k1, x_u8.shape)) / 256.0
            (ce, (acc, state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, state, x, y, k2)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            v = model.update_lipschitz(make_vars(params, state), args.n_lipschitz_iters)
            params, state = v["params"], v["state"]
            shadow = ema_apply(shadow, params, args.ema_decay)
            return params, state, opt_state, shadow, ce, acc

        if mesh is not None:
            rep = replicated(mesh)
            return jax.jit(train_step, in_shardings=(
                rep, rep, rep, rep, batch_sharding(mesh, 4),
                batch_sharding(mesh, 1), rep))
        return jax.jit(train_step)

    def eval_step(params, state, x_u8, y, rng):
        x = (x_u8.astype(jnp.float32) + jax.random.uniform(rng, x_u8.shape)) / 256.0
        logits = model.apply(make_vars(params, state), x, train=False)
        ce = -jnp.sum(jax.nn.log_softmax(logits) * jax.nn.one_hot(y, n_classes))
        correct = jnp.sum((jnp.argmax(logits, 1) == y).astype(jnp.int32))
        return ce, correct

    @jax.jit
    def refresh_sigma_state(p, s):
        # EMA-eval sigma refresh (see train_img): power iteration re-run
        # against the EMA weights so the eval forward solves see a
        # correctly-normalised net.
        return model.update_lipschitz(make_vars(p, s))["state"]

    if mesh is not None:
        _rep = replicated(mesh)
        eval_step = jax.jit(eval_step, in_shardings=(_rep, _rep, _rep, _rep, _rep))
    else:
        eval_step = jax.jit(eval_step)

    loss_meter = RunningAverageMeter(0.97)
    time_meter = RunningAverageMeter(0.97)

    # Lag-1 metric materialisation (utils.meters.LaggedMetrics): dispatch
    # step N+1 before blocking on step N's scalars.
    last_t = [time.time()]

    def consume_metrics(m, epoch, i):
        ce, acc = m
        now = time.time()
        time_meter.update(now - last_t[0])
        last_t[0] = now
        loss_meter.update(float(ce))
        if i % args.log_interval == 0:
            logger.info(f"Train Epoch: {epoch} [{i}] | Time {time_meter.val:.3f}"
                        f" | Loss: {loss_meter.val:.6f} | Acc {float(acc):.3f}")

    lag = LaggedMetrics(consume_metrics)

    train_step = make_train_step(args.lr)
    cur_lr = args.lr
    test_acc = float("nan")  # --epochs 0: nothing evaluated
    for epoch in range(args.epochs):
        lr = args.lr
        if epoch >= 75:
            lr = args.lr * 0.1
        if epoch >= 90:
            lr = args.lr * 0.01
        if epoch >= 100:
            lr = args.lr * 0.001
        if lr != cur_lr:
            train_step = make_train_step(lr)
            cur_lr = lr
        last_t[0] = time.time()
        for i, (x_u8, y) in enumerate(train_data.batches(args.batch_size, np_rng)):
            if args.max_iters_per_epoch and i >= args.max_iters_per_epoch:
                break
            if not train_data.synthetic:
                x_u8 = random_flip(x_u8, np_rng)
                x_u8 = random_crop(x_u8, np_rng, 4, args.rcrop_pad_mode)
            key, sub = jax.random.split(key)
            if mesh is not None:
                xb = place_batch(mesh, local_shard(np.ascontiguousarray(x_u8)))
                yb = place_batch(mesh, local_shard(y))
            else:
                xb, yb = jnp.asarray(np.ascontiguousarray(x_u8)), jnp.asarray(y)
            if n_proc > 1:
                sub = place_replicated(mesh, sub)
            params, state, opt_state, shadow, ce, acc = train_step(
                params, state, opt_state, shadow, xb, yb, sub)
            lag.push((ce, acc), epoch=epoch, i=i)
        lag.flush()

        eval_state = refresh_sigma_state(shadow, state)
        pending = []
        # drop_last=False: the ragged tail batch is evaluated too (sums, not
        # means, accumulate) so every test example counts exactly once.
        for x_u8, y in test_data.batches(args.test_batch_size, None, shuffle=False,
                                         drop_last=False):
            key, sub = jax.random.split(key)
            xe, ye = np.asarray(x_u8), np.asarray(y)
            if mesh is not None:
                xe, ye = place_replicated(mesh, xe), place_replicated(mesh, ye)
            if n_proc > 1:
                sub = place_replicated(mesh, sub)
            pending.append((eval_step(shadow, eval_state, xe, ye, sub), len(y)))
            if args.max_iters_per_epoch and len(pending) >= args.max_iters_per_epoch:
                break
        total_ce = sum(float(ce) for (ce, _), _ in pending)
        total_correct = sum(int(c) for (_, c), _ in pending)
        total_n = sum(n for _, n in pending)
        test_acc = total_correct / max(total_n, 1)
        logger.info(f"Test Epoch {epoch}: CE {total_ce / max(total_n,1):.4f} | "
                    f"Acc {100.0 * test_acc:.2f}%")

    logger.info("Training has finished.")
    return params, state, test_acc


if __name__ == "__main__":
    main()
