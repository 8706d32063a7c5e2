"""Image density / classification / hybrid training driver
(reference: ``/root/reference/train_img.py``; CIFAR-10 recipe:
``run_cifar10.sh``).

TPU-native execution: uint8 batches stream to the device; dequantisation,
padding, the multiscale implicit flow, bits/dim loss, Adam, post-step
Lipschitz power iteration and EMA are one fused jitted step. Example:

  python train_img.py --data cifar10 --actnorm True --nblocks 2-2-2 \
      --idim 512 --act swish --kernels 3-1-3 --vnorms 2222 --fc-end False \
      --preact True --coeff 0.9 --n-exact-terms 10 --save experiments/cifar10
"""
import argparse
import math
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from implicit_normalizing_flows_tpu.data.images import (
    load_dataset,
    random_crop,
    random_flip,
    resize_nearest,
)
from implicit_normalizing_flows_tpu.layers import LogitTransform, Normalize
from implicit_normalizing_flows_tpu.layers.protocol import make_vars
from implicit_normalizing_flows_tpu.models import ImplicitFlow
from implicit_normalizing_flows_tpu.ops.broyden import triage_metrics
from implicit_normalizing_flows_tpu.config import (
    add_kernel_config_flag,
    apply_kernel_config_flag,
)
from implicit_normalizing_flows_tpu.parallel import (
    add_distributed_flags,
    is_main,
    local_shard,
    make_mesh,
    place_batch_axis,
    place_replicated,
    process_index,
    setup_distributed,
    sync,
)
from implicit_normalizing_flows_tpu.training import (
    adam,
    adamax,
    ema_init,
    linear_warmup,
    load_checkpoint,
    rmsprop,
    save_checkpoint,
    save_most_recent,
)
from implicit_normalizing_flows_tpu.training.loops import make_image_step
from implicit_normalizing_flows_tpu.utils import (
    LaggedMetrics, RunningAverageMeter, StepWindowProfiler, get_logger,
    makedirs)

ACTS = ["softplus", "elu", "swish", "lcube", "identity", "relu", "sin", "zero"]


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, default="cifar10", choices=[
        "mnist", "cifar10", "svhn", "celebahq", "celeba_5bit", "imagenet32", "imagenet64"])
    p.add_argument("--dataroot", type=str, default="data")
    p.add_argument("--imagesize", type=int, default=32)
    p.add_argument("--nbits", type=int, default=8)
    p.add_argument("--coeff", type=float, default=0.98)
    p.add_argument("--vnorms", type=str, default="2222")
    p.add_argument("--n-lipschitz-iters", type=int, default=None)
    p.add_argument("--sn-tol", type=float, default=1e-3)
    p.add_argument("--learn-p", type=eval, choices=[True, False], default=False)
    p.add_argument("--n-power-series", type=int, default=None)
    p.add_argument("--factor-out", type=eval, choices=[True, False], default=False)
    p.add_argument("--n-dist", choices=["geometric", "poisson"], default="poisson")
    p.add_argument("--n-samples", type=int, default=1)
    p.add_argument("--n-probes", type=int, default=1,
                   help="independent Hutchinson probes averaged per step "
                        "(variance/N; shards over the mesh trace axis)")
    p.add_argument("--n-exact-terms", type=int, default=2)
    p.add_argument("--neumann-grad", type=eval, choices=[True, False], default=True)
    # Reference default is True (its MemoryEfficientLogDetEstimator exists to
    # fit GPU memory, implicit_block.py:373-415; grad_in_forward maps to
    # jax.checkpoint here). TPU-first default is False: at these batch sizes
    # HBM is not binding, and the rematerialisation costs 2.2x step time
    # (131 vs 59 ms/step on the CIFAR recipe) while also bypassing the fused
    # Neumann-chain kernels (which only run the no-remat path). bpd identical
    # either way; pass --mem-eff True for the reference's memory profile.
    p.add_argument("--mem-eff", type=eval, choices=[True, False], default=False)
    p.add_argument("--act", type=str, choices=ACTS, default="sin")
    p.add_argument("--idim", type=int, default=512)
    p.add_argument("--nblocks", type=str, default="16-16-16")
    p.add_argument("--squeeze-first", type=eval, default=False, choices=[True, False])
    p.add_argument("--actnorm", type=eval, default=True, choices=[True, False])
    p.add_argument("--fc-actnorm", type=eval, default=False, choices=[True, False])
    p.add_argument("--batchnorm", type=eval, default=False, choices=[True, False])
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--fc", type=eval, default=False, choices=[True, False])
    p.add_argument("--kernels", type=str, default="3-1-3")
    p.add_argument("--add-noise", type=eval, choices=[True, False], default=True)
    p.add_argument("--quadratic", type=eval, choices=[True, False], default=False)
    p.add_argument("--fc-end", type=eval, choices=[True, False], default=True)
    p.add_argument("--fc-idim", type=int, default=128)
    p.add_argument("--preact", type=eval, choices=[True, False], default=False)
    p.add_argument("--padding", type=int, default=0)
    p.add_argument("--first-resblock", type=eval, choices=[True, False], default=True)
    p.add_argument("--scan-blocks", type=eval, choices=[True, False], default=False,
                   help="fold each scale's repeated blocks into one lax.scan "
                        "(O(1) compile time in depth; same math)")
    p.add_argument("--cdim", type=int, default=256)
    p.add_argument("--optimizer", type=str, choices=["adam", "adamax", "rmsprop", "sgd"], default="adam")
    p.add_argument("--nepochs", type=int, default=1000)
    p.add_argument("--batchsize", type=int, default=64)
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
    p.add_argument("--save", type=str, default="experiment1")
    p.add_argument("--val-batchsize", type=int, default=200)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--ema-val", type=eval, choices=[True, False], default=True)
    p.add_argument("--update-freq", type=int, default=1)
    p.add_argument("--ndevices", type=int, default=None,
                   help="data-parallel over the first N local devices "
                        "(default: all; 1 disables the mesh)")
    add_distributed_flags(p)
    add_kernel_config_flag(p)
    p.add_argument("--arch", type=str, choices=["implicit", "iresnet", "realnvp"],
                   default="implicit",
                   help="implicit: imBlock flow; iresnet: legacy Residual Flow "
                        "(explicit iResBlocks, resflow.py:18); realnvp: coupling baseline")
    p.add_argument("--task", type=str, choices=["density", "classification", "hybrid"], default="density")
    p.add_argument("--scale-dim", type=eval, choices=[True, False], default=False)
    p.add_argument("--rcrop-pad-mode", type=str, choices=["constant", "reflect"], default="reflect")
    p.add_argument("--padding-dist", type=str, choices=["uniform", "gaussian"], default="uniform")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--begin-epoch", type=int, default=0)
    p.add_argument("--print-freq", type=int, default=20)
    p.add_argument("--vis-freq", type=int, default=500)
    p.add_argument("--synthetic-data", type=eval, choices=[True, False], default=False,
                   help="right-shaped random data when the dataset is absent (zero-egress image)")
    p.add_argument("--synthetic-n", type=int, default=2048,
                   help="synthetic train-set size (test set capped at 2048)")
    p.add_argument("--synthetic-structured", type=eval, choices=[True, False],
                   default=False,
                   help="learnable low-frequency synthetic images instead of "
                        "uniform noise (for long-horizon training evidence)")
    p.add_argument("--synthetic-infinite", type=eval, choices=[True, False],
                   default=False,
                   help="redraw the synthetic train set each epoch (infinite "
                        "stream, like the reference's toy inf_train_gen) so "
                        "long-horizon runs can't memorise a finite set")
    p.add_argument("--max-iters-per-epoch", type=int, default=None)
    p.add_argument("--eval-only", type=eval, choices=[True, False],
                   default=False,
                   help="evaluate the full test set with --resume's "
                        "checkpoint (both live and EMA weights) and exit")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="capture a jax.profiler trace of a training-step "
                        "window into this directory (SURVEY.md §5)")
    p.add_argument("--profile-start", type=int, default=25)
    p.add_argument("--profile-steps", type=int, default=3)
    return p.parse_args(argv)


def dataset_config(args):
    if args.data == "cifar10":
        im_dim, n_classes = 3, 10
        if args.task in ("classification", "hybrid"):
            init_layer = Normalize((0.4914, 0.4822, 0.4465), (0.2023, 0.1994, 0.2010))
        else:
            init_layer = LogitTransform(0.05)
        nvals = 256
    elif args.data == "mnist":
        im_dim, n_classes = 1, 10
        init_layer = LogitTransform(1e-6)
        nvals = 256
    elif args.data == "svhn":
        im_dim, n_classes = 3, 10
        init_layer = LogitTransform(0.05)
        nvals = 256
    elif args.data == "celebahq":
        im_dim, n_classes = 3, 1
        init_layer = LogitTransform(0.05)
        args.imagesize = 256
        nvals = 2 ** args.nbits
    elif args.data == "celeba_5bit":
        im_dim, n_classes = 3, 1
        init_layer = LogitTransform(0.05)
        args.imagesize = 64
        nvals = 32
    elif args.data in ("imagenet32", "imagenet64"):
        im_dim, n_classes = 3, 1000
        init_layer = LogitTransform(0.05)
        args.imagesize = 32 if args.data == "imagenet32" else 64
        nvals = 256
    else:
        raise ValueError(args.data)
    return im_dim, n_classes, init_layer, nvals


def build_model(args, im_dim, n_classes, init_layer, batchsize):
    size = args.imagesize // 2 if args.squeeze_first else args.imagesize
    c = (im_dim + args.padding) * (4 if args.squeeze_first else 1)
    input_size = (batchsize, c, size, size)
    arch = getattr(args, "arch", "implicit")
    if arch in ("iresnet", "realnvp"):
        # Legacy Residual Flow / RealNVP model families
        # (reference resflow.py:18,487; sampled by qualitative_samples.py).
        from implicit_normalizing_flows_tpu.models.resflow import build_residual_flow
        model = build_residual_flow(
            input_size,
            block_type="resblock" if arch == "iresnet" else "coupling",
            n_blocks=list(map(int, args.nblocks.split("-"))),
            intermediate_dim=args.idim,
            factor_out=args.factor_out,
            quadratic=args.quadratic,
            init_layer=init_layer,
            actnorm=args.actnorm,
            fc_actnorm=args.fc_actnorm,
            batchnorm=args.batchnorm,
            dropout=args.dropout,
            fc=args.fc,
            coeff=args.coeff,
            vnorms=args.vnorms,
            n_lipschitz_iters=args.n_lipschitz_iters,
            sn_atol=args.sn_tol,
            sn_rtol=args.sn_tol,
            n_power_series=args.n_power_series,
            n_dist=args.n_dist,
            n_samples=args.n_samples,
            kernels=args.kernels,
            activation_fn=args.act,
            fc_end=args.fc_end,
            fc_idim=args.fc_idim,
            n_exact_terms=args.n_exact_terms,
            preact=args.preact,
            neumann_grad=args.neumann_grad,
            grad_in_forward=args.mem_eff,
            first_resblock=args.first_resblock,
            learn_p=args.learn_p,
            classification=args.task in ("classification", "hybrid"),
            classification_hdim=args.cdim,
            n_classes=n_classes,
        )
        return model, input_size
    model = ImplicitFlow(
        input_size=input_size,
        n_blocks=list(map(int, args.nblocks.split("-"))),
        intermediate_dim=args.idim,
        factor_out=args.factor_out,
        quadratic=args.quadratic,
        init_layer=init_layer,
        actnorm=args.actnorm,
        fc_actnorm=args.fc_actnorm,
        batchnorm=args.batchnorm,
        dropout=args.dropout,
        fc=args.fc,
        coeff=args.coeff,
        vnorms=args.vnorms,
        n_lipschitz_iters=args.n_lipschitz_iters,
        sn_atol=args.sn_tol,
        sn_rtol=args.sn_tol,
        n_power_series=args.n_power_series,
        n_dist=args.n_dist,
        n_samples=args.n_samples,
        n_probes=args.n_probes,
        kernels=args.kernels,
        activation_fn=args.act,
        fc_end=args.fc_end,
        fc_idim=args.fc_idim,
        n_exact_terms=args.n_exact_terms,
        preact=args.preact,
        neumann_grad=args.neumann_grad,
        grad_in_forward=args.mem_eff,
        first_resblock=args.first_resblock,
        scan_blocks=args.scan_blocks,
        learn_p=args.learn_p,
        classification=args.task in ("classification", "hybrid"),
        classification_hdim=args.cdim,
        n_classes=n_classes,
    )
    return model, input_size


def visualize(model, variables, x_u8, nvals, padding, save_dir, tag, key,
              n_show=8):
    """Real / reconstructed / sampled image rows (train_img.py:739-771); the
    recon row is the inverse-of-forward round trip the reference uses as a
    living correctness check (train_img.py:756)."""
    import jax.numpy as jnp
    from implicit_normalizing_flows_tpu.training.loops import add_padding, dequantize
    from qualitative_samples import save_grid

    k1, k2, k3 = jax.random.split(key, 3)
    x = dequantize(jnp.asarray(x_u8[:n_show]), k1, nvals=nvals)
    xpad, _ = add_padding(x, k2, padding, nvals=nvals)
    z, _, _ = model.forward(variables, xpad, None, rng=k3)
    recon, _ = model.inverse(variables, z, None, rng=k3)
    dim = sum(int(np.prod(d)) for d in model.dims)
    z_rand = jax.random.normal(k3, (n_show, dim))
    samples, _ = model.inverse(variables, z_rand, None, rng=k3)
    im_dim = x.shape[1]
    rows = np.concatenate([
        np.asarray(x),
        np.asarray(recon)[:, :im_dim],
        np.asarray(samples)[:, :im_dim],
    ])
    os.makedirs(os.path.join(save_dir, "imgs"), exist_ok=True)
    save_grid(rows, os.path.join(save_dir, "imgs", f"{tag}.png"), nrow=n_show)


def main(argv=None):
    args = parse_args(argv)
    # Multi-host bootstrap FIRST (before anything queries jax.devices()):
    # after this, jax.devices() is the global device list and every process
    # runs the identical SPMD program (no reference analogue — the
    # reference's only parallelism is single-process DataParallel).
    if args.seed is None:
        args.seed = np.random.randint(100000)
    apply_kernel_config_flag(args)
    n_proc = setup_distributed(args)
    makedirs(args.save)
    log_path = os.path.join(
        args.save, "logs" if is_main() else f"logs.p{process_index()}")
    logger = get_logger(log_path, os.path.abspath(__file__))
    if not is_main():
        import logging as _logging
        logger.setLevel(_logging.WARNING)
    logger.info(args)
    logger.info(f"JAX devices: {jax.devices()}")

    # Data parallelism (the reference's nn.DataParallel, train_img.py:203-204,
    # redesigned): one Mesh over ALL devices — local in single-process mode,
    # global across hosts under jax.distributed — batch sharded on 'data',
    # params replicated, gradient all-reduce over ICI/DCN by construction.
    n_dev = args.ndevices if args.ndevices is not None else len(jax.devices())
    if n_proc > 1:
        n_dev = len(jax.devices())  # multi-host always uses the global mesh
    mesh = None
    if n_dev > 1:
        micro = args.batchsize // max(args.update_freq, 1)
        if micro % n_dev or args.val_batchsize % n_dev:
            raise SystemExit(
                f"--batchsize/--update-freq microbatch ({micro}) and "
                f"--val-batchsize ({args.val_batchsize}) must be divisible by "
                f"the device count ({n_dev}); pass --ndevices to use fewer.")
        mesh = make_mesh(n_data=n_dev, devices=jax.devices()[:n_dev])
        logger.info(f"Data-parallel Mesh over {n_dev} devices"
                    + (f" across {n_proc} processes" if n_proc > 1 else ""))
    elif n_proc > 1:
        raise SystemExit("multi-host training requires a device mesh (>1 device)")

    np_rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)

    im_dim, n_classes, init_layer, nvals = dataset_config(args)
    train_data = load_dataset(args.data, args.dataroot, train=True,
                              synthetic_fallback=args.synthetic_data,
                              synthetic_n=args.synthetic_n,
                              synthetic_structured=args.synthetic_structured)
    test_data = load_dataset(args.data, args.dataroot, train=False,
                             synthetic_fallback=args.synthetic_data,
                             synthetic_n=args.synthetic_n,
                             synthetic_structured=args.synthetic_structured)
    logger.info(f"train {len(train_data)} / test {len(test_data)} examples"
                + (" (SYNTHETIC)" if train_data.synthetic else ""))
    if train_data.shape[1] != args.imagesize:
        train_data.x = resize_nearest(train_data.x, args.imagesize)
        test_data.x = resize_nearest(test_data.x, args.imagesize)

    model, input_size = build_model(args, im_dim, n_classes, init_layer, args.batchsize)

    # init with a real batch (restore pass: train_img.py:502-507). The
    # shared dequantize applies the nbits reduction — (x+0.5)/nvals on raw
    # uint8 would feed values up to 2^(8-nbits) into the logit transform
    # for nbits < 8 (celeba_5bit/celebahq) and NaN the ActNorm init.
    from implicit_normalizing_flows_tpu.training.loops import dequantize as _deq
    x0_u8, _ = next(train_data.batches(args.batchsize, np_rng))
    key, k_init, k_batch = jax.random.split(key, 3)
    x0 = _deq(jnp.asarray(x0_u8), k_batch, nvals=nvals, nbits=args.nbits,
              add_noise=False)
    if args.padding > 0:
        pad = jax.random.uniform(k_batch, (x0.shape[0], args.padding) + x0.shape[2:]) / nvals
        x0 = jnp.concatenate([x0, pad], axis=1)
    if args.squeeze_first:
        from implicit_normalizing_flows_tpu.layers.squeeze import squeeze
        x0 = squeeze(x0)
    # jit the whole init: one dispatched program instead of thousands of
    # eager RPCs (the axon tunnel charges a slow round-trip per dispatch)
    variables = jax.jit(model.init)(k_init, x0)
    variables = jax.jit(model.init_with_batch)(variables, x0, rng=k_batch)
    params, state = variables["params"], variables["state"]
    n_params = sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(params))
    logger.info(f"Number of trainable parameters: {n_params}")

    if args.lr_schedule == "sgdr":
        from implicit_normalizing_flows_tpu.training import cosine_annealing_warm_restarts
        lr_schedule = cosine_annealing_warm_restarts(
            args.lr, args.sgdr_t0, args.sgdr_tmult, args.sgdr_eta_min,
            warmup_iters=args.warmup_iters)
    else:
        lr_schedule = linear_warmup(args.lr, args.warmup_iters)
    if args.optimizer == "adam":
        optimizer = adam(lr_schedule, betas=(0.9, 0.99), weight_decay=args.wd, grad_clip=1.0)
    elif args.optimizer == "adamax":
        optimizer = adamax(lr_schedule, betas=(0.9, 0.99), weight_decay=args.wd, grad_clip=1.0)
    elif args.optimizer == "sgd":
        from implicit_normalizing_flows_tpu.training.optimizers import sgd
        optimizer = sgd(lr_schedule, momentum=0.9, weight_decay=args.wd, grad_clip=1.0)
    else:
        optimizer = rmsprop(lr_schedule, weight_decay=args.wd, grad_clip=1.0)
    opt_state = optimizer.init(params)
    shadow = ema_init(params)

    begin_epoch = args.begin_epoch
    if args.resume is not None:
        logger.info(f"Resuming from {args.resume}")
        ckpt = load_checkpoint(args.resume)
        params, state = ckpt["params"], ckpt["state"]
        shadow = ckpt.get("ema", shadow)
        opt_state = ckpt.get("opt_state", opt_state)
        # ckpt["epoch"] is the last *completed* epoch; continue after it.
        # (The LR schedule needs no adjustment: it is a function of the
        # optimizer step count restored inside opt_state.)
        begin_epoch = ckpt.get("epoch", begin_epoch - 1) + 1

    step_kwargs = dict(
        im_dim=im_dim, imagesize=args.imagesize, nvals=nvals, nbits=args.nbits,
        padding=args.padding, padding_dist=args.padding_dist, task=args.task,
        add_noise_flag=args.add_noise, squeeze_first=args.squeeze_first,
        n_lipschitz_iters=args.n_lipschitz_iters, learn_p=args.learn_p,
        scale_dim=args.scale_dim,
    )
    # thread_rng in single-process mode: the step splits its own key on
    # device and returns the successor, removing a per-step host dispatch
    # (each host->device RPC costs ~20 ms through the axon tunnel).
    # Multi-host keeps the host-side split (every process must derive the
    # SAME key sequence from the replicated seed).
    thread_rng = n_proc == 1
    train_step = make_image_step(model, optimizer, train=True, mesh=mesh,
                                 accum_steps=args.update_freq,
                                 thread_rng=thread_rng, **step_kwargs)
    eval_step = make_image_step(model, None, train=False, mesh=mesh, **step_kwargs)

    # EMA-eval sigma refresh: the u/v/sigma power-iteration state tracks the
    # LIVE weights, and sigma(w_ema) estimated from live-weight u/v is an
    # UNDERestimate — the effective Lipschitz of the EMA net can exceed 1 and
    # the eval fixed-point solves diverge (observed: eval bpd orders of
    # magnitude off while train bpd descends). This is reference PARITY, not
    # a divergence: validate() calls update_lipschitz(model) right after
    # ema.swap() (reference train_img.py:705-707), refreshing the spectral
    # buffers against the swapped-in EMA weights; we do the same functionally
    # via a separate eval_state. ema_val=False eval is untouched.
    @jax.jit
    def refresh_sigma_state(p, s):
        return model.update_lipschitz(make_vars(p, s))["state"]

    if mesh is not None:
        params, state, opt_state, shadow = (
            place_replicated(mesh, t) for t in (params, state, opt_state, shadow))

    meters = {k: RunningAverageMeter(0.97) for k in
              ("time", "bpd", "logpz", "delta_logp", "gnorm", "ce")}

    # Metrics are consumed one step late (LaggedMetrics): step N+1 is already
    # dispatched when the host blocks on step N's scalars, so meter updates,
    # logging, and next-batch prep overlap device compute.
    last_t = [time.time()]

    def consume_metrics(m, epoch, i):
        now = time.time()
        meters["time"].update(now - last_t[0])
        last_t[0] = now
        if args.task in ("density", "hybrid"):
            meters["bpd"].update(float(m["bpd"]))
            meters["logpz"].update(float(m["logpz"]))
            meters["delta_logp"].update(float(m["delta_logp"]))
        if args.task in ("classification", "hybrid"):
            meters["ce"].update(float(m["ce"]))
        meters["gnorm"].update(float(m["grad_norm"]))

        if i % args.print_freq == 0:
            s = (f"Epoch: [{epoch}][{i}] | Time {meters['time'].val:.3f} | "
                 f"GradNorm {meters['gnorm'].avg:.2f}")
            if args.task in ("density", "hybrid"):
                s += (f" | Bits/dim {meters['bpd'].val:.4f}({meters['bpd'].avg:.4f})"
                      f" | Logpz {meters['logpz'].avg:.0f}"
                      f" | -DeltaLogp {meters['delta_logp'].avg:.0f}")
            if args.task in ("classification", "hybrid"):
                s += f" | CE {meters['ce'].avg:.4f}"
            if "broyden_nstep" in m:
                s += (f" | BroydenIters {float(m['broyden_nstep']):.1f}"
                      f" | Converged {float(m['broyden_converged']):.2f}")
                if "broyden_converged_3eps" in m:
                    # 3eps = fraction inside the reference's acceptance band;
                    # RefRMS = the reference's own batch-global stopping
                    # ratio, worst block (<1 means the reference's criterion
                    # is met) — see implicit_block._solver_diag
                    s += (f" | Conv3eps {float(m['broyden_converged_3eps']):.2f}"
                          f" | RefRMS {float(m['broyden_rms_over_tol']):.2f}")
            if "est_firmom" in m:
                # estimator first/second moments (train_img.py:557-564)
                s += (f" | EstMoment {float(m['est_firmom']):.2f}"
                      f"({float(m['est_secmom']):.2f})")
            logger.info(s)
        warn = triage_metrics(m)
        if warn:
            logger.info(f"{warn} [epoch {epoch} iter {i}]")

    lag = LaggedMetrics(consume_metrics)

    def run_eval(eval_params, eval_state, label):
        """Full-test-set evaluation: ragged tail batches are padded back to
        val_batchsize for the fixed-shape jitted step and masked on the host
        — every test example is counted exactly once (the reference
        evaluates the whole set, train_img.py:697-737)."""
        nonlocal key
        val_bpd, val_ce, val_correct, val_total = 0.0, 0.0, 0, 0
        pending = []
        for x_u8, y in test_data.batches(args.val_batchsize, None, shuffle=False,
                                         drop_last=False):
            ny = len(y)
            if ny < args.val_batchsize:
                pad = args.val_batchsize - ny
                x_u8 = np.concatenate([x_u8, np.repeat(x_u8[-1:], pad, axis=0)])
                y = np.concatenate([y, np.repeat(y[-1:], pad, axis=0)])
            key, sub = jax.random.split(key)
            if mesh is not None:
                xv, yv = local_shard(x_u8, 0), local_shard(y, 0)
                xv, yv = place_batch_axis(mesh, xv, 0), place_batch_axis(mesh, yv, 0)
            else:
                xv, yv = jnp.asarray(x_u8), jnp.asarray(y)
            if n_proc > 1:
                sub = place_replicated(mesh, sub)
            pending.append((eval_step(eval_params, eval_state, xv, yv, sub), ny))
            if args.max_iters_per_epoch and len(pending) >= args.max_iters_per_epoch:
                break
        # converged is aggregated BOTH ways: the batch-weighted mean (the
        # apples-to-apples analog of the train-side Converged meter) and the
        # worst batch, labelled explicitly (advisor round 2: the min was
        # logged under a mean-looking name and downstream parsers conflated
        # the two).
        val_nstep, val_conv_sum, val_conv_min, n_solver = 0.0, 0.0, 1.0, 0
        val_conv3_sum, val_rms_max = 0.0, 0.0
        for m, ny in pending:
            if args.task in ("density", "hybrid"):
                val_bpd += float(np.sum(np.asarray(m["bpd_vec"])[:ny]))
            if args.task in ("classification", "hybrid"):
                val_ce += float(np.sum(np.asarray(m["ce_vec"])[:ny]))
                val_correct += float(np.sum(np.asarray(m["correct_vec"])[:ny]))
            if "broyden_nstep" in m:
                val_nstep += float(m["broyden_nstep"])
                val_conv_sum += float(m["broyden_converged"])
                val_conv_min = min(val_conv_min, float(m["broyden_converged"]))
                if "broyden_converged_3eps" in m:
                    val_conv3_sum += float(m["broyden_converged_3eps"])
                    val_rms_max = max(val_rms_max,
                                      float(m["broyden_rms_over_tol"]))
                n_solver += 1
            val_total += ny
        val_bpd /= max(val_total, 1)
        s = f"{label} | Test bits/dim {val_bpd:.4f} ({val_total} examples)"
        if n_solver:
            s += (f" | EvalBroydenIters {val_nstep / n_solver:.1f}"
                  f" | EvalConverged {val_conv_sum / n_solver:.2f}"
                  f" | EvalConvergedMin {val_conv_min:.2f}"
                  f" | EvalConv3eps {val_conv3_sum / n_solver:.2f}"
                  f" | EvalRefRMS {val_rms_max:.2f}")
        if args.task in ("classification", "hybrid") and val_total:
            s += (f" | CE {val_ce / val_total:.4f}"
                  f" | Acc {100 * val_correct / val_total:.2f}")
        logger.info(s)
        return val_bpd

    if args.eval_only:
        # score --resume's checkpoint with live AND EMA weights, then exit
        run_eval(params, state, "EvalOnly[live]")
        run_eval(shadow, refresh_sigma_state(shadow, state), "EvalOnly[ema]")
        return params, state

    best_test_bpd = math.inf
    last_checkpoints = []
    # Reference semantics: global_itr = epoch * len(loader) + i
    # (train_img.py:602) — continues across resume so beta annealing and
    # vis cadence don't restart.
    steps_per_epoch = max(1, len(train_data) // args.batchsize)
    if args.max_iters_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_iters_per_epoch)
    global_itr = begin_epoch * steps_per_epoch
    prof = StepWindowProfiler(args.profile_dir, args.profile_start,
                              args.profile_steps)
    # Per-step host->device RPCs are expensive through the axon tunnel
    # (~20 ms each): with thread_rng the key lives on device (split inside
    # the step), the constant-beta scalar is transferred once, and labels —
    # unused by the density loss — are transferred once.
    if thread_rng:
        key, sub0 = jax.random.split(key)
        dev_key = jax.device_put(sub0)
    beta_const = jnp.asarray(1.0) if args.annealing_iters <= 0 else None
    y_cached = None

    # Device-resident synthetic data (round-3 profiling): every per-step
    # host->device batch transfer costs 45-100 ms through the axon tunnel —
    # more than the whole training step — so for structured synthetic data
    # the set is generated in HBM and batches are gathered on device (a
    # ~0.7 ms dispatch). Host batches remain for real datasets (which need
    # host-side augmentation) and multi-process runs (per-process shards).
    use_device_data = (train_data.synthetic and train_data.structured
                       and n_proc == 1 and mesh is None
                       and args.update_freq == 1)
    if use_device_data:
        from implicit_normalizing_flows_tpu.data.images import (
            device_synthetic_structured)
        c_dev = train_data.shape[0]
        n_dev_data = len(train_data) - len(train_data) % args.batchsize

        def gen_device_data(seed):
            return device_synthetic_structured(
                jax.random.PRNGKey(seed), n_dev_data, c_dev,
                args.imagesize, args.imagesize)

        dev_x, dev_y = jax.jit(gen_device_data, static_argnums=0)(args.seed)
        logger.info(f"device-resident synthetic train set: {n_dev_data} "
                    "examples generated in HBM (per-step host transfers "
                    "eliminated)")

        @jax.jit
        def next_batch(xd, yd, perm, idx):
            sel = jax.lax.dynamic_slice_in_dim(
                perm, idx * args.batchsize, args.batchsize)
            return xd[sel], yd[sel], idx + 1

        def device_batches(epoch):
            k = jax.random.fold_in(jax.random.PRNGKey(args.seed), 500 + epoch)
            perm = jax.random.permutation(k, n_dev_data)
            idx = jnp.zeros((), jnp.int32)
            for _ in range(n_dev_data // args.batchsize):
                xb, yb, idx = next_batch(dev_x, dev_y, perm, idx)
                yield xb, yb

    for epoch in range(begin_epoch, args.nepochs):
        if args.synthetic_infinite and train_data.synthetic and epoch > 0:
            # epoch-indexed seed: deterministic, resume-consistent, and
            # disjoint from the fixed test draw (seed 1)
            if use_device_data:
                dev_x, dev_y = jax.jit(gen_device_data,
                                       static_argnums=0)(1000 + epoch)
            else:
                train_data = train_data.regenerate(1000 + epoch)
        last_t[0] = time.time()
        batch_iter = (device_batches(epoch) if use_device_data
                      else train_data.batches(args.batchsize, np_rng))
        for i, (x_u8, y) in enumerate(batch_iter):
            if args.max_iters_per_epoch and i >= args.max_iters_per_epoch:
                break
            if use_device_data:
                xb, yb = x_u8, y  # already device arrays
                beta = (min(1.0, global_itr / args.annealing_iters)
                        if args.annealing_iters > 0 else 1.0)
            else:
                if args.task in ("classification", "hybrid") and not train_data.synthetic:
                    x_u8 = random_flip(x_u8, np_rng)
                    x_u8 = random_crop(x_u8, np_rng, 4, args.rcrop_pad_mode)
                elif args.data == "cifar10" and not train_data.synthetic:
                    x_u8 = random_flip(x_u8, np_rng)
                beta = min(1.0, global_itr / args.annealing_iters) if args.annealing_iters > 0 else 1.0
                xb, yb = np.ascontiguousarray(x_u8), y
                if args.update_freq > 1:
                    mb = len(xb) // args.update_freq * args.update_freq
                    xb = xb[:mb].reshape(args.update_freq, -1, *xb.shape[1:])
                    yb = yb[:mb].reshape(args.update_freq, -1)
                if mesh is not None:
                    b_ax = 1 if args.update_freq > 1 else 0
                    # multi-host: every process computed the same global batch
                    # (shared seed); each feeds only its contiguous shard
                    xb, yb = local_shard(xb, b_ax), local_shard(yb, b_ax)
                    xb, yb = place_batch_axis(mesh, xb, b_ax), place_batch_axis(mesh, yb, b_ax)
                else:
                    xb = jnp.asarray(xb)
                    if args.task == "density" and y_cached is not None \
                            and y_cached.shape == yb.shape:
                        yb = y_cached  # labels unused by the density loss
                    else:
                        yb = jnp.asarray(yb)
                        if args.task == "density":
                            y_cached = yb
            if thread_rng:
                sub_r = dev_key
            else:
                key, sub_r = jax.random.split(key)
            beta_r = beta_const if beta_const is not None else jnp.asarray(beta)
            if n_proc > 1:
                # scalars/keys must be global (replicated) arrays under a
                # multi-process mesh
                sub_r, beta_r = place_replicated(mesh, sub_r), place_replicated(mesh, beta_r)
            prof.maybe_start(global_itr)
            out = train_step(params, state, opt_state, shadow, xb, yb,
                             sub_r, beta_r)
            if thread_rng:
                params, state, opt_state, shadow, m, dev_key = out
            else:
                params, state, opt_state, shadow, m = out
            if prof.should_block(global_itr):
                m.block()  # whole step inside the trace window
            prof.maybe_stop(global_itr)
            global_itr += 1
            lag.push(m, epoch=epoch, i=i)
            if (args.vis_freq and global_itr % args.vis_freq == 0
                    and args.task != "classification" and n_proc == 1):
                try:
                    key, sub_v = jax.random.split(key)
                    visualize(model, make_vars(params, state), x_u8, nvals,
                              args.padding, args.save, f"e{epoch:03d}i{i:05d}",
                              sub_v)
                except Exception as e:
                    logger.info(f"viz failed: {e}")

        lag.flush()

        # Per-epoch Lipschitz health monitor (train_img.py:774-783,829-832):
        # every constrained layer's current sigma, plus the learned p-orders
        # when --learn-p.
        try:
            sigmas = [float(s) for s in
                      model.lipschitz_sigmas(make_vars(params, state))]
            if sigmas:
                logger.info("Lipschitz constants: ["
                            + ", ".join(f"{s:.4f}" for s in sigmas) + "]")
            if args.learn_p:
                ords = [float(o) for o in model.ords(make_vars(params, state))]
                logger.info("Order: [" + ", ".join(f"{o:.4f}" for o in ords) + "]")
        except Exception as e:
            logger.info(f"lipschitz logging failed: {e}")

        # validation with EMA weights (train_img.py:702-737); batch metrics
        # stay device-resident until after the last dispatch (async eval)
        eval_params = shadow if args.ema_val else params
        eval_state = refresh_sigma_state(eval_params, state) if args.ema_val else state
        val_bpd = run_eval(eval_params, eval_state, f"Epoch {epoch}")

        # checkpoint writes are process-0-only; the barrier orders the write
        # before any process could resume from it
        if is_main():
            ckpt = {"args": vars(args), "params": params, "state": state,
                    "ema": shadow, "opt_state": opt_state, "epoch": epoch,
                    "test_bpd": val_bpd}
            if args.task in ("density", "hybrid") and val_bpd < best_test_bpd:
                best_test_bpd = val_bpd
                save_checkpoint(ckpt, args.save, epoch, last_checkpoints, 5)
            save_most_recent(ckpt, args.save)
        sync("epoch_ckpt")

    logger.info("Training has finished.")
    return params, state


if __name__ == "__main__":
    main()
