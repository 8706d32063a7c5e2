"""Hard-regime solver lab: load a saturated mid-training checkpoint and
measure forward-solve health (iterations, converged fraction, bpd error vs a
high-budget truth solve) under solver-policy variants.

Round-2 flagship runs ended `healthy: False` (converged fraction 0.74-0.83,
BroydenIters 20-24/30 mid-training, experiments/long_horizon_r2.json); this
lab isolates WHY on the actual saturated weights — stall-exit semantics,
iteration budget, arithmetic precision, first-direction choice — before the
round-3 long-horizon rerun. The reference faces the same regime with
threshold=30 (reference implicit_block.py:120-123) and a batch-global
stopping norm; variants here are per-example.

Usage:
  python experiments/hard_regime.py \
      --ckpt experiments/cifar10_long_r2c/most_recent.pkl \
      --out experiments/hard_regime_r3.json
"""
import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Variant -> kernel-config override string (on top of env/current defaults).
VARIANTS = [
    # round-2 behavior: unguarded stall, reference first direction
    ("r2_default", "stall_guard=-1,newton_init=0"),
    # reference stall semantics (guard 3x eps) only
    ("guard3", "stall_guard=3,newton_init=0"),
    # + Newton first direction (the new defaults)
    ("guard3_newton", "stall_guard=3,newton_init=1"),
    # no stall exit at all
    ("nostall", "stall_patience=0,newton_init=1"),
    # raised solve precision
    ("guard3_newton_f32", "stall_guard=3,newton_init=1,solver_precision=float32"),
    # 4-pass split (3-pass + lo*lo): cheaper than full f32 emulation
    ("guard3_newton_tf32x", "stall_guard=3,newton_init=1,solver_precision=tf32x"),
    # doubled budget
    ("guard3_newton_b60", "stall_guard=3,newton_init=1,fwd_threshold=60"),
    # XLA path (no fused kernels) at the same policy, isolates kernel effects
    ("xla_guard3_newton", "stall_guard=3,newton_init=1,fused_solve=0,fused_bwd=0,"
     "fused_chain=0,fused_final=0,fused_reattach=0"),
    # Armijo line search (forces the XLA solve path)
    ("guard3_newton_ls", "stall_guard=3,newton_init=1,line_search=1"),
    # truth: high budget, no stall, f32, XLA
    ("truth", "fwd_threshold=120,stall_patience=0,newton_init=1,"
     "solver_precision=float32,fused_solve=0,fused_bwd=0,fused_chain=0,"
     "fused_final=0,fused_reattach=0"),
    # ---- round-4 ladder diagnostics (tail default f32, start thr//2) ----
    ("ladder_default", "stall_guard=3,newton_init=1"),
    ("noladder_tf32", "stall_guard=3,newton_init=1,solver_tail="),
    ("ladder_start8", "stall_guard=3,newton_init=1,ladder_start=8"),
    ("ladder_start4", "stall_guard=3,newton_init=1,ladder_start=4"),
    ("ladder_nostall", "stall_patience=0,newton_init=1"),
    ("ladder_b45", "newton_init=1,fwd_threshold=45"),
    ("f32_only", "newton_init=1,solver_precision=float32"),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="experiments/cifar10_long_r2c/most_recent.pkl")
    p.add_argument("--platform", default=None)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--eval-batches", type=int, default=2)
    p.add_argument("--train-steps", type=int, default=2,
                   help="timed train steps per variant (0 = eval only)")
    p.add_argument("--only", default=None,
                   help="comma-separated variant names to run")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import train_img
    from implicit_normalizing_flows_tpu.config import (parse_overrides,
                                                       set_kernel_config)
    from implicit_normalizing_flows_tpu.data.images import load_dataset
    from implicit_normalizing_flows_tpu.training.checkpoints import load_checkpoint
    from implicit_normalizing_flows_tpu.training.loops import make_image_step
    from implicit_normalizing_flows_tpu.training.optimizers import adam
    from implicit_normalizing_flows_tpu.training.ema import ema_init
    from implicit_normalizing_flows_tpu.training.lr_schedule import linear_warmup

    ck = load_checkpoint(args.ckpt)
    ca = types.SimpleNamespace(**ck["args"])
    im_dim, n_classes, init_layer, nvals = train_img.dataset_config(ca)
    test_data = load_dataset(ca.data, ca.dataroot, train=False,
                             synthetic_fallback=True,
                             synthetic_n=getattr(ca, "synthetic_n", 2048),
                             synthetic_structured=getattr(
                                 ca, "synthetic_structured", True))
    train_data = load_dataset(ca.data, ca.dataroot, train=True,
                              synthetic_fallback=True,
                              synthetic_n=getattr(ca, "synthetic_n", 2048),
                              synthetic_structured=getattr(
                                  ca, "synthetic_structured", True))
    rng = np.random.RandomState(0)
    eval_batches = [next(iter(test_data.batches(args.batch, None, shuffle=False)))
                    for _ in range(1)]
    # distinct eval batches: slice the test set deterministically
    xs = test_data.x
    eval_batches = [
        (xs[i * args.batch:(i + 1) * args.batch],
         np.zeros((args.batch,), np.int64))
        for i in range(args.eval_batches)
    ]
    train_batch = next(train_data.batches(args.batch, rng))

    step_kwargs = dict(
        im_dim=im_dim, imagesize=ca.imagesize, nvals=nvals, nbits=ca.nbits,
        padding=ca.padding, padding_dist=getattr(ca, "padding_dist", "uniform"),
        task=ca.task, add_noise_flag=ca.add_noise,
        squeeze_first=ca.squeeze_first,
        n_lipschitz_iters=ca.n_lipschitz_iters, learn_p=ca.learn_p,
        scale_dim=getattr(ca, "scale_dim", None),
    )

    only = set(args.only.split(",")) if args.only else None
    results = {}
    truth_bpd_vecs = None
    for name, spec in VARIANTS:
        if only and name not in only:
            continue
        set_kernel_config(parse_overrides(spec))
        model, _ = train_img.build_model(ca, im_dim, n_classes, init_layer,
                                         args.batch)
        eval_step = make_image_step(model, None, train=False, **step_kwargs)
        import jax
        key = jax.random.PRNGKey(123)
        r = {"spec": spec}

        # ---- eval passes ----
        bpd_vecs, nsteps, convs, times = [], [], [], []
        for bi, (x_u8, y) in enumerate(eval_batches):
            xv, yv = jnp.asarray(x_u8), jnp.asarray(y)
            key_b = jax.random.fold_in(key, bi)
            m = eval_step(ck["params"], ck["state"], xv, yv, key_b)
            jax.block_until_ready(m["bpd"])
            t0 = time.time()
            m = eval_step(ck["params"], ck["state"], xv, yv, key_b)
            jax.block_until_ready(m["bpd"])
            times.append(time.time() - t0)
            bpd_vecs.append(np.asarray(m["bpd_vec"]))
            nsteps.append(float(m["broyden_nstep"]))
            convs.append(float(m["broyden_converged"]))
        bpd_all = np.concatenate(bpd_vecs)
        r.update(eval_bpd=float(bpd_all.mean()),
                 eval_nstep=float(np.mean(nsteps)),
                 eval_converged=float(np.mean(convs)),
                 eval_s_per_batch=float(np.median(times)))
        r["_bpd_vec"] = bpd_all
        if name == "truth":
            truth_bpd_vecs = bpd_all

        # ---- timed train steps ----
        if args.train_steps > 0:
            optimizer = adam(linear_warmup(ca.lr, 1), betas=(0.9, 0.99),
                             weight_decay=0.0, grad_clip=1.0)
            params = ck["params"]
            state = ck["state"]
            opt_state = optimizer.init(params)
            shadow = ema_init(params)
            train_step = make_image_step(model, optimizer, train=True,
                                         **step_kwargs)
            x_u8, y = train_batch
            xv, yv = jnp.asarray(x_u8), jnp.asarray(y)
            beta = jnp.asarray(1.0)
            tnsteps, tconvs, ttimes = [], [], []
            for si in range(args.train_steps + 1):
                key_s = jax.random.fold_in(key, 1000 + si)
                t0 = time.time()
                params, state, opt_state, shadow, m = train_step(
                    params, state, opt_state, shadow, xv, yv, key_s, beta)
                jax.block_until_ready(m["bpd"])
                dt = time.time() - t0
                if si > 0:  # skip compile
                    ttimes.append(dt)
                    tnsteps.append(float(m["broyden_nstep"]))
                    tconvs.append(float(m["broyden_converged"]))
            r.update(train_nstep=float(np.mean(tnsteps)),
                     train_converged=float(np.mean(tconvs)),
                     train_s_per_step=float(np.median(ttimes)),
                     train_bpd=float(m["bpd"]))
        results[name] = r
        print(json.dumps({name: {k: v for k, v in r.items()
                                 if not k.startswith("_")}}), flush=True)

    if truth_bpd_vecs is not None:
        # per-example bpd error vs the high-budget truth solve (same batches,
        # same rng keys => same dequant noise and estimator draws; residual
        # differences are pure solver/precision effects)
        for name, r in results.items():
            if "_bpd_vec" not in r:
                continue
            d = r["_bpd_vec"] - truth_bpd_vecs
            r["bpd_err_mean"] = float(np.mean(d))
            r["bpd_err_max_abs"] = float(np.max(np.abs(d)))
    for r in results.values():
        r.pop("_bpd_vec", None)
    print("\n=== summary ===")
    hdr = (f"{'variant':24s} {'ev_bpd':>8s} {'ev_nstep':>8s} {'ev_conv':>8s} "
           f"{'ev_s':>7s} {'d_mean':>9s} {'d_max':>9s} "
           f"{'tr_nstep':>8s} {'tr_conv':>8s} {'tr_s':>7s}")
    print(hdr)
    for name, r in results.items():
        print(f"{name:24s} {r.get('eval_bpd', float('nan')):8.4f} "
              f"{r.get('eval_nstep', float('nan')):8.2f} "
              f"{r.get('eval_converged', float('nan')):8.3f} "
              f"{r.get('eval_s_per_batch', float('nan')):7.3f} "
              f"{r.get('bpd_err_mean', float('nan')):9.5f} "
              f"{r.get('bpd_err_max_abs', float('nan')):9.5f} "
              f"{r.get('train_nstep', float('nan')):8.2f} "
              f"{r.get('train_converged', float('nan')):8.3f} "
              f"{r.get('train_s_per_step', float('nan')):7.3f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
