"""Render qualitative sample grids from a trained checkpoint at temperature
tau (reference: ``/root/reference/qualitative_samples.py:439-474``; the
reference samples with EMA-swapped weights, ``:428-430``).

Note the reference as shipped imports the nonexistent ``lib.iresnet``
(``qualitative_samples.py:10``, SURVEY.md §2.3 #17); this driver supports both
the implicit and residual model families.

  python qualitative_samples.py --ckpt experiments/cifar10/most_recent.pkl \
      --out samples.png --nrow 8 --temperature 0.8
"""
import argparse
import math
import os

import numpy as np

import jax


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--out", type=str, default="samples.png")
    p.add_argument("--nrow", type=int, default=8)
    p.add_argument("--nsamples", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use-ema", type=eval, choices=[True, False], default=True)
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu", "axon"],
                   help="force the jax backend (the site pins JAX_PLATFORMS"
                        "=axon; env vars alone can't undo that)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    return args


def save_grid(images, path, nrow):
    """images: (N, C, H, W) float in [0,1]."""
    n, c, h, w = images.shape
    ncol = int(math.ceil(n / nrow))
    grid = np.ones((c, ncol * h + (ncol - 1) * 2, nrow * w + (nrow - 1) * 2), np.float32)
    for i in range(n):
        r, cc = divmod(i, nrow)
        grid[:, r * (h + 2):r * (h + 2) + h, cc * (w + 2):cc * (w + 2) + w] = images[i]
    arr = (np.clip(grid, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
    if arr.shape[2] == 1:
        arr = arr[:, :, 0]
    try:
        from PIL import Image

        Image.fromarray(arr).save(path)
    except Exception:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, arr, cmap="gray" if arr.ndim == 2 else None)


def main():
    args = parse_args()
    from implicit_normalizing_flows_tpu.training import load_checkpoint
    from implicit_normalizing_flows_tpu.layers.protocol import make_vars
    import train_img

    ckpt = load_checkpoint(args.ckpt)
    targs = argparse.Namespace(**ckpt["args"])
    im_dim, n_classes, init_layer, nvals = train_img.dataset_config(targs)
    model, input_size = train_img.build_model(targs, im_dim, n_classes, init_layer,
                                              args.nsamples)
    params = ckpt["ema"] if (args.use_ema and "ema" in ckpt) else ckpt["params"]
    variables = make_vars(params, ckpt["state"])
    if args.use_ema and "ema" in ckpt:
        # The checkpoint's u/v/sigma state tracks the LIVE weights; refresh
        # the power iteration against the EMA weights so the sampling solves
        # see a correctly normalized (contractive) net (same rationale as
        # train_img's EMA-eval sigma refresh).
        variables = make_vars(params, model.update_lipschitz(variables)["state"])

    key = jax.random.PRNGKey(args.seed)
    dim = sum(int(np.prod(d)) for d in model.dims)
    z = args.temperature * jax.random.normal(key, (args.nsamples, dim))
    x, _ = model.inverse(variables, z, None, rng=jax.random.PRNGKey(args.seed + 1))
    x = np.asarray(x)[:, :im_dim]  # remove padding channels (train_img.py:196-200)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_grid(x, args.out, args.nrow)
    print(f"wrote {args.nsamples} samples at tau={args.temperature} to {args.out}")


if __name__ == "__main__":
    main()
