"""Convert the downsampled-ImageNet npz archives into the training tensors
(reference: ``preprocessing/create_imagenet_benchmark_datasets.py:21-49``,
which unpacks Imagenet32/64 train/valid npz batches to npy).

Zero-egress note: download the archives yourself from the official
image-net.org downsampled release, place them under <out>/raw/, then run:

  python preprocessing/create_imagenet_benchmark_datasets.py --size 32 \
      --raw data/raw/Imagenet32_train_npz --out data/imagenet32
"""
import argparse
import glob
import os

import numpy as np


def convert(npz_dir, out_path, size):
    batches = sorted(glob.glob(os.path.join(npz_dir, "*.npz")))
    if not batches:
        raise FileNotFoundError(f"no npz batches under {npz_dir}")
    parts = []
    for b in batches:
        with np.load(b) as d:
            x = d["data"]  # (N, 3*size*size) uint8, CHW flattened
        parts.append(x.reshape(-1, 3, size, size))
    arr = np.concatenate(parts).astype(np.uint8)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    try:
        import torch

        torch.save(torch.from_numpy(arr), out_path)
    except Exception:
        np.save(out_path.replace(".pth", ".npy"), arr)
    print(f"wrote {arr.shape} -> {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, choices=[32, 64], required=True)
    p.add_argument("--raw", type=str, required=True, help="dir with npz batches")
    p.add_argument("--out", type=str, required=True, help="output dir")
    p.add_argument("--split", type=str, default="train", choices=["train", "valid"])
    a = p.parse_args()
    convert(a.raw, os.path.join(a.out, f"{a.split}_{a.size}x{a.size}.pth"), a.size)
