"""End-to-end preprocessing-script verification on synthesized fixtures
(VERDICT round 2, item 9: these scripts existed untested because the real
source archives can't exist in a zero-egress image).

- a 2-record tfrecord written with a hand-encoded tf.Example protobuf
  (both packed and unpacked Int64List variants) -> celeba pth tensors
- tiny Imagenet-style npz batches -> pth tensor
- npy -> pth conversion
"""
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "preprocessing"))


# ---- minimal protobuf writer for tf.Example fixtures ----

def _varint(n):
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _ld(field, payload):
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vi(field, v):
    return _varint(field << 3) + _varint(v)


def make_example(shape, data, packed_shape=False):
    """tf.Example{features{feature{'shape': int64_list, 'data': bytes_list}}}"""
    if packed_shape:
        int64_list = _ld(1, b"".join(_varint(s) for s in shape))
    else:
        int64_list = b"".join(_vi(1, s) for s in shape)
    feat_shape = _ld(3, int64_list)          # Feature.int64_list = 3
    feat_data = _ld(1, _ld(1, data))         # Feature.bytes_list.value
    entry_shape = _ld(1, b"shape") + _ld(2, feat_shape)
    entry_data = _ld(1, b"data") + _ld(2, feat_data)
    features = _ld(1, entry_shape) + _ld(1, entry_data)
    return _ld(1, features)


def write_tfrecord(path, payloads):
    with open(path, "wb") as f:
        for p in payloads:
            f.write(struct.pack("<Q", len(p)))
            f.write(b"\0\0\0\0")   # length crc (readers here skip it)
            f.write(p)
            f.write(b"\0\0\0\0")   # data crc


def test_celeba_tfrecord_extraction(tmp_path):
    from extract_celeba_from_tfrecords import (iter_tfrecord,
                                               parse_example_shape_data)

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, size=(3, 3, 8, 8), dtype=np.uint8)
    payloads = [
        make_example([3, 8, 8], imgs[0].tobytes()),
        make_example([3, 8, 8], imgs[1].tobytes(), packed_shape=True),
        make_example([3, 8, 8], imgs[2].tobytes()),
    ]
    rec = tmp_path / "celeba.tfrecords"
    write_tfrecord(rec, payloads)

    got = []
    for raw in iter_tfrecord(str(rec)):
        shape, data = parse_example_shape_data(raw)
        assert shape == [3, 8, 8]
        got.append(np.frombuffer(data, np.uint8).reshape(shape))
    np.testing.assert_array_equal(np.stack(got), imgs)


def test_celeba_script_end_to_end(tmp_path):
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, size=(4, 3, 8, 8), dtype=np.uint8)
    rec = tmp_path / "r.tfrecords"
    write_tfrecord(rec, [make_example([3, 8, 8], im.tobytes()) for im in imgs])
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable,
         os.path.join(HERE, "preprocessing", "extract_celeba_from_tfrecords.py"),
         "--tfrecords", str(rec), "--out", str(out), "--n-valid", "1"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    train = torch.load(out / "celeba256_train.pth")
    valid = torch.load(out / "celeba256_validation.pth")
    np.testing.assert_array_equal(train.numpy(), imgs[1:])
    np.testing.assert_array_equal(valid.numpy(), imgs[:1])


def test_imagenet_npz_conversion(tmp_path):
    from create_imagenet_benchmark_datasets import convert

    rng = np.random.RandomState(2)
    raw = tmp_path / "raw"
    raw.mkdir()
    all_parts = []
    for b in range(2):
        x = rng.randint(0, 256, size=(5, 3 * 32 * 32), dtype=np.uint8)
        np.savez(raw / f"batch_{b}.npz", data=x,
                 labels=np.zeros(5, np.int64))
        all_parts.append(x.reshape(-1, 3, 32, 32))
    out = tmp_path / "imagenet32" / "train_32x32.pth"
    convert(str(raw), str(out), 32)
    arr = torch.load(out).numpy()
    np.testing.assert_array_equal(arr, np.concatenate(all_parts))


def test_convert_to_pth(tmp_path):
    x = np.arange(24, dtype=np.uint8).reshape(2, 3, 2, 2)
    npy = tmp_path / "x.npy"
    np.save(npy, x)
    out = tmp_path / "x.pth"
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "preprocessing", "convert_to_pth.py"),
         "--npy", str(npy), "--out", str(out)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    np.testing.assert_array_equal(torch.load(out).numpy(), x)
