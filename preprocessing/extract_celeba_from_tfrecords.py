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


def _scan_fields(buf):
    """Iterate (field_number, wire_type, value) over a protobuf message.
    value is an int for varint fields and a memoryview for length-delimited
    ones; fixed32/64 are skipped (not used by tf.Example)."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:           # varint
            val, i = _read_varint(buf, i)
        elif wt == 2:         # length-delimited
            ln, i = _read_varint(buf, i)
            if i + ln > n:
                raise ValueError(
                    "truncated protobuf: length-delimited field of "
                    f"{ln} bytes at offset {i} overruns buffer of {n}")
            val = memoryview(buf)[i:i + ln]
            i += ln
        elif wt == 5:         # fixed32
            val, i = None, i + 4
        elif wt == 1:         # fixed64
            val, i = None, i + 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _read_varint(buf, i):
    shift, out = 0, 0
    n = len(buf)
    while True:
        if i >= n:
            raise ValueError(
                "truncated protobuf: varint runs past end of buffer "
                f"(offset {i} of {n})")
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _parse_int64_list(buf):
    """Int64List { repeated int64 value = 1 } — packed or unpacked."""
    out = []
    for field, wt, val in _scan_fields(buf):
        if field != 1:
            continue
        if wt == 0:
            out.append(val)
        elif wt == 2:  # packed
            j = 0
            while j < len(val):
                v, j = _read_varint(val, j)
                out.append(v)
    return out


def parse_example_shape_data(raw):
    """Pure-python protobuf walk of a tf.Example (progressive-GAN record
    layout): returns (shape int64 list, data bytes). Message graph:
    Example{1: Features{1: map<string
    Feature{1: BytesList{1: bytes}, 3: Int64List{1: int64}}>}}.
    No tensorflow dependency — this image (and most TPU images) don't
    carry TF1, which the reference's converter requires."""
    # protobuf merge semantics: repeated occurrences of an embedded message
    # field are CONCATENATED, so collect every field-1 (Features) chunk and
    # walk each one's map entries (a record split across occurrences would
    # otherwise silently lose its earlier features).
    features = [val for field, wt, val in _scan_fields(raw)
                if field == 1 and wt == 2]
    if not features:
        raise ValueError("no Features message in record")
    entries = [entry for chunk in features
               for field, wt, entry in _scan_fields(chunk)
               if field == 1 and wt == 2]
    shape, data = None, None
    for entry in entries:
        key, feature = None, None
        for f2, w2, v2 in _scan_fields(entry):
            if f2 == 1:
                key = bytes(v2).decode()
            elif f2 == 2:
                feature = v2
        if key == "shape" and feature is not None:
            for f3, w3, v3 in _scan_fields(feature):
                if f3 == 3:  # int64_list
                    shape = _parse_int64_list(v3)
        elif key == "data" and feature is not None:
            for f3, w3, v3 in _scan_fields(feature):
                if f3 == 1:  # bytes_list
                    for f4, w4, v4 in _scan_fields(v3):
                        if f4 == 1:
                            data = bytes(v4)
    if shape is None or data is None:
        raise ValueError("record missing 'shape' or 'data' feature")
    return shape, data


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
