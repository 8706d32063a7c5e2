"""Tabular density-estimation datasets (reference: ``lib/tabular.py:14-202``):
POWER / GAS / HEPMASS / MINIBOONE / BSDS300 with the paper-standard cleaning
(gas decorrelation ``tabular.py:79-100``, hepmass repeated-value feature
filter ``:103-134``, power noise injection ``:137-163``), normalisation and
train/valid/test splits. Returns plain numpy arrays (the TPU input pipeline
feeds device batches directly)."""
from __future__ import annotations

import os
from collections import Counter

import numpy as np


def normalize_raw_data(data, mu, s):
    return (data - mu) / s


def make_tabular_train_valid_split(data, frac):
    n_valid = int(frac * data.shape[0])
    return data[0:-n_valid], data[-n_valid:]


def make_tabular_train_valid_test_split(data, frac):
    n_test = int(frac * data.shape[0])
    test_data = data[-n_test:]
    data = data[0:-n_test]
    train_data, valid_data = make_tabular_train_valid_split(data, frac)
    return train_data, valid_data, test_data


def get_miniboone_raw(data_root):
    data = np.load(os.path.join(data_root, "miniboone/data.npy"))
    train_raw, valid_raw, test_raw = make_tabular_train_valid_test_split(data, 0.1)
    stack = np.vstack((train_raw, valid_raw))
    mu, s = stack.mean(axis=0), stack.std(axis=0)
    return tuple(normalize_raw_data(d, mu, s) for d in (train_raw, valid_raw, test_raw))


def get_gas_raw(data_root):
    import pandas

    def correlation_numbers(df):
        C = df.corr()
        return (C > 0.98).to_numpy().sum(axis=1)

    data = pandas.read_pickle(os.path.join(data_root, "gas/ethylene_CO.pickle"))
    for col in ("Meth", "Eth", "Time"):
        data.drop(col, axis=1, inplace=True)
    B = correlation_numbers(data)
    while np.any(B > 1):
        col_name = data.columns[np.where(B > 1)[0][0]]
        data.drop(col_name, axis=1, inplace=True)
        B = correlation_numbers(data)
    data = normalize_raw_data(data, data.mean(), data.std()).to_numpy()
    return make_tabular_train_valid_test_split(data, 0.1)


def get_hepmass_raw(data_root):
    import pandas

    train_raw = pandas.read_csv(os.path.join(data_root, "hepmass/1000_train.csv"), index_col=False)
    test_raw = pandas.read_csv(os.path.join(data_root, "hepmass/1000_test.csv"), index_col=False)

    train_raw = train_raw[train_raw[train_raw.columns[0]] == 1]
    train_raw = train_raw.drop(train_raw.columns[0], axis=1)
    test_raw = test_raw[test_raw[test_raw.columns[0]] == 1]
    test_raw = test_raw.drop(test_raw.columns[0], axis=1)
    test_raw = test_raw.drop(test_raw.columns[-1], axis=1)

    mu, s = train_raw.mean(), train_raw.std()
    train_raw = normalize_raw_data(train_raw, mu, s).to_numpy()
    test_raw = normalize_raw_data(test_raw, mu, s).to_numpy()

    # Drop features whose most-common value repeats too often (tabular.py:122-131).
    features_to_remove = []
    for i, feature in enumerate(train_raw.T):
        c = Counter(feature)
        max_count = np.array([v for k, v in sorted(c.items())])[0]
        if max_count > 5:
            features_to_remove.append(i)
    keep = [i for i in range(train_raw.shape[1]) if i not in features_to_remove]
    train_raw = train_raw[:, np.array(keep)]
    test_raw = test_raw[:, np.array(keep)]

    train_raw, valid_raw = make_tabular_train_valid_split(train_raw, 0.1)
    return train_raw, valid_raw, test_raw


def get_power_raw(data_root, rng=None):
    rng = rng or np.random
    data = np.load(os.path.join(data_root, "power/data.npy"))
    rng.shuffle(data)
    n = data.shape[0]
    data = np.delete(data, 3, axis=1)
    data = np.delete(data, 1, axis=1)
    # dequantization-style noise injection (tabular.py:145-151)
    noise = np.hstack((
        0.001 * rng.rand(n, 1),
        0.01 * rng.rand(n, 1),
        rng.rand(n, 3),
        np.zeros((n, 1)),
    ))
    data = data + noise
    train_raw, valid_raw, test_raw = make_tabular_train_valid_test_split(data, 0.1)
    stack = np.vstack((train_raw, valid_raw))
    mu, s = stack.mean(axis=0), stack.std(axis=0)
    return tuple(normalize_raw_data(d, mu, s) for d in (train_raw, valid_raw, test_raw))


def get_bsds300_raw(data_root):
    import h5py

    with h5py.File(os.path.join(data_root, "BSDS300", "BSDS300.hdf5"), "r") as f:
        return f["train"][()], f["validation"][()], f["test"][()]


_LOADERS = {
    "miniboone": get_miniboone_raw,
    "gas": get_gas_raw,
    "hepmass": get_hepmass_raw,
    "power": get_power_raw,
    "bsds300": get_bsds300_raw,
}

# Paper-standard dims, used by the synthetic fallback for smoke/bench runs.
TABULAR_DIMS = {"power": 6, "gas": 8, "hepmass": 21, "miniboone": 43, "bsds300": 63}


def get_tabular_datasets(name, data_root, synthetic_fallback=False, synthetic_n=100_000):
    """Returns float32 (train, valid, test) arrays. With
    ``synthetic_fallback`` and no data on disk, a correlated-Gaussian stand-in
    of the right dimensionality is produced (this image has zero egress; real
    runs must provide the standard preprocessed files)."""
    if name not in _LOADERS:
        raise NotImplementedError(name)
    try:
        train, valid, test = _LOADERS[name](data_root)
    except (FileNotFoundError, OSError):
        if not synthetic_fallback:
            raise
        d = TABULAR_DIMS[name]
        rng = np.random.RandomState(0)
        A = rng.randn(d, d) / np.sqrt(d)
        z = rng.randn(synthetic_n, d)
        data = np.tanh(z @ A) + 0.1 * rng.randn(synthetic_n, d)
        data = (data - data.mean(0)) / data.std(0)
        train, valid, test = make_tabular_train_valid_test_split(data, 0.1)
    return (np.asarray(train, np.float32), np.asarray(valid, np.float32),
            np.asarray(test, np.float32))


def batch_iterator(data, batch_size, rng, shuffle=True, drop_last=True):
    """Epoch iterator over a host-resident array."""
    n = data.shape[0]
    idx = rng.permutation(n) if shuffle else np.arange(n)
    end = n - (n % batch_size) if drop_last else n
    for i in range(0, end, batch_size):
        yield data[idx[i:i + batch_size]]
