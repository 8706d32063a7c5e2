"""2-D toy densities (reference: ``lib/toy_data.py:8-119``; 11 generators).

Host-side numpy generation feeding the device input pipeline — the same
densities, written against numpy's Generator API. ``inf_train_gen`` keeps the
reference's name and signature (``toy_data.py:8``).
"""
from __future__ import annotations

import numpy as np

DATASETS = [
    "swissroll", "circles", "rings", "moons", "8gaussians", "pinwheel",
    "2spirals", "checkerboard", "line", "cos",
]


def inf_train_gen(data: str, batch_size: int = 200, rng: np.random.RandomState | None = None):
    rng = rng or np.random

    if data == "swissroll":
        # sklearn.make_swiss_roll(noise=1.0)[:, [0, 2]] / 5
        t = 1.5 * np.pi * (1 + 2 * rng.rand(batch_size))
        x = t * np.cos(t)
        z = t * np.sin(t)
        pts = np.stack([x, z], 1) + rng.randn(batch_size, 2)
        return (pts / 5.0).astype("float32")

    if data == "circles":
        # two concentric circles (factor .5) with noise, scaled x3
        n_out = batch_size // 2
        n_in = batch_size - n_out
        ang_out = 2 * np.pi * rng.rand(n_out)
        ang_in = 2 * np.pi * rng.rand(n_in)
        pts = np.concatenate([
            np.stack([np.cos(ang_out), np.sin(ang_out)], 1),
            0.5 * np.stack([np.cos(ang_in), np.sin(ang_in)], 1),
        ])
        pts = pts + rng.randn(batch_size, 2) * 0.08
        return (pts * 3.0).astype("float32")[rng.permutation(batch_size)]

    if data == "rings":
        n4 = n3 = n2 = batch_size // 4
        n1 = batch_size - n4 - n3 - n2
        pts = []
        for n, r in ((n4, 1.0), (n3, 0.75), (n2, 0.5), (n1, 0.25)):
            ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
            pts.append(np.stack([np.cos(ang) * r, np.sin(ang) * r], 1))
        X = np.concatenate(pts) * 3.0
        X = X[rng.permutation(len(X))]
        X = X + rng.normal(scale=0.08, size=X.shape)
        return X.astype("float32")

    if data == "moons":
        n_out = batch_size // 2
        n_in = batch_size - n_out
        ang_out = np.pi * rng.rand(n_out)
        ang_in = np.pi * rng.rand(n_in)
        outer = np.stack([np.cos(ang_out), np.sin(ang_out)], 1)
        inner = np.stack([1 - np.cos(ang_in), 0.5 - np.sin(ang_in)], 1)
        pts = np.concatenate([outer, inner]) + rng.randn(batch_size, 2) * 0.1
        pts = pts * 2 + np.array([-1, -0.2])
        return pts.astype("float32")[rng.permutation(batch_size)]

    if data == "8gaussians":
        scale = 4.0
        sq2 = 1.0 / np.sqrt(2)
        centers = scale * np.array([
            (1, 0), (-1, 0), (0, 1), (0, -1),
            (sq2, sq2), (sq2, -sq2), (-sq2, sq2), (-sq2, -sq2),
        ])
        idx = rng.randint(8, size=batch_size)
        pts = rng.randn(batch_size, 2) * 0.5 + centers[idx]
        return (pts / 1.414).astype("float32")

    if data == "pinwheel":
        radial_std, tangential_std = 0.3, 0.1
        num_classes, rate = 5, 0.25
        num_per_class = batch_size // num_classes
        rads = np.linspace(0, 2 * np.pi, num_classes, endpoint=False)
        features = rng.randn(num_classes * num_per_class, 2) * np.array(
            [radial_std, tangential_std]
        )
        features[:, 0] += 1.0
        labels = np.repeat(np.arange(num_classes), num_per_class)
        angles = rads[labels] + rate * np.exp(features[:, 0])
        rot = np.stack([np.cos(angles), -np.sin(angles), np.sin(angles), np.cos(angles)])
        rot = rot.T.reshape(-1, 2, 2)
        pts = np.einsum("ti,tij->tj", features, rot)
        return (2 * pts[rng.permutation(len(pts))]).astype("float32")

    if data == "2spirals":
        n = np.sqrt(rng.rand(batch_size // 2, 1)) * 540 * (2 * np.pi) / 360
        d1x = -np.cos(n) * n + rng.rand(batch_size // 2, 1) * 0.5
        d1y = np.sin(n) * n + rng.rand(batch_size // 2, 1) * 0.5
        x = np.vstack((np.hstack((d1x, d1y)), np.hstack((-d1x, -d1y)))) / 3
        x = x + rng.randn(*x.shape) * 0.1
        return x.astype("float32")

    if data == "checkerboard":
        x1 = rng.rand(batch_size) * 4 - 2
        x2_ = rng.rand(batch_size) - rng.randint(0, 2, batch_size) * 2
        x2 = x2_ + (np.floor(x1) % 2)
        return (np.stack([x1, x2], 1) * 2).astype("float32")

    if data == "line":
        x = rng.rand(batch_size) * 5 - 2.5
        return np.stack((x, x), 1).astype("float32")

    if data == "cos":
        x = rng.rand(batch_size) * 5 - 2.5
        return np.stack((x, np.sin(x) * 2.5), 1).astype("float32")

    return inf_train_gen("8gaussians", batch_size, rng)
