"""True-sigma audit of the late-training conditioning collapse (r4 verdict #2).

Question: is the epoch-13 "conditioning-limited" regime (strict truth-solve
convergence 0.500, raw sigma 8.1 -> 19.6 over training) partly an artifact of
power-iteration sigma UNDERESTIMATION — i.e. does the true spectral norm of
the soft-normalized kernels (w / max(1, sigma_est/coeff)) creep past coeff?

Method: capture every block net's EFFECTIVE (normalized) conv kernels exactly
as the solver consumes them (solve_lab's fused-solve spy) at early/mid/late
checkpoints, then compute each conv operator's TRUE top singular value in
float64: batched-restart power iteration on A^T A run to machine-tight
tolerance (rel 1e-12 between sweeps, 10 random restarts, up to 5000 iters) on
CPU, with the operator defined by the SAME `ops.power_iter.conv_apply` /
`conv_transpose_apply` the layers use. 1x1 kernels get an exact dense SVD.
The reference's own init discipline is 200 iters x 10 restarts
(/root/reference/lib/layers/base/mixed_lipschitz.py:44-56); this runs far
past it.

Also measured, per checkpoint: the residual-map contraction bound
prod_i sigma_i per net (swish/1.1 has Lipschitz 1), and the implied Banach
iteration count to reach eps — distinguishing "sigma dishonest" from "honest
0.9^3 contraction is simply slow at these budgets" from "f32 noise floor".

Usage: python experiments/sigma_audit.py [--ckpts 0000,0007,0013]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT_DIR = os.path.join(HERE, "experiments/cifar10_long_r4")


def capture_block_weights(ckpt_path):
    """-> list of (label, HW-shape, {w1,w2,w3}) per net, via the fused-solve
    spy on an eager forward at the checkpoint weights."""
    import jax
    import jax.numpy as jnp
    from implicit_normalizing_flows_tpu.training.checkpoints import load_checkpoint
    from implicit_normalizing_flows_tpu.layers import LogitTransform
    from implicit_normalizing_flows_tpu.models import ImplicitFlow
    from implicit_normalizing_flows_tpu.data.images import _synthetic_structured
    from implicit_normalizing_flows_tpu.ops import fused_solve as fs

    batch, size = 8, 32
    model = ImplicitFlow(
        input_size=(batch, 3, size, size), n_blocks=[2, 2, 2],
        intermediate_dim=512, factor_out=False, init_layer=LogitTransform(0.05),
        actnorm=True, coeff=0.9, vnorms="2222",
        n_lipschitz_iters=None, sn_atol=1e-3, sn_rtol=1e-3,
        n_power_series=None, n_dist="poisson",
        kernels="3-1-3", activation_fn="swish", fc_end=False,
        n_exact_terms=10, preact=True,
        neumann_grad=True, grad_in_forward=False, first_resblock=True,
    )
    ck = load_checkpoint(ckpt_path)
    params = ck.get("params") or ck["model"]["params"]
    state = ck.get("state") or ck["model"]["state"]
    cast = lambda t: jax.tree.map(
        lambda a: np.asarray(a, np.float32)
        if getattr(a, "dtype", None) == np.float16 else a, t)
    params, state = cast(params), cast(state)
    x_u8 = jnp.asarray(
        _synthetic_structured("bench", batch, 3, size, size, seed=1).x)
    x = (x_u8.astype(jnp.float32) + 0.5) / 256.0

    captured = []
    orig = fs.fused_broyden_solve

    def spy(xs, data_x, data_z, **kw):
        i = len(captured) // 2
        for tag, d in (("net_x", data_x), ("net_z", data_z)):
            captured.append((f"block{i}_{tag}", xs.shape,
                             {k: np.asarray(d[k]) for k in ("w1", "w2", "w3")}))
        return orig(xs, data_x, data_z, **kw)

    fs.fused_broyden_solve = spy
    try:
        model.forward({"params": params, "state": state}, x,
                      rng=jax.random.PRNGKey(1), train=True)
    finally:
        fs.fused_broyden_solve = orig
    return captured


def true_sigma_conv(w, H, W, tol=1e-10):
    """Float64 top singular value of the conv operator (stride 1, same pad,
    cross-correlation — identical semantics to the layers' own
    `ops.power_iter.conv_apply`) at spatial dims (H, W): Lanczos
    (scipy.sparse.linalg.eigsh, k=1) on the Gram operator of the SMALLER
    side, with torch float64 conv2d/conv_transpose2d matvecs. Converges in
    ~50-150 matvecs where plain power iteration needs thousands on the
    clustered late-training spectra."""
    import torch
    import torch.nn.functional as F
    from scipy.sparse.linalg import LinearOperator, eigsh

    w64 = torch.from_numpy(np.asarray(w, np.float64))
    k = w.shape[2]
    pad = k // 2
    cout, cin = w.shape[0], w.shape[1]
    n_in, n_out = cin * H * W, cout * H * W
    use_out_side = n_out < n_in
    n = min(n_in, n_out)
    calls = [0]

    def gram(v):
        calls[0] += 1
        if use_out_side:       # A A^T on the output side
            u = torch.from_numpy(v.reshape(1, cout, H, W))
            x = F.conv_transpose2d(u, w64, padding=pad)
            y = F.conv2d(x, w64, padding=pad)
        else:                  # A^T A on the input side
            x = torch.from_numpy(v.reshape(1, cin, H, W))
            u = F.conv2d(x, w64, padding=pad)
            y = F.conv_transpose2d(u, w64, padding=pad)
        return y.numpy().reshape(-1)

    op = LinearOperator((n, n), matvec=gram, dtype=np.float64)
    vals = eigsh(op, k=1, which="LA", tol=tol, return_eigenvectors=False,
                 v0=np.random.RandomState(0).randn(n))
    return float(np.sqrt(max(float(vals[0]), 0.0))), calls[0]


def true_sigma_1x1(w):
    m = np.asarray(w, np.float64)[:, :, 0, 0]
    return float(np.linalg.svd(m, compute_uv=False)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpts", default="0000,0007,0013")
    ap.add_argument("--coeff", type=float, default=0.9)
    ap.add_argument("--out", default="experiments/sigma_audit_r5.json")
    args = ap.parse_args()

    report = {"coeff": args.coeff, "method": "f64 power iteration on A^T A, "
              "10 restarts, tol 1e-12 (1x1: exact dense SVD); operator = "
              "ops.power_iter.conv_apply (the layers' own)", "checkpoints": {}}
    # capture every checkpoint BEFORE enabling x64 (the capture runs the f32
    # production forward; flipping jax_enable_x64 mid-stream would change
    # its promotion rules)
    captures = {}
    for tag in args.ckpts.split(","):
        path = os.path.join(CKPT_DIR, f"checkpt-{tag}.pkl")
        if not os.path.exists(path):
            print(f"skip {tag}: {path} missing")
            continue
        captures[tag] = capture_block_weights(path)
    for tag, nets in captures.items():
        rows = []
        worst = 0.0
        for label, xshape, ws in nets:
            H, W = xshape[2], xshape[3]
            sigs = {}
            for name, w in ws.items():
                if w.shape[2] == 1:
                    s = true_sigma_1x1(w)
                    it = 0
                else:
                    s, it = true_sigma_conv(w, H, W)
                sigs[name] = {"sigma_true": round(s, 6),
                              "ratio_to_coeff": round(s / args.coeff, 6),
                              "iters": it}
                worst = max(worst, s / args.coeff)
            prod = float(np.prod([sigs[n]["sigma_true"] for n in sigs]))
            rows.append({"net": label, "HW": [H, W], "sigmas": sigs,
                         "lip_bound_prod": round(prod, 6)})
            print(f"{tag} {label} ({H}x{W}): " + " ".join(
                f"{n}={sigs[n]['sigma_true']:.5f}" for n in sigs)
                + f" prod={prod:.5f}", flush=True)
        report["checkpoints"][tag] = {
            "rows": rows,
            "max_ratio_to_coeff": round(worst, 6),
        }
        print(f"checkpoint {tag}: max sigma_true/coeff = {worst:.6f}",
              flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
