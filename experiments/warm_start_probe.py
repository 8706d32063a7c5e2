"""Cross-step warm start: measure it before building it (VERDICT r3 item 6).

The proposal: cache each example's previous-epoch Broyden root per block
(device-resident) and init the next epoch's forward solve from it instead of
from x. Between two visits of the same example the optimizer takes one full
epoch of steps (781 at the CIFAR recipe), so the question is whether a stale
root is a better init than the block input x (the current ``warm_start``
policy, config.py) or zeros (the reference policy,
/root/reference/lib/layers/implicit_block.py:73).

Protocol: load two ADJACENT epoch checkpoints from the flagship run. Walk the
model under epoch-k weights solving every imBlock from its own input
(recording the per-block roots = what a cache would hold), then walk under
epoch-(k+1) weights and solve every block three ways — z0 = zeros, z0 = x,
z0 = cached epoch-k root — with identical budgets (XLA f32 solver for a
clean policy comparison). Reports mean/max nstep and strict converged per
init policy.

Usage:
  python experiments/warm_start_probe.py CKPT_OLD CKPT_NEW [out.json] [--batch N]
"""
import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_flagship(batch):
    from __graft_entry__ import _build

    return _build([2, 2, 2], 512, 32, batch, n_exact_terms=10,
                  coeff=0.9, fc_end=False, n_lip_iters=None, sn_tol=1e-3)


def _walk(model, variables, x, on_block):
    """Thread x through the full chain; call on_block(bidx, block, bvars, x)
    at every ImplicitBlock (factor_out=False on the flagship recipe)."""
    from implicit_normalizing_flows_tpu.layers.implicit_block import ImplicitBlock

    bidx = 0
    for i, t in enumerate(model.transforms):
        tp = variables["params"]["transforms"][i]
        ts = variables["state"]["transforms"][i]
        for j, item in enumerate(t.chain):
            v = {"params": tp[j], "state": ts[j]}
            if isinstance(item, ImplicitBlock):
                on_block(bidx, item, v, x)
                bidx += 1
            x, _, _ = item.forward(v, x, None)
    return x


def _solve(block, v, x, z0):
    """One XLA-f32 Broyden solve of this block's forward equation from z0
    (flattened), with the production budgets/policy."""
    from implicit_normalizing_flows_tpu.ops.broyden import broyden

    vx = block._net_vars(v, "nnet_x")
    vz = block._net_vars(v, "nnet_z")
    B = x.shape[0]
    flat = lambda a: a.reshape(B, -1)
    unflat = lambda a: a.reshape(x.shape)
    with jax.default_matmul_precision("float32"):
        x_embed = flat(block.nnet_x.apply(vx, x)) + flat(x)
        g = lambda zf: x_embed - flat(block.nnet_z.apply(vz, unflat(zf))) - zf
        return broyden(g, z0, threshold=30, eps=1e-6, newton_init=True,
                       stall_patience=5, stall_rtol=0.05, stall_guard=3.0)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    ck_old_p, ck_new_p = args[0], args[1]
    out = args[2] if len(args) > 2 else None
    batch = 32
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])

    from implicit_normalizing_flows_tpu.training.checkpoints import load_checkpoint
    from implicit_normalizing_flows_tpu.training.loops import dequantize
    from implicit_normalizing_flows_tpu.data.images import _synthetic_structured

    ck_old = load_checkpoint(ck_old_p)
    ck_new = load_checkpoint(ck_new_p)
    model = _build_flagship(batch)
    v_old = {"params": ck_old["params"], "state": ck_old["state"]}
    v_new = {"params": ck_new["params"], "state": ck_new["state"]}

    # one fixed batch of the training distribution == "the same examples
    # recurring next epoch"
    x_u8 = jnp.asarray(_synthetic_structured("probe", batch, 3, 32, 32,
                                             seed=123).x)
    x = dequantize(x_u8, jax.random.PRNGKey(0))

    # Both passes run as ONE jitted program each — the eager walk dispatches
    # thousands of per-op RPCs through the axon tunnel (minutes); jitted it
    # is one compile + one execution.
    @jax.jit
    def pass1(params, state, x):
        cache = []
        v = {"params": params, "state": state}

        def record(bidx, block, bv, xb):
            res = _solve(block, bv, xb,
                         jnp.zeros((batch, int(np.prod(xb.shape[1:])))))
            cache.append(res.result)

        _walk(model, v, x, record)
        return cache

    @jax.jit
    def pass2(params, state, x, cache):
        rows = []
        v = {"params": params, "state": state}

        def compare(bidx, block, bv, xb):
            B = xb.shape[0]
            flat = lambda a: a.reshape(B, -1)
            inits = {"zeros": jnp.zeros_like(flat(xb)), "x": flat(xb),
                     "prev_root": cache[bidx]}
            row = {}
            for name, z0 in inits.items():
                res = _solve(block, bv, xb, z0)
                row[name] = (jnp.mean(res.nstep), jnp.max(res.nstep),
                             jnp.mean(res.converged))
                if name == "x":
                    d_prev = jnp.linalg.norm(cache[bidx] - res.result)
                    d_x = jnp.linalg.norm(flat(xb) - res.result)
                    row["drift"] = d_prev / jnp.maximum(d_x, 1e-12)
            rows.append(row)

        _walk(model, v, x, compare)
        return rows

    cache = pass1(ck_old["params"], ck_old["state"], x)
    raw = pass2(ck_new["params"], ck_new["state"], x, cache)

    rows = []
    for bidx, r in enumerate(raw):
        row = {"block": bidx}
        for name in ("zeros", "x", "prev_root"):
            mean_n, max_n, conv = r[name]
            row[name] = {"nstep_mean": round(float(mean_n), 2),
                         "nstep_max": int(max_n),
                         "converged": round(float(conv), 3)}
        row["root_drift_vs_x_dist"] = round(float(r["drift"]), 3)
        rows.append(row)
        print(json.dumps(row))

    agg = {}
    for name in ("zeros", "x", "prev_root"):
        agg[name] = {
            "nstep_mean": round(
                sum(r[name]["nstep_mean"] for r in rows) / len(rows), 2),
            "converged_min": min(r[name]["converged"] for r in rows),
        }
    summary = {"ckpt_old": ck_old_p, "ckpt_new": ck_new_p, "batch": batch,
               "per_block": rows, "aggregate": agg}
    text = json.dumps(summary, indent=1)
    print(text)
    if out:
        with open(out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
