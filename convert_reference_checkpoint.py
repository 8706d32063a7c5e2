"""Convert a reference PyTorch checkpoint (.pth) to this framework's format.

Closes the MIGRATION.md gap "checkpoints are not .pth-compatible;
retraining or a one-off conversion script is required" — this is that
script. It reads a checkpoint written by the reference's ``train_img.py``
(``torch.save({'state_dict': ..., 'args': ...})``, reference
train_img.py:845-856), rebuilds the equivalent model here from the saved
args (the CLI surfaces mirror each other by design), and fills our
``{params, state}`` pytrees by walking the two structures in lockstep:
``transforms.{i}.chain.{j}`` module paths on the reference side map
index-for-index onto ``variables[...]["transforms"][i][j]`` here (the same
alignment the weight-copied parity tests rely on,
tests/test_reference_parity.py::test_multiscale_assembly_parity).

Per-module mapping:

- InducedNormConv2d / InducedNormLinear (reference
  lib/layers/base/mixed_lipschitz.py): ``weight``/``bias`` copy verbatim
  (identical layouts); the power-iteration buffers ``u``/``v`` copy into
  our per-layer state and ``scale`` becomes our ``sigma``.
  ``spatial_dims``/``initialized`` are reference-internal lazy-shape
  bookkeeping with no analogue here (shapes are static) and are dropped.
- Swish ``beta`` copies verbatim.
- ActNorm1d/2d: ``weight``/``bias``/``initialized`` copy verbatim (same
  ``(x + b) * exp(w)`` parameterisation, reference act_norm.py:39-42).
- imBlock scalars: ``lamb`` (and ``geom_p`` under ``--learn-p``) copy into
  params; the ``last_*`` estimator buffers copy into state.
- ``nnet_x_copy``/``nnet_z_copy`` are the reference's frozen-module
  gradient surgery and have no counterpart here (a ``custom_vjp`` replaces
  them); they are skipped.

Every other state_dict key must be consumed — leftovers are an error, so
nothing is ever silently dropped. Optimizer state is NOT converted (Adam
moments are cheap to rebuild; the reference resumes re-init them for
changed configs too).

Supported: the image-density ``ImplicitFlow`` family (multiscale,
factor-out, actnorm, fc_end, squeeze_first). Classification heads and the
toy/tabular FC families raise with a pointer rather than converting
partially.

Usage:
  python convert_reference_checkpoint.py REF.pth OUT.pkl [--batchsize 64]

The output loads with ``training.checkpoints.load_checkpoint`` and resumes
via ``train_img.py --resume OUT.pkl``.
"""
import argparse
import os
import sys

import numpy as np


def _load_pth(path):
    import torch

    # the saved args is an argparse.Namespace -> needs full unpickling
    return torch.load(path, map_location="cpu", weights_only=False)


def _our_train_img():
    """Import OUR train_img.py by explicit path: callers often have the
    reference repo on sys.path (it ships a same-named train_img.py that
    would shadow ours)."""
    import importlib.util

    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "_imnf_train_img", os.path.join(here, "train_img.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _merged_args(ref_args, batchsize):
    """Reference args overlaid on OUR driver defaults (the flag surfaces
    mirror each other; ours has a few extra knobs the reference lacks)."""
    args = _our_train_img().parse_args([])
    for k, v in vars(ref_args).items():
        if hasattr(args, k):
            setattr(args, k, v)
    if batchsize is not None:
        args.batchsize = batchsize
    return args


def _to_np(t):
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


class _Consumer:
    """state_dict wrapper that records consumption so leftovers can fail."""

    def __init__(self, sd):
        self.sd = dict(sd)
        self.used = set()

    def take(self, key):
        self.used.add(key)
        return _to_np(self.sd[key])

    def take_opt(self, key):
        if key in self.sd:
            return self.take(key)
        return None

    def skip_matching(self, pred):
        for k in self.sd:
            if pred(k):
                self.used.add(k)

    def leftovers(self):
        return sorted(set(self.sd) - self.used)


def _fill_net(sdc, prefix, p_layers, s_layers):
    """One Lipschitz net: reference ``nn.Sequential`` sub-indices align
    1:1 with our ``layers`` list (activations included)."""
    for k, layer in enumerate(p_layers):
        if not isinstance(layer, dict):
            continue
        if "weight" in layer:
            w = sdc.take(f"{prefix}.{k}.weight")
            if w.shape != tuple(np.shape(layer["weight"])):
                raise SystemExit(
                    f"{prefix}.{k}.weight shape {w.shape} != ours "
                    f"{np.shape(layer['weight'])} — model config mismatch")
            layer["weight"] = w
            layer["bias"] = sdc.take(f"{prefix}.{k}.bias")
            st = s_layers[k]
            for ours, theirs in (("u", "u"), ("v", "v"), ("sigma", "scale")):
                val = sdc.take(f"{prefix}.{k}.{theirs}")
                want = np.shape(st[ours])
                if val.shape != tuple(want):
                    raise SystemExit(
                        f"{prefix}.{k}.{theirs} shape {val.shape} != ours "
                        f"{want}: the checkpoint's power-iteration buffers "
                        "are unmaterialised (model never ran a forward?)")
                st[ours] = val.reshape(want)
        elif "beta" in layer:
            layer["beta"] = sdc.take(f"{prefix}.{k}.beta")


def _fill_block(sdc, prefix, pp, ss):
    for name in ("nnet_x", "nnet_z"):
        _fill_net(sdc, f"{prefix}.{name}", pp[name]["layers"], ss[name])
    for scalar in ("lamb", "geom_p"):
        v = sdc.take_opt(f"{prefix}.{scalar}")
        if v is not None and scalar in pp:
            pp[scalar] = v.reshape(np.shape(pp[scalar]))
    for buf in ("last_n_samples", "last_firmom", "last_secmom"):
        v = sdc.take_opt(f"{prefix}.{buf}")
        if v is not None and buf in ss:
            n = min(v.size, np.asarray(ss[buf]).size)
            out = np.array(ss[buf], dtype=np.float32)
            out[:n] = v.ravel()[:n]
            ss[buf] = out


def _fill_actnorm(sdc, prefix, pp, ss):
    pp["weight"] = sdc.take(f"{prefix}.weight")
    pp["bias"] = sdc.take(f"{prefix}.bias")
    init = sdc.take_opt(f"{prefix}.initialized")
    if init is not None:
        ss["initialized"] = np.asarray(init, np.int32).reshape(
            np.shape(ss["initialized"]))


def convert(ckpt_path, out_path, batchsize=None):
    import jax
    import jax.numpy as jnp

    ti = _our_train_img()
    build_model, dataset_config = ti.build_model, ti.dataset_config

    ck = _load_pth(ckpt_path)
    sd = ck["state_dict"]
    args = _merged_args(ck["args"], batchsize)
    if getattr(args, "task", "density") != "density":
        raise SystemExit("only --task density checkpoints are supported "
                         "(classification heads are not mapped yet)")
    if getattr(args, "arch", "implicit") != "implicit":
        raise SystemExit("only the ImplicitFlow (arch=implicit) family is "
                         "supported; resflow .pth conversion is not mapped")

    im_dim, n_classes, init_layer, _ = dataset_config(args)
    model, input_size = build_model(args, im_dim, n_classes, init_layer,
                                    args.batchsize)
    x0 = jnp.zeros(input_size, jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    params = jax.tree.map(np.asarray, variables["params"])
    state = jax.tree.map(np.asarray, variables["state"])

    sdc = _Consumer(sd)
    sdc.skip_matching(lambda k: ".nnet_x_copy." in k or ".nnet_z_copy." in k)
    sdc.skip_matching(lambda k: k.endswith(".spatial_dims"))
    # per-InducedNorm lazy-init flags (ours are static); ActNorm's own
    # `initialized` is NOT skipped — _fill_actnorm consumes it.
    sdc.skip_matching(
        lambda k: k.endswith(".initialized") and f"{k[:-12]}.u" in sd)

    n_stacks = len(params["transforms"])
    for i in range(n_stacks):
        pl, slst = params["transforms"][i], state["transforms"][i]
        for j in range(len(pl)):
            prefix = f"transforms.{i}.chain.{j}"
            pp, ss = pl[j], slst[j]
            if isinstance(pp, dict) and "nnet_x" in pp:
                _fill_block(sdc, prefix, pp, ss)
            elif isinstance(pp, dict) and "weight" in pp and isinstance(
                    ss, dict) and "initialized" in ss:
                _fill_actnorm(sdc, prefix, pp, ss)
            elif any(k.startswith(prefix + ".") for k in sdc.sd):
                raise SystemExit(
                    f"unmapped reference module at {prefix} (our slot: "
                    f"{sorted(pp) if isinstance(pp, dict) else type(pp)})")

    left = sdc.leftovers()
    if left:
        raise SystemExit(
            f"{len(left)} reference keys were NOT converted (refusing to "
            f"drop them silently): {left[:10]}{'...' if len(left) > 10 else ''}")

    import pickle

    with open(out_path, "wb") as f:
        # the layout train_img.py --resume reads (params/state/epoch; ema
        # and opt_state intentionally absent -> resume re-inits them)
        pickle.dump({"params": params, "state": state,
                     "epoch": int(ck.get("epoch", -1) if ck.get("epoch")
                                  is not None else -1),
                     "converted_from": os.path.abspath(ckpt_path)}, f)
    print(f"wrote {out_path} ({len(sdc.used)} reference keys mapped, "
          f"epoch {ck.get('epoch')})")
    return params, state, model, args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="reference .pth checkpoint")
    ap.add_argument("out", help="output .pkl checkpoint")
    ap.add_argument("--batchsize", type=int, default=None,
                    help="input batch size to build the model with "
                    "(any value; shapes are per-example)")
    a = ap.parse_args()
    convert(a.ckpt, a.out, a.batchsize)


if __name__ == "__main__":
    main()
