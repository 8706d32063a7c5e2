"""Implicit ResNet classifiers (reference: ``train_classification.py:100-300``):
a ResNet18 skeleton whose basic blocks are implicit blocks used as plain
feature maps (no log-det), with strided 1x1 downsample convs + batch norm
between stages.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..layers import ImplicitBlock, LipschitzNet, ReLU, get_conv
from ..layers.protocol import fold_rng, make_vars
from .modules import PlainConv2d, PlainDense


class BatchNorm2d:
    """Standard batch norm (torch nn.BatchNorm2d semantics) as a Net module;
    running stats live in state and thread through apply(train=True)."""

    def __init__(self, num_features, eps=1e-5, momentum=0.1):
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum

    def init(self, rng, x=None):
        c = self.num_features
        return make_vars(
            params={"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            state={"running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))},
        )

    def apply(self, variables, x, *, rng=None, train=False):
        p, s = variables["params"], variables["state"]
        if train:
            mean = jnp.mean(x, axis=(0, 2, 3))
            var = jnp.var(x, axis=(0, 2, 3))
        else:
            mean, var = s["running_mean"], s["running_var"]
        xhat = (x - mean[None, :, None, None]) / jnp.sqrt(var[None, :, None, None] + self.eps)
        return xhat * p["weight"][None, :, None, None] + p["bias"][None, :, None, None]

    def train_apply(self, variables, x):
        """Train-mode BN: normalize by batch stats AND return the updated
        running stats (torch semantics — the r3 driver never updated them,
        so eval normalized with the INIT stats and test accuracy sat at
        chance while train accuracy climbed; r4 fix)."""
        p, s = variables["params"], variables["state"]
        mean = jnp.mean(x, axis=(0, 2, 3))
        var = jnp.var(x, axis=(0, 2, 3))
        xhat = (x - mean[None, :, None, None]) / jnp.sqrt(var[None, :, None, None] + self.eps)
        y = xhat * p["weight"][None, :, None, None] + p["bias"][None, :, None, None]
        m = self.momentum
        n = x.shape[0] * x.shape[2] * x.shape[3]
        unbiased = var * n / max(n - 1, 1)  # torch tracks unbiased var
        new_state = {
            "running_mean": (1 - m) * s["running_mean"] + m * mean,
            "running_var": (1 - m) * s["running_var"] + m * unbiased,
        }
        return y, new_state

    def update_lipschitz(self, variables, n_iterations=None):
        return variables

    def lipschitz_sigmas(self, variables):
        return []


class BasicImplicitBlock:
    """train_classification.py:135-189: implicit block (two 2-conv relu nets,
    (2,2) norms, no bias) + optional strided downsample conv/BN/relu."""

    def __init__(self, in_planes, hidden, planes, input_hw, stride=1,
                 coeff=0.9, n_lipschitz_iters=None, sn_atol=1e-3, sn_rtol=1e-3,
                 implicit=True):
        def build_net():
            items = [
                get_conv(in_planes, hidden, 3, 1, 1, input_hw=input_hw,
                         bias=False, coeff=coeff, n_iterations=n_lipschitz_iters,
                         domain=2, codomain=2, atol=sn_atol, rtol=sn_rtol),
                ReLU(),
                get_conv(hidden, in_planes, 3, 1, 1, input_hw=input_hw,
                         bias=False, coeff=coeff, n_iterations=n_lipschitz_iters,
                         domain=2, codomain=2, atol=sn_atol, rtol=sn_rtol),
                ReLU(),
            ]
            return LipschitzNet(items)

        self.implicit = implicit
        if implicit:
            self.block = ImplicitBlock(build_net(), build_net())
        else:
            # BasicBlock (explicit residual), train_classification.py:100-133
            self.block1 = build_net()
            self.block2 = build_net()
        self.has_downsample = stride != 1 or in_planes != planes
        if self.has_downsample:
            self.down_conv = PlainConv2d(in_planes, planes, 1, stride, 0, bias=False)
            self.down_bn = BatchNorm2d(planes)

    def init(self, rng, x):
        ks = jax.random.split(rng, 4)
        if self.implicit:
            bv = self.block.init(ks[0], x)
            params = {"block": bv["params"]}
            state = {"block": bv["state"]}
            y, _, _ = self.block.forward(bv, x, None)
        else:
            b1 = self.block1.init(ks[0], x)
            b2 = self.block2.init(ks[1], x)
            params = {"block1": b1["params"], "block2": b2["params"]}
            state = {"block1": b1["state"], "block2": b2["state"]}
            y = x + self.block1.apply(b1, x)
            y = y + self.block2.apply(b2, y)
        if self.has_downsample:
            cv = self.down_conv.init(ks[2], y)
            y2 = self.down_conv.apply(cv, y)
            bn = self.down_bn.init(ks[3], y2)
            params.update(down_conv=cv["params"], down_bn=bn["params"])
            state.update(down_conv=cv["state"], down_bn=bn["state"])
        return make_vars(params, state)

    def apply(self, variables, x, *, rng=None, train=False):
        p, s = variables["params"], variables["state"]
        if self.implicit:
            bv = {"params": p["block"], "state": s["block"]}
            y, _, _ = self.block.forward(bv, x, None, rng=rng, train=train)
        else:
            b1 = {"params": p["block1"], "state": s["block1"]}
            b2 = {"params": p["block2"], "state": s["block2"]}
            y = jax.nn.relu(x + self.block1.apply(b1, x, rng=rng, train=train))
            y = y + self.block2.apply(b2, y, rng=rng, train=train)
        if self.has_downsample:
            cv = {"params": p["down_conv"], "state": s["down_conv"]}
            bn = {"params": p["down_bn"], "state": s["down_bn"]}
            y = self.down_conv.apply(cv, y)
            y = self.down_bn.apply(bn, y, train=train)
            y = jax.nn.relu(y)
        return y

    def train_apply(self, variables, x, *, rng=None):
        """Train-mode forward returning (y, new_state): identical math to
        ``apply(train=True)`` but threads the downsample BN's running-stat
        update (and the implicit block's solver-telemetry state) back out."""
        p, s = variables["params"], dict(variables["state"])
        if self.implicit:
            bv = {"params": p["block"], "state": s["block"]}
            y, _, bstate = self.block.forward(bv, x, None, rng=rng, train=True)
            s["block"] = bstate
        else:
            b1 = {"params": p["block1"], "state": s["block1"]}
            b2 = {"params": p["block2"], "state": s["block2"]}
            y = jax.nn.relu(x + self.block1.apply(b1, x, rng=rng, train=True))
            y = y + self.block2.apply(b2, y, rng=rng, train=True)
        if self.has_downsample:
            cv = {"params": p["down_conv"], "state": s["down_conv"]}
            bn = {"params": p["down_bn"], "state": s["down_bn"]}
            y = self.down_conv.apply(cv, y)
            y, s["down_bn"] = self.down_bn.train_apply(bn, y)
            y = jax.nn.relu(y)
        return y, s

    def update_lipschitz(self, variables, n_iterations=None):
        p, s = dict(variables["params"]), dict(variables["state"])
        if self.implicit:
            v = self.block.update_lipschitz({"params": p["block"], "state": s["block"]}, n_iterations)
            p["block"], s["block"] = v["params"], v["state"]
        else:
            for name, net in (("block1", self.block1), ("block2", self.block2)):
                v = net.update_lipschitz({"params": p[name], "state": s[name]}, n_iterations)
                p[name], s[name] = v["params"], v["state"]
        return make_vars(p, s)

    def lipschitz_sigmas(self, variables):
        p, s = variables["params"], variables["state"]
        if self.implicit:
            return self.block.lipschitz_sigmas({"params": p["block"], "state": s["block"]})
        out = []
        for name, net in (("block1", self.block1), ("block2", self.block2)):
            out += net.lipschitz_sigmas({"params": p[name], "state": s[name]})
        return out


class ImplicitResNet:
    """train_classification.py:252-289 with num_blocks per stage."""

    def __init__(self, num_blocks=(1, 1, 1, 1), num_classes=10, imagesize=32,
                 coeff=0.9, n_lipschitz_iters=None, sn_atol=1e-3, sn_rtol=1e-3,
                 implicit=True):
        self.conv1 = PlainConv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = BatchNorm2d(64)
        self.blocks = []
        in_planes = 64
        hw = imagesize
        stage_specs = [(64, 64, num_blocks[0], 1), (128, 128, num_blocks[1], 2),
                       (256, 256, num_blocks[2], 2), (512, 512, num_blocks[3], 2)]
        for hidden, planes, n, stride in stage_specs:
            strides = [stride] + [1] * (n - 1)
            for st in strides:
                self.blocks.append(BasicImplicitBlock(
                    in_planes, hidden, planes, (hw, hw), stride=st, coeff=coeff,
                    n_lipschitz_iters=n_lipschitz_iters, sn_atol=sn_atol,
                    sn_rtol=sn_rtol, implicit=implicit))
                in_planes = planes
                hw = hw // st
        self.final_hw = hw
        self.linear = PlainDense(512, num_classes)

    def init(self, rng, x):
        ks = jax.random.split(rng, 3 + len(self.blocks))
        cv = self.conv1.init(ks[0], x)
        h = self.conv1.apply(cv, x)
        bn = self.bn1.init(ks[1], h)
        h = jax.nn.relu(self.bn1.apply(bn, h))
        params = {"conv1": cv["params"], "bn1": bn["params"], "blocks": []}
        state = {"conv1": cv["state"], "bn1": bn["state"], "blocks": []}
        for i, blk in enumerate(self.blocks):
            bv = blk.init(ks[2 + i], h)
            params["blocks"].append(bv["params"])
            state["blocks"].append(bv["state"])
            h = blk.apply(bv, h)
        h = jnp.mean(h.reshape(h.shape[0], h.shape[1], -1), axis=2)
        lv = self.linear.init(ks[-1], h)
        params["logit"] = lv["params"]
        state["logit"] = lv["state"]
        return make_vars(params, state)

    def apply(self, variables, x, *, rng=None, train=False):
        p, s = variables["params"], variables["state"]
        h = self.conv1.apply({"params": p["conv1"], "state": s["conv1"]}, x)
        h = jax.nn.relu(self.bn1.apply({"params": p["bn1"], "state": s["bn1"]}, h, train=train))
        for i, blk in enumerate(self.blocks):
            h = blk.apply({"params": p["blocks"][i], "state": s["blocks"][i]}, h,
                          rng=fold_rng(rng, i), train=train)
        # avg_pool2d(4) on the 4x4 final map == global mean for 32x32 inputs
        h = jnp.mean(h.reshape(h.shape[0], h.shape[1], -1), axis=2)
        return self.linear.apply({"params": p["logit"], "state": s["logit"]}, h)

    def train_apply(self, variables, x, *, rng=None):
        """Train forward returning (logits, new_state): BN running stats and
        block solver telemetry thread back to the caller — the train step
        must carry this state or eval normalizes with init statistics."""
        p, s = variables["params"], dict(variables["state"])
        h = self.conv1.apply({"params": p["conv1"], "state": s["conv1"]}, x)
        h, s["bn1"] = self.bn1.train_apply(
            {"params": p["bn1"], "state": s["bn1"]}, h)
        h = jax.nn.relu(h)
        bs = list(s["blocks"])
        for i, blk in enumerate(self.blocks):
            h, bs[i] = blk.train_apply(
                {"params": p["blocks"][i], "state": bs[i]}, h,
                rng=fold_rng(rng, i))
        s["blocks"] = bs
        h = jnp.mean(h.reshape(h.shape[0], h.shape[1], -1), axis=2)
        logits = self.linear.apply({"params": p["logit"], "state": s["logit"]}, h)
        return logits, s

    def update_lipschitz(self, variables, n_iterations=None):
        p, s = dict(variables["params"]), dict(variables["state"])
        bp, bs = list(p["blocks"]), list(s["blocks"])
        for i, blk in enumerate(self.blocks):
            v = blk.update_lipschitz({"params": bp[i], "state": bs[i]}, n_iterations)
            bp[i], bs[i] = v["params"], v["state"]
        p["blocks"], s["blocks"] = bp, bs
        return make_vars(p, s)

    def lipschitz_sigmas(self, variables):
        out = []
        for i, blk in enumerate(self.blocks):
            out += blk.lipschitz_sigmas(
                {"params": variables["params"]["blocks"][i],
                 "state": variables["state"]["blocks"][i]})
        return out


def ImplicitResNet18(num_classes=10, **kw):
    return ImplicitResNet((1, 1, 1, 1), num_classes=num_classes, implicit=True, **kw)


def ResNet18(num_classes=10, **kw):
    return ImplicitResNet((1, 1, 1, 1), num_classes=num_classes, implicit=False, **kw)
