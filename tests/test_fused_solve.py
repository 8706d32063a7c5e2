"""Fused Broyden-solve Pallas kernel vs the XLA while_loop solver.

Runs the kernel in interpreter mode on CPU and checks that the in-kernel
solve (both nets' conv evals + rank-1 state resident) reproduces the XLA
``root_solve`` path through ``ImplicitBlock``: same root, same re-attached
output, same gradients through the custom VJP (whose backward is shared).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_normalizing_flows_tpu.layers.implicit_block import ImplicitBlock
from implicit_normalizing_flows_tpu.models.implicit_flow import build_conv_net



def _make_block(preact=True, first_resblock=False, warm_start=False):
    def make_net():
        return build_conv_net(
            (3, 8, 8), 16, "3-1-3", 0.9, [2.0] * 3, [2.0] * 3, 3, "swish",
            preact=preact, dropout=0.0, sn_atol=None, sn_rtol=None,
            learn_p=False, first_resblock=first_resblock)

    return ImplicitBlock(make_net(), make_net(), n_dist="poisson",
                         n_exact_terms=2, neumann_grad=True,
                         grad_in_forward=False, warm_start=warm_start)


@pytest.mark.parametrize("preact", [True, False])
def test_fused_solve_matches_xla(monkeypatch, preact):
    monkeypatch.setenv("IMNF_SOLVER_PRECISION", "float32")
    block = _make_block(preact=preact, first_resblock=not preact)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)

    def run():
        z, _, state = block.forward(variables, x)
        return z, state["solver_diag"]

    monkeypatch.setenv("IMNF_FUSED_SOLVE", "0")
    z_xla, diag_xla = run()
    monkeypatch.setenv("IMNF_FUSED_SOLVE", "interpret")
    z_fused, diag_fused = run()

    np.testing.assert_allclose(np.asarray(z_fused), np.asarray(z_xla),
                               rtol=1e-4, atol=1e-5)
    # same per-example trajectories -> same iteration count & convergence
    np.testing.assert_allclose(np.asarray(diag_fused)[:2],
                               np.asarray(diag_xla)[:2], atol=1.0)
    assert float(diag_fused[1]) == 1.0  # all examples converged


def test_fused_solve_gradients_match(monkeypatch):
    monkeypatch.setenv("IMNF_SOLVER_PRECISION", "float32")
    monkeypatch.setenv("IMNF_BF16_EST", "0")
    monkeypatch.setenv("IMNF_BWD_PRECISION", "f32")
    monkeypatch.setenv("IMNF_FUSED_CHAIN", "0")
    block = _make_block()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)
    rng = jax.random.PRNGKey(2)

    def run():
        def loss(params, xx):
            v = {"params": params, "state": variables["state"]}
            z, dlogp, _ = block.forward(v, xx, jnp.zeros((2,)), rng=rng,
                                        train=True)
            return jnp.sum(z ** 2) + jnp.sum(dlogp)
        val, grads = jax.value_and_grad(loss, argnums=(0, 1))(
            variables["params"], x)
        return val, grads

    monkeypatch.setenv("IMNF_FUSED_SOLVE", "0")
    val_xla, g_xla = run()
    monkeypatch.setenv("IMNF_FUSED_SOLVE", "interpret")
    val_fused, g_fused = run()

    np.testing.assert_allclose(float(val_fused), float(val_xla), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_fused_solve_warm_start(monkeypatch):
    monkeypatch.setenv("IMNF_SOLVER_PRECISION", "float32")
    block = _make_block(warm_start=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)

    monkeypatch.setenv("IMNF_FUSED_SOLVE", "0")
    z_xla, _, _ = block.forward(variables, x)
    monkeypatch.setenv("IMNF_FUSED_SOLVE", "interpret")
    z_fused, _, _ = block.forward(variables, x)
    np.testing.assert_allclose(np.asarray(z_fused), np.asarray(z_xla),
                               rtol=1e-4, atol=1e-5)


def test_fused_backward_solve_matches_xla(monkeypatch):
    """Gradients with the fused implicit-gradient solve (interpret mode) vs
    the XLA broyden backward, f32 everywhere."""
    monkeypatch.setenv("IMNF_SOLVER_PRECISION", "float32")
    monkeypatch.setenv("IMNF_BF16_EST", "0")
    monkeypatch.setenv("IMNF_BWD_PRECISION", "f32")
    monkeypatch.setenv("IMNF_FUSED_CHAIN", "0")
    monkeypatch.setenv("IMNF_FUSED_SOLVE", "0")
    block = _make_block()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)
    rng = jax.random.PRNGKey(2)

    def run():
        def loss(params, xx):
            v = {"params": params, "state": variables["state"]}
            z, dlogp, _ = block.forward(v, xx, jnp.zeros((2,)), rng=rng,
                                        train=True)
            return jnp.sum(z ** 2) + jnp.sum(dlogp)
        return jax.value_and_grad(loss, argnums=(0, 1))(
            variables["params"], x)

    monkeypatch.setenv("IMNF_FUSED_BWD", "0")
    val_xla, g_xla = run()
    monkeypatch.setenv("IMNF_FUSED_BWD", "interpret")
    val_fused, g_fused = run()

    np.testing.assert_allclose(float(val_fused), float(val_xla), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_backward_secant_refs_identical_to_carried():
    """The backward implicit-gradient solve honors IMNF_SECANT_REFS since r5
    (review finding: the kwarg existed but production never passed it). The
    refs form must be bit-identical to the carried-tuple form at reps=1 (the
    configuration where the VMEM refs actually engage; the packed variant
    keeps the carried form)."""
    from implicit_normalizing_flows_tpu.ops.fused_solve import (
        fused_backward_solve,
    )

    block = _make_block()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)
    vz = {"params": variables["params"]["nnet_z"],
          "state": variables["state"]["nnet_z"]}
    cd = block.nnet_z.conv_chain_data(vz, x)
    grad = jax.random.normal(jax.random.PRNGKey(3), x.shape)

    kw = dict(threshold=8, eps=1e-10, stall_patience=5, stall_rtol=0.05,
              stall_guard=3.0, newton_init=True, mode="f32",
              interpret=True, reps=1)
    a = fused_backward_solve(grad, cd, secant_refs=False, **kw)
    b = fused_backward_solve(grad, cd, secant_refs=True, **kw)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


@pytest.mark.parametrize("preact", [True, False])
def test_fused_reattach_vjp_matches_xla(monkeypatch, preact):
    """The Pallas re-attachment VJP (interpret, f32) vs jax.vjp through the
    nets — parameter grads (incl. soft-normalization chain, biases, swish
    betas) and d_x must match."""
    monkeypatch.setenv("IMNF_SOLVER_PRECISION", "float32")
    monkeypatch.setenv("IMNF_BF16_EST", "0")
    monkeypatch.setenv("IMNF_BWD_PRECISION", "f32")
    monkeypatch.setenv("IMNF_FUSED_CHAIN", "0")
    monkeypatch.setenv("IMNF_FUSED_SOLVE", "0")
    monkeypatch.setenv("IMNF_FUSED_BWD", "0")
    monkeypatch.setenv("IMNF_REATTACH_PRECISION", "f32")
    block = _make_block(preact=preact, first_resblock=not preact)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)
    rng = jax.random.PRNGKey(2)

    def run():
        def loss(params, xx):
            v = {"params": params, "state": variables["state"]}
            z, dlogp, _ = block.forward(v, xx, jnp.zeros((2,)), rng=rng,
                                        train=True)
            return jnp.sum(z ** 2) + jnp.sum(dlogp)
        return jax.value_and_grad(loss, argnums=(0, 1))(
            variables["params"], x)

    monkeypatch.setenv("IMNF_FUSED_REATTACH", "0")
    val_xla, g_xla = run()
    monkeypatch.setenv("IMNF_FUSED_REATTACH", "interpret")
    val_fused, g_fused = run()

    np.testing.assert_allclose(float(val_fused), float(val_xla), rtol=1e-6)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(g_xla)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    for (path, b), (_, a) in zip(flat_x, flat_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("preact", [True, False])
def test_fused_final_matches_xla(monkeypatch, preact):
    """The fused estimator-final pair (Pallas primal + hand-derived
    second-order Pallas backward) vs the XLA jax.vjp final — estimator value
    and ALL gradients (params incl. normalization/bias/beta chains, and the
    x/z inputs)."""
    monkeypatch.setenv("IMNF_SOLVER_PRECISION", "float32")
    monkeypatch.setenv("IMNF_BF16_EST", "0")
    monkeypatch.setenv("IMNF_BWD_PRECISION", "f32")
    monkeypatch.setenv("IMNF_FUSED_SOLVE", "0")
    monkeypatch.setenv("IMNF_FUSED_BWD", "0")
    monkeypatch.setenv("IMNF_FUSED_REATTACH", "0")
    monkeypatch.setenv("IMNF_FUSED_CHAIN", "interpret")
    block = _make_block(preact=preact, first_resblock=not preact)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)
    rng = jax.random.PRNGKey(2)

    def run():
        def loss(params, xx):
            v = {"params": params, "state": variables["state"]}
            z, dlogp, _ = block.forward(v, xx, jnp.zeros((2,)), rng=rng,
                                        train=True)
            return jnp.sum(dlogp)
        return jax.value_and_grad(loss, argnums=(0, 1))(
            variables["params"], x)

    monkeypatch.setenv("IMNF_FUSED_FINAL", "0")
    val_xla, g_xla = run()
    monkeypatch.setenv("IMNF_FUSED_FINAL", "interpret")
    val_fused, g_fused = run()

    np.testing.assert_allclose(float(val_fused), float(val_xla), rtol=1e-5)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(g_xla)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    for (path, b), (_, a) in zip(flat_x, flat_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_fused_inverse_matches_xla_and_roundtrips(monkeypatch):
    monkeypatch.setenv("IMNF_SOLVER_PRECISION", "float32")
    block = _make_block()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)
    z, _, _ = block.forward(variables, x)

    monkeypatch.setenv("IMNF_FUSED_SOLVE", "0")
    x_xla, _ = block.inverse(variables, z)
    monkeypatch.setenv("IMNF_FUSED_SOLVE", "interpret")
    x_fused, _ = block.inverse(variables, z)

    np.testing.assert_allclose(np.asarray(x_fused), np.asarray(x_xla),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(x_fused), np.asarray(x),
                               rtol=1e-3, atol=1e-3)


def test_merged_block_forward_matches_xla(monkeypatch):
    """The merged solve+estimator kernel (IMNF_FUSED_BLOCK=interpret) vs the
    all-XLA path, f32 everywhere. The only semantic difference is the
    estimator's net_z linearization point (z_hat vs the re-attached z, apart
    by the solver tolerance), so value and gradients must agree tightly."""
    monkeypatch.setenv("IMNF_SOLVER_PRECISION", "float32")
    monkeypatch.setenv("IMNF_BF16_EST", "0")
    monkeypatch.setenv("IMNF_BWD_PRECISION", "f32")
    monkeypatch.setenv("IMNF_FUSED_CHAIN", "0")
    monkeypatch.setenv("IMNF_FUSED_SOLVE", "0")
    monkeypatch.setenv("IMNF_FUSED_BWD", "0")
    block = _make_block()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)
    rng = jax.random.PRNGKey(2)

    def run():
        def loss(params, xx):
            v = {"params": params, "state": variables["state"]}
            z, dlogp, _ = block.forward(v, xx, jnp.zeros((2,)), rng=rng,
                                        train=True)
            return jnp.sum(z ** 2) + jnp.sum(dlogp)
        return jax.value_and_grad(loss, argnums=(0, 1))(
            variables["params"], x)

    monkeypatch.setenv("IMNF_FUSED_BLOCK", "0")
    val_xla, g_xla = run()
    monkeypatch.setenv("IMNF_FUSED_BLOCK", "interpret")
    val_fused, g_fused = run()

    np.testing.assert_allclose(float(val_fused), float(val_xla),
                               rtol=1e-3, atol=1e-4)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-4)


def test_fused_solve_sharded_matches_single(monkeypatch):
    """The Pallas solve under a 4-way data mesh (shard_map partitioning via
    _maybe_shard) must equal the unsharded run. Uses interpret mode on the
    CPU mesh; the wrapper logic (specs, per-shard grid) is identical on TPU."""
    from jax.sharding import NamedSharding, PartitionSpec as P, set_mesh

    from implicit_normalizing_flows_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("IMNF_SOLVER_PRECISION", "float32")
    monkeypatch.setenv("IMNF_FUSED_SOLVE", "interpret")
    block = _make_block()
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)

    z_single, _, _ = block.forward(variables, x)

    mesh = make_mesh(n_data=4)
    xb = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    vr = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), variables)
    fwd = jax.jit(lambda v, xx: block.forward(v, xx)[0])
    with set_mesh(mesh):
        z_sharded = fwd(vr, xb)
    np.testing.assert_allclose(np.asarray(z_sharded), np.asarray(z_single),
                               rtol=1e-5, atol=1e-6)


def test_fused_solve_tf32_mode_close(monkeypatch):
    """tf32 (3-pass bf16 split) kernel mode stays within solver tolerance of
    the f32 root."""
    monkeypatch.setenv("IMNF_FUSED_SOLVE", "interpret")
    monkeypatch.setenv("IMNF_SOLVER_PRECISION", "float32")
    block = _make_block()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)
    z_f32, _, _ = block.forward(variables, x)
    monkeypatch.setenv("IMNF_SOLVER_PRECISION", "tensorfloat32")
    z_tf32, _, _ = block.forward(variables, x)
    np.testing.assert_allclose(np.asarray(z_tf32), np.asarray(z_f32),
                               rtol=5e-3, atol=5e-3)

@pytest.mark.parametrize("reps", [1, 2])
def test_precision_ladder_rescues_low_precision_phase1(monkeypatch, reps):
    """bf16 phase-1 alone sits far above the strict per-example tolerance
    (arithmetic noise floor); the f32 tail re-arms those examples and must
    reach strict convergence at the f32 root. Exercises both the scalar
    (reps=1) and lane-packed ladder paths."""
    from implicit_normalizing_flows_tpu.ops.fused_solve import (
        fused_broyden_solve,
    )

    block = _make_block()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)
    vx = {"params": variables["params"]["nnet_x"],
          "state": variables["state"]["nnet_x"]}
    vz = {"params": variables["params"]["nnet_z"],
          "state": variables["state"]["nnet_z"]}
    data_x = block.nnet_x.conv_forward_data(vx)
    data_z = block.nnet_z.conv_forward_data(vz)

    kw = dict(threshold=30, eps=1e-6, stall_patience=5, stall_rtol=0.05,
              stall_guard=3.0, newton_init=True, interpret=True, reps=reps)
    res_f32 = fused_broyden_solve(x, data_x, data_z, mode="f32", **kw)
    assert bool(jnp.all(res_f32.converged))

    res_bf16 = fused_broyden_solve(x, data_x, data_z, mode="bf16", **kw)
    assert not bool(jnp.all(res_bf16.converged))  # the floor the ladder fixes

    res_ladder = fused_broyden_solve(x, data_x, data_z, mode="bf16",
                                     tail_mode="f32", tail_start=10, **kw)
    assert bool(jnp.all(res_ladder.converged))
    assert bool(jnp.all(res_ladder.nstep <= 30))
    np.testing.assert_allclose(np.asarray(res_ladder.result),
                               np.asarray(res_f32.result),
                               rtol=1e-3, atol=2e-5)


@pytest.mark.parametrize("reps", [1, 2])
def test_multistage_ladder_converges(monkeypatch, reps):
    """Multi-stage ladder (r5): phase-1 bf16, then ('tf32x','f32') stages.
    Still-unconverged examples climb the stages under the shared budget and
    must reach strict convergence at the f32 root; a single-stage f32 tail
    is the semantics being preserved."""
    from implicit_normalizing_flows_tpu.ops.fused_solve import (
        fused_broyden_solve,
    )

    block = _make_block()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)
    vx = {"params": variables["params"]["nnet_x"],
          "state": variables["state"]["nnet_x"]}
    vz = {"params": variables["params"]["nnet_z"],
          "state": variables["state"]["nnet_z"]}
    data_x = block.nnet_x.conv_forward_data(vx)
    data_z = block.nnet_z.conv_forward_data(vz)

    kw = dict(threshold=30, eps=1e-6, stall_patience=5, stall_rtol=0.05,
              stall_guard=3.0, newton_init=True, interpret=True, reps=reps)
    ref = fused_broyden_solve(x, data_x, data_z, mode="f32", **kw)
    assert bool(jnp.all(ref.converged))

    multi = fused_broyden_solve(x, data_x, data_z, mode="bf16",
                                tail_mode=("tf32x", "f32"),
                                tail_start=(10, 20), **kw)
    assert bool(jnp.all(multi.converged))
    assert bool(jnp.all(multi.nstep <= 30))
    np.testing.assert_allclose(np.asarray(multi.result),
                               np.asarray(ref.result), rtol=1e-3, atol=2e-5)

    # comma-string spec resolves identically through the config layer
    from implicit_normalizing_flows_tpu.ops.fused_solve import _norm_ladder
    assert _norm_ladder(30, "tf32x,f32", None) == (("tf32x", "f32"), (15, 22))
    assert _norm_ladder(30, "f32", None) == (("f32",), (15,))
    assert _norm_ladder(30, None, None) == ((), ())


@pytest.mark.parametrize("ladder", [False, True, "default"])
def test_secant_refs_identical_to_carried(monkeypatch, ladder):
    """IMNF_SECANT_REFS (U/V factors in VMEM scratch refs, dynamic-trip
    contraction) is the same arithmetic as the carried-tuple form — the
    iterates must match exactly: same root, same nstep, same diff; with and
    without the precision ladder (the tail re-reads the refs under the
    lax.cond)."""
    from implicit_normalizing_flows_tpu.ops.fused_solve import (
        fused_broyden_solve,
    )

    block = _make_block()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)
    vx = {"params": variables["params"]["nnet_x"],
          "state": variables["state"]["nnet_x"]}
    vz = {"params": variables["params"]["nnet_z"],
          "state": variables["state"]["nnet_z"]}
    data_x = block.nnet_x.conv_forward_data(vx)
    data_z = block.nnet_z.conv_forward_data(vz)

    kw = dict(threshold=30, eps=1e-6, stall_patience=5, stall_rtol=0.05,
              stall_guard=3.0, newton_init=True, interpret=True, reps=1,
              mode="bf16")
    if ladder == "default":
        # the SHIPPED default combination: multi-stage tail x secant refs —
        # the nested make_run_tail(j+1) path re-reads/writes the VMEM U/V
        # refs across TWO re-arms (review r5); reps=2 exercises the
        # lane-packed variant of that composition too.
        kw.update(tail_mode=("tf32x", "f32"), tail_start=8, reps=2)
    elif ladder:
        kw.update(tail_mode="f32", tail_start=10)
    a = fused_broyden_solve(x, data_x, data_z, secant_refs=False, **kw)
    b = fused_broyden_solve(x, data_x, data_z, secant_refs=True, **kw)
    np.testing.assert_array_equal(np.asarray(b.result), np.asarray(a.result))
    np.testing.assert_array_equal(np.asarray(b.nstep), np.asarray(a.nstep))
    np.testing.assert_array_equal(np.asarray(b.diff), np.asarray(a.diff))
    np.testing.assert_array_equal(np.asarray(b.converged),
                                  np.asarray(a.converged))


def test_precision_ladder_noop_when_phase1_converges(monkeypatch):
    """When every example converges in phase 1, the ladder must not change
    the result (the tail sits under a lax.cond and never runs)."""
    from implicit_normalizing_flows_tpu.ops.fused_solve import (
        fused_broyden_solve,
    )

    block = _make_block()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)
    vx = {"params": variables["params"]["nnet_x"],
          "state": variables["state"]["nnet_x"]}
    vz = {"params": variables["params"]["nnet_z"],
          "state": variables["state"]["nnet_z"]}
    data_x = block.nnet_x.conv_forward_data(vx)
    data_z = block.nnet_z.conv_forward_data(vz)

    kw = dict(threshold=30, eps=1e-6, stall_patience=5, stall_rtol=0.05,
              stall_guard=3.0, newton_init=True, interpret=True, reps=1)
    base = fused_broyden_solve(x, data_x, data_z, mode="f32", **kw)
    assert bool(jnp.all(base.converged))
    ladder = fused_broyden_solve(x, data_x, data_z, mode="f32",
                                 tail_mode="f32", tail_start=15, **kw)
    np.testing.assert_array_equal(np.asarray(ladder.result),
                                  np.asarray(base.result))
    np.testing.assert_array_equal(np.asarray(ladder.nstep),
                                  np.asarray(base.nstep))


@pytest.mark.parametrize("reps", [1, 2])
def test_fused_line_search_matches_xla(monkeypatch, reps):
    """Armijo line search on the fused path (round 4 — previously the ls
    flag forced the XLA solver): same root and convergence as the XLA
    line-search solver on identical weights/inputs, for both the scalar
    and lane-packed kernels."""
    monkeypatch.setenv("IMNF_SOLVER_PRECISION", "float32")
    monkeypatch.setenv("IMNF_LINE_SEARCH", "1")
    block = _make_block()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(1), x)

    monkeypatch.setenv("IMNF_FUSED_SOLVE", "0")
    monkeypatch.setenv("IMNF_FUSED_BWD", "0")
    z_xla, _, diag_xla = block.forward(variables, x)

    monkeypatch.setenv("IMNF_FUSED_SOLVE", "interpret")
    monkeypatch.setenv("IMNF_FUSED_BWD", "interpret")
    monkeypatch.setenv("IMNF_FUSED_PACK_LANES", str(64 * reps))
    z_fused, _, diag_fused = block.forward(variables, x)

    np.testing.assert_allclose(np.asarray(z_fused), np.asarray(z_xla),
                               rtol=1e-4, atol=1e-5)
    d = np.asarray(diag_fused["solver_diag"]).reshape(-1)
    assert d[1] == 1.0  # converged fraction 1.0 under ls too


def test_fused_line_search_shortens_overshoot(monkeypatch):
    """On a residual engineered to overshoot (large first step), the
    line-search kernel must still converge within budget where semantics
    demand backtracking engages (accepted steps < 1 leave the converged
    flag set and the root equal to the no-ls solve's)."""
    from implicit_normalizing_flows_tpu.ops.fused_solve import (
        fused_broyden_solve,
    )

    block = _make_block()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 8, 8)) * 0.5
    variables = block.init(jax.random.PRNGKey(3), x)
    vx = {"params": variables["params"]["nnet_x"],
          "state": variables["state"]["nnet_x"]}
    vz = {"params": variables["params"]["nnet_z"],
          "state": variables["state"]["nnet_z"]}
    data_x = block.nnet_x.conv_forward_data(vx)
    data_z = block.nnet_z.conv_forward_data(vz)
    kw = dict(threshold=30, eps=1e-6, stall_patience=5, stall_rtol=0.05,
              stall_guard=3.0, newton_init=False, interpret=True, reps=1,
              mode="f32")
    plain = fused_broyden_solve(x, data_x, data_z, **kw)
    ls = fused_broyden_solve(x, data_x, data_z, line_search=True, **kw)
    assert bool(jnp.all(ls.converged))
    np.testing.assert_allclose(np.asarray(ls.result),
                               np.asarray(plain.result), rtol=1e-4,
                               atol=1e-5)


# CPU Pallas interpreter: minutes per file; excluded from the fast CI subset
pytestmark = [pytest.mark.slow, pytest.mark.kernels]
